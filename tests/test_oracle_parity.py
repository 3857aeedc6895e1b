"""Every registered query must match its DuckDB oracle at sf0.001
(the driver's t2 gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import os

import pytest

from gmall_spark import queries as q
from tests.oracle import compare


def _names():
    return sorted(q.ORACLES.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    df = q.QUERIES[name](spark, sf_dir)
    problems = compare(df, q.ORACLES[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


# Deterministic sf0.01 subsample (VERDICT r5 item 8): the driver's t2
# gate runs at sf0.01, and r2 had queries that passed sf0.001 then
# failed there — this keeps a representative slice of the families the
# driver has never sampled (TPC-H twins, PQ/IVFPQ, RRF, Bloom/CMS,
# grouping-sets/window-frames, eval harnesses) green at the driver's
# SF inside the suite. The full registry runs via tools/parity_sweep.py.
SF001_SAMPLE = [
    "market_share_by_year",
    "product_type_profit",
    "prospective_customer_balance",
    "min_cost_supplier",
    "promotion_candidate_suppliers",
    "similarity_pq_topk",
    "similarity_ivfpq_residual_topk",
    "hybrid_rrf_fusion",
    "bloom_decontam_probe",
    "vocab_freq_cms",
    "events_grouping_sets",
    "events_moving_stats",
    "events_value_mad_outliers",
    "dedup_eval_simhash64_vs_jaccard",
    "similarity_eval_ivf_nprobe_sweep",
    # r6 additions: the composed curation pass exercises X106/X107/
    # X108 + v2 in one row; containment is the new blocking strategy
    "llm_corpus_curation_v3",
    "dedup_ngram_containment",
]

SF001_DIR = os.environ.get("SPARK_GRAFT_SF001_DIR", "/root/testdata/sf0.01")


@pytest.mark.sf001
@pytest.mark.parametrize("name", SF001_SAMPLE)
def test_sf001_parity_subsample(spark, name):
    df = q.QUERIES[name](spark, SF001_DIR)
    problems = compare(df, q.ORACLES[name], SF001_DIR)
    assert not problems, f"{name}@sf0.01: " + "; ".join(problems)


def test_sf001_sample_names_are_registered():
    for name in SF001_SAMPLE:
        assert name in q.ORACLES and name in q.QUERIES, name


def test_all_queries_have_callables():
    for name in q.ORACLES:
        assert name in q.QUERIES


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
