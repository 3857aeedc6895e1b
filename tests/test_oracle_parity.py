"""Every registered query must match its DuckDB oracle at sf0.001
(the driver's t2 gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import os

import pytest

from gmall_spark import queries as q
from tests.oracle import compare


# r14 (VERDICT r13 item 2): the heaviest per-query parity instances
# (>=5 s each — the multi-fixture curation/governance chains and the
# PQ/IVFPQ trainers) carry the `slow` marker so the DEFAULT suite
# fits the round driver's pytest time cap. Coverage is not deleted:
# `-m "slow or sf001"` runs them, the builder runs the full suite
# each round, the sf0.01 sweep (tools/parity_sweep.py) checks every
# query either way, and the driver's own t2 gate re-checks its
# declared-query sample at sf0.01.
SLOW_PARITY = {
    "llm_curation_funnel",
    "llm_release_diff",
    "similarity_ivfpq_residual_topk",
    "similarity_ivfpq_topk",
    "llm_corpus_curation_v4",
    "similarity_pq_topk",
    "llm_corpus_curation_v5",
    "llm_pack_license_audit",
    "embedding_pagerank_centrality",
    "similarity_eval_ivf_nprobe_sweep",
    "dedup_groups_keeper_gated",
    "llm_drop_ledger",
    "embedding_knn_triangles",
    "llm_corpus_curation_v2",
    "dedup_groups_multi_signal",
}


def _names():
    return [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW_PARITY else n
        for n in sorted(q.ORACLES.keys())
    ]


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


def _driver_sampled() -> set[str]:
    """Queries that have ever received a driver CORRECTNESS row —
    derived from the committed CORRECTNESS_r*.json records."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(f) as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(d, dict):
            out |= set(d.keys())
    return out


# VERDICT r6 item 3: every registry query the DRIVER has never sampled
# gets an in-suite sf0.01 parity row (the driver samples ~50 of the
# registry per round; r4-r6 additions had only the self-run sweep).
# Derived dynamically so the set SHRINKS as driver coverage widens and
# GROWS automatically when a new query is registered — a new operator
# cannot ship without an in-suite row at the driver's SF.
NEVER_SAMPLED = sorted(
    (set(q.ORACLES) - set(SF001_SAMPLE)) - _driver_sampled()
)


@pytest.mark.sf001
@pytest.mark.parametrize("name", NEVER_SAMPLED)
def test_sf001_never_driver_sampled(spark, name):
    df = q.QUERIES[name](spark, SF001_DIR)
    problems = compare(df, q.ORACLES[name], SF001_DIR)
    assert not problems, f"{name}@sf0.01: " + "; ".join(problems)


@pytest.mark.sf001
@pytest.mark.parametrize(
    "name", sorted(set(q.QUERIES) - set(q.ORACLES))
)
def test_sf001_rows_only_queries_execute(spark, name):
    """The honest rows-only sketches (no SQL oracle) at the driver's
    SF: must execute and return rows — their ACCURACY is gated by the
    dedicated approx-vs-exact tests elsewhere in the suite."""
    assert q.QUERIES[name](spark, SF001_DIR).count() > 0, name


def test_all_queries_have_callables():
    for name in q.ORACLES:
        assert name in q.QUERIES


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
