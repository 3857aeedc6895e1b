"""Atomic store swap (streaming/store.py, ADVICE r4): single-rename
pointer swap, crash recovery, legacy-layout migration."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from gmall_spark.streaming import store

SCHEMA = T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.LongType())])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read(spark, path):
    return {(r.k, r.v) for r in store.read_or_empty(spark, path, SCHEMA).collect()}


def test_swap_is_pointer_and_reaps_old_versions(spark, tmp_path):
    p = str(tmp_path / "s")
    store.swap_write(_df(spark, [(1, 10)]), p)
    assert _read(spark, p) == {(1, 10)}
    assert os.path.islink(p)
    store.swap_write(_df(spark, [(2, 20)]), p)
    store.swap_write(_df(spark, [(3, 30)]), p)
    assert _read(spark, p) == {(3, 30)}
    # current + one grace version retained, older reaped
    versions = [e for e in os.listdir(tmp_path) if e.startswith("s.v")]
    assert sorted(versions) == ["s.v1", "s.v2"]


def test_missing_store_is_empty_not_error(spark, tmp_path):
    assert _read(spark, str(tmp_path / "never_written")) == set()


def test_dangling_link_recovers_to_newest_complete_version(spark, tmp_path):
    """The r4 crash shape: store pointer gone but complete version
    dirs on disk — the reader must recover the newest complete one,
    NOT treat the store as empty (the silent-reset bug)."""
    p = str(tmp_path / "s")
    store.swap_write(_df(spark, [(1, 10)]), p)
    store.swap_write(_df(spark, [(2, 20)]), p)
    os.remove(p)  # simulate the crash window: no pointer
    # plant an INCOMPLETE newer version (no _SUCCESS): must be skipped
    os.makedirs(str(tmp_path / "s.v9"))
    assert _read(spark, p) == {(2, 20)}
    assert os.path.islink(p)


def test_stale_tmp_link_is_cleaned(spark, tmp_path):
    p = str(tmp_path / "s")
    store.swap_write(_df(spark, [(1, 10)]), p)
    os.symlink("nowhere", p + ".lnk.tmp")
    store.swap_write(_df(spark, [(2, 20)]), p)
    assert _read(spark, p) == {(2, 20)}
    assert not os.path.lexists(p + ".lnk.tmp")


def test_legacy_real_dir_migrates(spark, tmp_path):
    """A store written by the pre-symlink layout (a real parquet dir)
    is migrated to a version dir and swapped atomically from then on."""
    p = str(tmp_path / "s")
    _df(spark, [(1, 10)]).write.mode("overwrite").parquet(p)
    assert not os.path.islink(p)
    assert _read(spark, p) == {(1, 10)}  # read migrates
    assert os.path.islink(p)
    store.swap_write(_df(spark, [(2, 20)]), p)
    assert _read(spark, p) == {(2, 20)}


def test_legacy_real_dir_migrates_even_when_v0_exists(spark, tmp_path):
    """ADVICE r5: a legacy real dir coexisting with an old .v0 used to
    dead-end recover() (return without migrating), and the next swap's
    os.replace onto the non-empty real dir raised ENOTEMPTY. Migration
    now claims the next FREE version number."""
    p = str(tmp_path / "s")
    _df(spark, [(0, 0)]).write.mode("overwrite").parquet(p + ".v0")
    _df(spark, [(1, 10)]).write.mode("overwrite").parquet(p)
    assert _read(spark, p) == {(1, 10)}  # migrated, newest content wins
    assert os.path.islink(p)
    assert os.path.isdir(p + ".v1")
    store.swap_write(_df(spark, [(2, 20)]), p)  # must not ENOTEMPTY
    assert _read(spark, p) == {(2, 20)}


def test_read_path_leaves_foreign_staging_links_alone(spark, tmp_path):
    """ADVICE r5 (medium): read_or_empty's recover() must NOT delete
    another writer's in-flight staging link — only swap_write reaps
    stale ones."""
    p = str(tmp_path / "s")
    store.swap_write(_df(spark, [(1, 10)]), p)
    foreign = p + ".lnk.tmp.99999"
    os.symlink(os.path.basename(p + ".v0"), foreign)
    assert _read(spark, p) == {(1, 10)}
    assert os.path.lexists(foreign), "read path deleted a writer's staging link"
    store.swap_write(_df(spark, [(2, 20)]), p)  # writer path reaps it
    assert not os.path.lexists(foreign)


def test_concurrent_version_claim_is_exclusive(spark, tmp_path):
    """Two writers computing the same next version number must not
    write into the same dir: the exclusive mkdir claim skips numbers
    already taken (simulated by pre-creating the contended dir)."""
    p = str(tmp_path / "s")
    store.swap_write(_df(spark, [(1, 10)]), p)
    os.makedirs(p + ".v1")  # the other writer just claimed v1
    store.swap_write(_df(spark, [(2, 20)]), p)
    assert _read(spark, p) == {(2, 20)}
    assert os.path.realpath(p).endswith("s.v2")
