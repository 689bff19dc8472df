"""Compaction + surgical-delete maintenance utilities."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scio_db_spark.sinks.maintenance import (
    compact_partitioned,
    _parquet_files,
    compact,
    delete_keys,
)


def _write_small_files(spark, path, n_files=12, rows_per=50):
    for i in range(n_files):
        spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).coalesce(1).write.mode("append").parquet(path)


def test_compact_merges_small_files_losslessly(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_small_files(spark, path)
    before_files = len(_parquet_files(path))
    assert before_files >= 12
    before = {r.id for r in spark.read.parquet(path).collect()}

    stats = compact(spark, path, target_bytes=10**9)  # everything → 1
    assert not stats["skipped"]
    assert stats["files_before"] == before_files
    assert stats["files_after"] == 1
    after = {r.id for r in spark.read.parquet(path).collect()}
    assert after == before


def test_compact_skips_single_file(spark, tmp_path):
    path = str(tmp_path / "one")
    spark.range(10).coalesce(1).write.parquet(path)
    stats = compact(spark, path)
    assert stats["skipped"]


def test_delete_keys_rewrites_only_affected_files(spark, tmp_path):
    path = str(tmp_path / "d")
    _write_small_files(spark, path, n_files=6, rows_per=100)
    files_before = set(_parquet_files(path))
    # ids 10 and 20 live only in the first file (rows 0-99)
    doomed = spark.createDataFrame([(10,), (20,)], "id long")
    all_before = {r.id for r in spark.read.parquet(path).collect()}

    stats = delete_keys(spark, path, "id", doomed)
    assert stats["rows_deleted"] == 2
    assert stats["files_rewritten"] == 1  # only the file containing 10/20

    after = {r.id for r in spark.read.parquet(path).collect()}
    assert after == all_before - {10, 20}
    # untouched files are literally the same paths
    files_after = set(_parquet_files(path))
    assert len(files_before & files_after) == len(files_before) - 1


def test_delete_keys_noop_when_no_match(spark, tmp_path):
    path = str(tmp_path / "n")
    _write_small_files(spark, path, n_files=3, rows_per=10)
    doomed = spark.createDataFrame([(10**9,)], "id long")
    before = set(_parquet_files(path))
    stats = delete_keys(spark, path, "id", doomed)
    assert stats["files_rewritten"] == 0
    assert stats["rows_deleted"] == 0
    assert set(_parquet_files(path)) == before


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    path = str(tmp_path / "p")
    # two partition dirs, several small files each
    for part in ("d=2024-01-01", "d=2024-01-02"):
        for i in range(4):
            spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
                "append"
            ).parquet(f"{path}/{part}")
    before = {r.id for r in spark.read.parquet(path).collect()}
    stats = compact_partitioned(spark, path, target_bytes=10**9)
    assert set(stats) == {"d=2024-01-01", "d=2024-01-02"}
    for leaf_stats in stats.values():
        assert leaf_stats["files_after"] == 1
    # layout intact: partition dirs still exist, data lossless
    after_df = spark.read.option("basePath", path).parquet(
        f"{path}/d=2024-01-01", f"{path}/d=2024-01-02"
    )
    assert {r.id for r in after_df.collect()} == before


def test_delete_keys_handles_paths_with_spaces(spark, tmp_path):
    path = str(tmp_path / "my table")  # URI-encodes to my%20table
    _write_small_files(spark, path, n_files=3, rows_per=10)
    doomed = spark.createDataFrame([(5,)], "id long")
    stats = delete_keys(spark, path, "id", doomed)
    assert stats["files_rewritten"] == 1
    assert stats["rows_deleted"] == 1
    assert stats["files_scanned"] == 3  # pre-rewrite count
    remaining = {r.id for r in spark.read.parquet(path).collect()}
    assert 5 not in remaining and len(remaining) == 29
    # no bogus percent-encoded sibling directory appeared
    import os as _os
    siblings = set(_os.listdir(str(tmp_path)))
    assert not any("%20" in s for s in siblings)


def test_compact_crash_window_never_loses_data(spark, tmp_path, monkeypatch):
    """A crash between moving new files in and removing old ones must
    leave a readable SUPERSET (transient duplicates), never an empty or
    partial table — the rename-in-first ordering (advisor round-4)."""
    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "c")
    _write_small_files(spark, path, n_files=4, rows_per=25)
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    real_remove = os.remove
    calls = {"n": 0}

    def exploding_remove(p):
        calls["n"] += 1
        if calls["n"] == 2:  # die mid-way through the delete loop
            raise OSError("simulated crash during old-file removal")
        real_remove(p)

    monkeypatch.setattr(m.os, "remove", exploding_remove)
    try:
        compact(spark, path, target_bytes=10**9)
    except OSError:
        pass
    monkeypatch.undo()

    # Every original row is still present (possibly duplicated across
    # the surviving old file + the compacted file).
    surviving = sorted(
        {r.id for r in spark.read.parquet(path).collect()}
    )
    assert surviving == before


def test_compact_swap_manifest_repairs_duplicates(spark, tmp_path, monkeypatch):
    """A crash in the removal loop leaves the swap manifest behind;
    the next compact() (or finish_compact_swap) must remove the doomed
    originals so readers see exact rows again — not a permanent
    duplicated superset (advisor round-5)."""
    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "c")
    _write_small_files(spark, path, n_files=4, rows_per=25)
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    real_remove = os.remove
    calls = {"n": 0}

    def exploding_remove(p):
        calls["n"] += 1
        if calls["n"] == 2:  # die mid-way through the delete loop
            raise OSError("simulated crash during old-file removal")
        real_remove(p)

    monkeypatch.setattr(m.os, "remove", exploding_remove)
    try:
        compact(spark, path, target_bytes=10**9)
    except OSError:
        pass
    monkeypatch.undo()

    # Half-swapped: manifest present, rows duplicated.
    assert os.path.exists(os.path.join(path, m._SWAP_MANIFEST))
    dup_rows = [r.id for r in spark.read.parquet(path).collect()]
    assert len(dup_rows) > len(before)  # the superset the repair fixes

    removed = m.finish_compact_swap(path)
    assert removed >= 1
    assert not os.path.exists(os.path.join(path, m._SWAP_MANIFEST))
    exact = sorted(r.id for r in spark.read.parquet(path).collect())
    assert exact == before  # exact rows, no duplicates


def test_compact_swap_rolls_back_when_incoming_incomplete(
    spark, tmp_path, monkeypatch
):
    """Crash BEFORE any rename (manifest written, tmp wiped by an
    operator): recovery must roll BACK (keep originals, drop partial
    incoming) — never remove originals while the incoming set is
    incomplete, which would lose rows."""
    import json
    import shutil as _sh

    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "rb")
    _write_small_files(spark, path, n_files=3, rows_per=20)
    before = sorted(r.id for r in spark.read.parquet(path).collect())
    originals = [os.path.basename(f) for f in m._parquet_files(path)]

    # Fabricate the crash state: manifest referencing incoming files
    # that never arrived, tmp sibling gone.
    with open(os.path.join(path, m._SWAP_MANIFEST), "w") as f:
        json.dump(
            {
                "doomed": originals,
                "incoming": ["part-never-arrived.snappy.parquet"],
                "tmp": "rb__compact_gone",
            },
            f,
        )
    assert not os.path.exists(str(tmp_path / "rb__compact_gone"))

    m.finish_compact_swap(path)
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before  # originals intact — rollback, not data loss
    assert not os.path.exists(os.path.join(path, m._SWAP_MANIFEST))
    _sh.rmtree(str(tmp_path / "rb"), ignore_errors=True)


def test_delete_keys_accepts_keys_derived_from_target(spark, tmp_path):
    """The doomed-key frame may be a lazy plan over the TARGET table
    itself (the dedup-reduce pattern); delete_keys must pin it before
    rewriting the files it reads from."""
    path = str(tmp_path / "self")
    _write_small_files(spark, path, n_files=4, rows_per=25)
    df = spark.read.parquet(path)
    doomed = df.filter(F.col("id") % 10 == 3).select("id")  # lazy, reads path
    stats = delete_keys(spark, path, "id", doomed)
    assert stats["rows_deleted"] == 10
    remaining = {r.id for r in spark.read.parquet(path).collect()}
    assert all(i % 10 != 3 for i in remaining) and len(remaining) == 90


def test_upsert_replaces_inserts_and_targets_files(spark, tmp_path):
    from scio_db_spark.sinks.maintenance import upsert_keys

    path = str(tmp_path / "up")
    _write_small_files(spark, path)  # ids 0..599 across 12 files
    files_before = len(_parquet_files(path))

    # update ids 10 and 20 (same file) with new k; insert 1000, 1001
    updates = spark.createDataFrame(
        [(10, 100), (20, 200), (1000, 7), (1001, 8)], "id long, k long"
    )
    stats = upsert_keys(spark, path, "id", updates)
    assert stats["rows_deleted"] == 2
    assert stats["rows_upserted"] == 4
    # only the one file containing ids 10 and 20 was rewritten
    assert stats["files_rewritten"] == 1
    assert stats["files_scanned"] == files_before

    got = {r.id: r.k for r in spark.read.parquet(path).collect()}
    assert len(got) == 602
    assert got[10] == 100 and got[20] == 200
    assert got[1000] == 7 and got[1001] == 8
    assert got[11] == 11 % 7  # untouched neighbor intact


def test_upsert_collapses_duplicate_keyed_rows(spark, tmp_path):
    from scio_db_spark.sinks.maintenance import upsert_keys

    path = str(tmp_path / "dups")
    spark.createDataFrame(
        [(1, 0), (1, 1), (2, 0)], "id long, k long"
    ).coalesce(1).write.mode("append").parquet(path)

    stats = upsert_keys(
        spark, path, "id",
        spark.createDataFrame([(1, 9)], "id long, k long"),
    )
    # MERGE semantics: BOTH old id=1 rows replaced by the single update
    assert stats["rows_deleted"] == 2
    rows = sorted(
        (r.id, r.k) for r in spark.read.parquet(path).collect()
    )
    assert rows == [(1, 9), (2, 0)]


def test_upsert_insert_only_touches_no_files(spark, tmp_path):
    from scio_db_spark.sinks.maintenance import upsert_keys

    path = str(tmp_path / "ins")
    _write_small_files(spark, path, n_files=3)
    stats = upsert_keys(
        spark, path, "id",
        spark.createDataFrame([(9000, 1)], "id long, k long"),
    )
    assert stats["files_rewritten"] == 0
    assert stats["rows_deleted"] == 0
    assert spark.read.parquet(path).filter("id = 9000").count() == 1


def test_upsert_crash_after_delete_rolls_forward(spark, tmp_path, monkeypatch):
    """Crash between delete_keys and the final rename: the staged file
    + manifest roll FORWARD to the exact MERGE result — the matched
    rows can never be lost (the old delete-then-append defect)."""
    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "crash1")
    _write_small_files(spark, path, n_files=3)

    real_rename = os.rename
    calls = {"n": 0}

    def dying_rename(src, dst):
        # the staged->final rename happens after delete_keys; kill it
        if ".upsert-staged-" in src:
            raise RuntimeError("simulated crash before final rename")
        return real_rename(src, dst)

    monkeypatch.setattr(m.os, "rename", dying_rename)
    updates = spark.createDataFrame(
        [(5, 99), (9000, 1)], "id long, k long"
    )
    try:
        m.upsert_keys(spark, path, "id", updates)
        assert False, "expected simulated crash"
    except RuntimeError:
        pass
    monkeypatch.setattr(m.os, "rename", real_rename)

    # crashed state: matched row already deleted, update rows invisible
    mid = spark.read.parquet(path)
    assert mid.filter("id = 5").count() == 0
    assert mid.filter("id = 9000").count() == 0
    assert os.path.exists(os.path.join(path, m._UPSERT_MANIFEST))

    # any subsequent maintenance call repairs it
    assert m.finish_upsert(spark, path) is True
    got = {r.id: r.k for r in spark.read.parquet(path).collect()}
    assert got[5] == 99 and got[9000] == 1
    assert len(got) == 151  # 150 originals - 1 replaced + 1 replaced + 1 new
    assert not os.path.exists(os.path.join(path, m._UPSERT_MANIFEST))


def test_upsert_crash_before_delete_rolls_forward(spark, tmp_path):
    """Crash right after the manifest commit (delete never ran):
    finish_upsert re-runs the delete from the staged file's own keys
    and completes the merge."""
    import uuid as _uuid

    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "crash2")
    _write_small_files(spark, path, n_files=3)

    # hand-build the crashed state: staged dot file + manifest, no delete
    token = _uuid.uuid4().hex
    tmp = str(tmp_path / "stage")
    spark.createDataFrame(
        [(7, 77)], "id long, k long"
    ).coalesce(1).write.parquet(tmp)
    staged = f".upsert-staged-{token}.parquet"
    os.rename(m._parquet_files(tmp)[0], os.path.join(path, staged))
    m._write_manifest_atomic(
        os.path.join(path, m._UPSERT_MANIFEST),
        {"staged": staged, "final": f"part-upsert-{token}.parquet",
         "key_col": "id"},
    )
    # staged dot file is invisible to readers
    assert spark.read.parquet(path).filter("k = 77").count() == 0

    # delete_keys' own preamble triggers the recovery
    stats = m.delete_keys(
        spark, path, "id",
        spark.createDataFrame([(9999,)], "id long"),
    )
    assert stats["rows_deleted"] == 0
    got = {r.id: r.k for r in spark.read.parquet(path).collect()}
    assert got[7] == 77
    assert len(got) == 150


def test_unparseable_manifest_raises_actionable_error(spark, tmp_path):
    import pytest

    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "bad")
    _write_small_files(spark, path, n_files=2)
    with open(os.path.join(path, m._UPSERT_MANIFEST), "w") as f:
        f.write('{"staged": "x.parquet", "fin')  # truncated JSON
    with pytest.raises(RuntimeError, match="unparseable"):
        m.finish_upsert(spark, path)


def test_sort_compact_clusters_row_groups_for_skipping(spark, tmp_path):
    """sort_by compaction must produce near-disjoint per-file key
    ranges (parquet min/max stats), so a key predicate can skip files
    and row groups; the data itself must be lossless."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "sorted")
    # write interleaved keys across many files: every file initially
    # spans the whole key range (no skipping possible)
    for i in range(8):
        spark.range(i, 800, 8).select(
            F.col("id"), (F.col("id") % 13).alias("x")
        ).coalesce(1).write.mode("append").parquet(path)

    def ranges():
        out = []
        for f in _parquet_files(path):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)  # id
                out.append((col.statistics.min, col.statistics.max))
        return sorted(out)

    before = ranges()
    # every pre-compact file overlaps every other (full-range spans)
    assert all(lo < 8 and hi >= 792 for lo, hi in before)

    before_rows = {r.id for r in spark.read.parquet(path).collect()}
    stats = compact(
        spark, path, target_bytes=8 * 1024, sort_by=["id"]
    )
    assert not stats.get("skipped")
    after = ranges()
    assert len(after) >= 2
    # clustered: consecutive ranges must not overlap
    for (lo1, hi1), (lo2, _hi2) in zip(after, after[1:]):
        assert hi1 <= lo2, f"overlapping ranges {(lo1,hi1)} {(lo2,_hi2)}"
    assert {r.id for r in spark.read.parquet(path).collect()} == before_rows


def test_upsert_batch_streaming_merge_semantics(spark, tmp_path):
    """Micro-batch MERGE: latest-per-key within a batch wins, later
    batches overwrite earlier keys, replaying a batch converges to
    the identical state."""
    from scio_db_spark.sinks.maintenance import upsert_batch

    path = str(tmp_path / "merged")
    b1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 11), (1, "a2", 12)],
        "id long, v string, seq long",
    )
    upsert_batch(spark, b1, path, "id", seq_col="seq")
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a2", 2: "b"}  # in-batch latest wins

    b2 = spark.createDataFrame(
        [(2, "b2", 20), (3, "c", 21)], "id long, v string, seq long"
    )
    upsert_batch(spark, b2, path, "id", seq_col="seq")
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a2", 2: "b2", 3: "c"}

    # replay of b2 (at-least-once foreachBatch): state must not change
    upsert_batch(spark, b2, path, "id", seq_col="seq")
    got2 = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got2 == got
    assert spark.read.parquet(path).count() == 3


def test_streaming_upsert_sink_end_to_end(spark, tmp_path):
    """Two micro-batches through the real foreachBatch sink: the keyed
    table holds the latest row per key when the stream drains."""
    from scio_db_spark.sinks.maintenance import streaming_upsert_sink

    src_dir = str(tmp_path / "in")
    path = str(tmp_path / "stream_merged")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, v string, seq long"
    # two input files = two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2)], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    spark.createDataFrame(
        [(2, "b2", 3), (3, "c", 4)], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = streaming_upsert_sink(
        stream, path, "id", ckpt, seq_col="seq",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}


def test_delete_crash_between_rename_and_remove_repairs(
    spark, tmp_path, monkeypatch
):
    """Crash AFTER the replacement is renamed in but BEFORE the doomed
    original is removed: both files are visible. The per-file delete
    manifest records the pair, so the next maintenance call removes
    the stale original instead of re-rewriting it — which would
    permanently duplicate its unmatched rows."""
    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "delcrash")
    _write_small_files(spark, path, n_files=3)
    keys = spark.createDataFrame([(5,), (55,)], "id long")

    real_remove = os.remove

    def dying_remove(p):
        base = os.path.basename(p)
        if base.endswith(".parquet") and not base.startswith("."):
            raise RuntimeError("simulated crash before original removal")
        return real_remove(p)

    monkeypatch.setattr(m.os, "remove", dying_remove)
    try:
        m.delete_keys(spark, path, "id", keys)
        assert False, "expected simulated crash"
    except RuntimeError:
        pass
    monkeypatch.setattr(m.os, "remove", real_remove)

    # crashed state: replacement + original both visible, manifest down
    assert os.path.exists(os.path.join(path, m._DELETE_MANIFEST))
    dup = spark.read.parquet(path)
    assert dup.count() > 150  # unmatched rows duplicated right now

    # a re-run (what finish_upsert recovery does) must NOT duplicate:
    # finish_delete_swap removes the stale original first
    m.delete_keys(spark, path, "id", keys)
    got = [r.id for r in spark.read.parquet(path).collect()]
    assert len(got) == len(set(got)) == 148
    assert 5 not in got and 55 not in got
    assert not os.path.exists(os.path.join(path, m._DELETE_MANIFEST))


def test_upsert_batch_bootstrap_recovers_pending_merge(spark, tmp_path):
    """A crashed upsert that emptied the VISIBLE file set must not be
    wiped by upsert_batch's bootstrap overwrite: recovery runs before
    the emptiness check and resurfaces the staged rows."""
    import uuid as _uuid

    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "bootcrash")
    os.makedirs(path)
    token = _uuid.uuid4().hex
    stage_tmp = str(tmp_path / "stage_boot")
    spark.createDataFrame(
        [(7, 77)], "id long, k long"
    ).coalesce(1).write.parquet(stage_tmp)
    staged = f".upsert-staged-{token}.parquet"
    os.rename(m._parquet_files(stage_tmp)[0], os.path.join(path, staged))
    m._write_manifest_atomic(
        os.path.join(path, m._UPSERT_MANIFEST),
        {"staged": staged, "final": f"part-upsert-{token}.parquet",
         "key_col": "id"},
    )
    assert not m._parquet_files(path)  # visible set is empty

    batch = spark.createDataFrame([(8, 88)], "id long, k long")
    m.upsert_batch(spark, batch, path, "id")
    got = {r.id: r.k for r in spark.read.parquet(path).collect()}
    assert got == {7: 77, 8: 88}
    assert not os.path.exists(os.path.join(path, m._UPSERT_MANIFEST))


def test_orphan_staged_files_garbage_collected(spark, tmp_path):
    """A staged dot file with no manifest (crash between the staging
    rename and the manifest write) is an orphan no recovery path
    references — finish_upsert garbage-collects it."""
    import scio_db_spark.sinks.maintenance as m

    path = str(tmp_path / "orphan")
    _write_small_files(spark, path, n_files=2)
    orphan = os.path.join(path, ".upsert-staged-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"PAR1")
    assert m.finish_upsert(spark, path) is False
    assert not os.path.exists(orphan)
    assert spark.read.parquet(path).count() == 100
