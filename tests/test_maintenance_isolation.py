"""Concurrent-reader isolation for the maintenance protocol.

Round-8 closed the WRITER crash windows (manifests + roll-forward);
this suite pins the READER side: a reader scanning during
``compact`` / ``compact(zorder_by=...)`` / ``delete_keys`` /
``upsert_keys`` must observe one published version — never the
transient filesystem superset the rename-in-then-remove swap leaves,
and never a MERGE's deleted-but-not-yet-inserted middle.

Mechanism under test (sinks/maintenance.py): ops publish an atomic
``_snapshot.json`` file-set manifest at their commit points; readers
resolve it via ``read_snapshot`` and retry vanished-file races via
``with_snapshot``. The dangerous windows are STRETCHED here by
patching ``os.remove`` (and, for upsert, the inner delete phase) with
sleeps, so the reader loop provably lands inside them.

Residual gap, documented not tested: the manifest flip relies on
atomic rename (POSIX/HDFS); an S3-class store needs a conditional-PUT
pointer object — the reader protocol is unchanged.
"""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from scio_db_spark.sinks import maintenance as M


def _make_table(spark, tmp_path, n_rows=400, n_files=8) -> str:
    path = str(tmp_path / "tbl")
    (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(path)
    )
    M.publish_snapshot(path)
    return path


def _rows(df) -> tuple:
    return tuple(sorted((r.k, r.v) for r in df.collect()))


class _Reader(threading.Thread):
    """Hammer with_snapshot reads until stopped; record every result."""

    def __init__(self, spark, path):
        super().__init__(daemon=True)
        self.spark, self.path = spark, path
        self.stop = threading.Event()
        self.seen: list[tuple] = []
        self.error: Exception | None = None

    def run(self):
        try:
            while not self.stop.is_set():
                self.seen.append(
                    M.with_snapshot(self.spark, self.path, _rows)
                )
        except Exception as e:  # surfaced in the main thread
            self.error = e


def _slow_remove(monkeypatch, delay=0.08):
    """Stretch the publish->remove window so readers land inside it."""
    real = os.remove

    def slow(p):
        if p.endswith(".parquet"):
            time.sleep(delay)
        real(p)

    monkeypatch.setattr(os, "remove", slow)


def _run_concurrent(spark, path, op, monkeypatch) -> list[tuple]:
    pre = _rows(M.read_snapshot(spark, path))
    reader = _Reader(spark, path)
    reader.start()
    time.sleep(0.3)  # ensure reads start on the pre-state
    _slow_remove(monkeypatch)
    op()
    monkeypatch.undo()
    time.sleep(0.3)
    reader.stop.set()
    reader.join(timeout=60)
    assert reader.error is None, f"reader failed: {reader.error}"
    post = _rows(M.read_snapshot(spark, path))
    assert len(reader.seen) >= 3, "reader loop too slow to exercise race"
    return [pre, post, reader.seen]


def test_compact_reader_sees_pre_or_post_never_superset(
    spark, tmp_path, monkeypatch
):
    path = _make_table(spark, tmp_path)
    pre, post, seen = _run_concurrent(
        spark,
        path,
        lambda: M.compact(spark, path, target_bytes=1 << 30),
        monkeypatch,
    )
    assert pre == post  # compaction rewrites, never changes rows
    for s in seen:
        assert s == pre, (
            f"reader observed {len(s)} rows vs {len(pre)} — "
            f"a transient superset/subset leaked through the snapshot"
        )


def test_zorder_compact_reader_isolation(spark, tmp_path, monkeypatch):
    path = _make_table(spark, tmp_path)
    pre, post, seen = _run_concurrent(
        spark,
        path,
        lambda: M.compact(
            spark, path, target_bytes=1 << 30, zorder_by=["k", "v"]
        ),
        monkeypatch,
    )
    assert pre == post
    for s in seen:
        assert s == pre


def test_delete_keys_reader_sees_pre_or_post(
    spark, tmp_path, monkeypatch
):
    path = _make_table(spark, tmp_path)
    # confine doomed keys to ONE file so the per-file swap has exactly
    # two legal versions
    one_file = M._parquet_files(path)[0]
    doomed = [r.k for r in spark.read.parquet(one_file).collect()][:20]
    pre, post, seen = _run_concurrent(
        spark,
        path,
        lambda: M.delete_keys(
            spark,
            path,
            "k",
            spark.createDataFrame([(k,) for k in doomed], "k long"),
        ),
        monkeypatch,
    )
    assert set(k for k, _ in pre) - set(k for k, _ in post) == set(doomed)
    for s in seen:
        assert s in (pre, post), (
            f"reader observed {len(s)} rows; legal are "
            f"{len(pre)} (pre) or {len(post)} (post)"
        )


def test_upsert_merge_is_atomic_to_readers(spark, tmp_path, monkeypatch):
    path = _make_table(spark, tmp_path)
    updates = spark.createDataFrame(
        [(k, 100000 + k) for k in range(0, 40)], "k long, v long"
    )
    # stretch the MERGE middle (post-delete, pre-insert) — the state
    # snapshot readers must never return
    real_delete = M.delete_keys

    def slow_delete(*a, **kw):
        out = real_delete(*a, **kw)
        time.sleep(1.0)
        return out

    monkeypatch.setattr(M, "delete_keys", slow_delete)
    pre, post, seen = _run_concurrent(
        spark,
        path,
        lambda: M.upsert_keys(spark, path, "k", updates),
        monkeypatch,
    )
    post_d = dict(post)
    for k in range(0, 40):
        assert post_d[k] == 100000 + k
    for s in seen:
        assert s in (pre, post), (
            "reader observed a partial MERGE state "
            f"({len(s)} rows; legal {len(pre)}/{len(post)})"
        )


def test_listing_guard_rejects_partial_scan(spark, tmp_path):
    """The inputFiles-vs-manifest guard: a plan that silently covers
    only a subset of the snapshot's file set (Spark's InMemoryFileIndex
    tolerates files vanishing between the existence check and the leaf
    listing) must raise retryably, never return the partial frame."""
    path = _make_table(spark, tmp_path)
    state = M._read_manifest(os.path.join(path, M._SNAPSHOT))
    full = M.read_snapshot(spark, path)
    M._verify_snapshot_listing(full, path, state)  # complete: no raise
    partial = spark.read.parquet(
        *[os.path.join(path, f) for f in state["files"][1:]]
    )
    with pytest.raises(FileNotFoundError, match="does not exist"):
        M._verify_snapshot_listing(partial, path, state)


def test_read_snapshot_legacy_table_without_manifest(spark, tmp_path):
    path = str(tmp_path / "legacy")
    spark.range(10).write.parquet(path)
    assert M.read_snapshot(spark, path).count() == 10


def test_publish_snapshot_versions_monotonic(spark, tmp_path):
    path = _make_table(spark, tmp_path)
    v1 = M._read_manifest(os.path.join(path, M._SNAPSHOT))["version"]
    M.publish_snapshot(path)
    v2 = M._read_manifest(os.path.join(path, M._SNAPSHOT))["version"]
    assert v2 == v1 + 1


def test_with_snapshot_gives_up_loudly(spark, tmp_path):
    path = _make_table(spark, tmp_path)
    # poison the manifest to reference a vanished file forever
    M.publish_snapshot(path, [os.path.join(path, "gone.parquet")])
    with pytest.raises(RuntimeError, match="no stable version"):
        M.with_snapshot(
            spark, path, _rows, max_attempts=2, backoff_s=0.01
        )
