"""Table maintenance: small-file compaction and surgical key deletes.

Streaming windowed sinks (sinks/files.py) produce one file per
micro-batch per window — operationally correct, but at 100 TB the
accumulated small files tax every subsequent scan (driver file-listing
plus one task per tiny file). These utilities are the maintenance jobs
a production deployment schedules against that layout:

- ``compact``: bin-pack a directory's parquet files toward a target
  file size. Staged: the compacted output is written to a temp
  directory first and only swapped in after a row-count check, so a
  mid-job failure never destroys data (the same stage-then-commit
  contract the jar-less Avro sharded writer follows).
- ``delete_keys``: GDPR-style surgical delete — locate ONLY the files
  containing doomed keys via ``input_file_name()`` + a broadcast semi
  join, rewrite those files with an anti join, leave every other file
  untouched. Cost scales with |affected files|, not table size.

Both are plain-filesystem implementations (no transactional table
format in this environment): readers racing a swap can observe a
transient mix of old/new files. The docstrings call this out — on a
deployment with a transactional layer (Delta/Iceberg), these map to
OPTIMIZE and DELETE and the same planning logic applies.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TARGET_BYTES_DEFAULT = 128 * 1024 * 1024

# Swap-in-progress manifest: written BEFORE compacted files are
# renamed into the table, listing the original files doomed by the
# swap. A crash between the rename loop and the removal loop would
# otherwise leave every row permanently duplicated with nothing for a
# reader to detect; the manifest makes the half-swapped state both
# detectable and repairable (finish_compact_swap removes the listed
# leftovers idempotently).
_SWAP_MANIFEST = ".compact-inprogress"

# Upsert-in-progress manifest: written AFTER the update rows are staged
# (as a dot-prefixed file readers and _parquet_files both ignore) but
# BEFORE delete_keys removes any matched row. The staged file carries
# the update rows themselves — including the key column — so a crash
# anywhere between the manifest write and the final rename rolls
# FORWARD to the exact MERGE result: re-run the (idempotent) delete
# with keys re-read from the staged file, then make the file visible.
# Without it, a crash between delete and append lost every matched row
# undetectably.
_UPSERT_MANIFEST = ".upsert-inprogress"

# Per-file delete swap manifest: written BEFORE delete_keys renames a
# rewritten replacement file into the table, naming the doomed
# original and its replacement. Without it, a crash between the
# rename and os.remove(original) leaves BOTH visible with nothing
# recording the pair; a recovery that re-runs delete_keys would then
# rewrite the original AGAIN — permanently duplicating its unmatched
# rows (they already live in the first replacement). The manifest
# makes that window repairable: finish_delete_swap removes the stale
# original instead.
_DELETE_MANIFEST = ".delete-inprogress"


def _write_manifest_atomic(manifest_path: str, state: dict) -> None:
    """Write a JSON manifest via temp-name + os.rename (atomic on
    POSIX), so a crash mid-write can never leave truncated JSON that
    bricks every subsequent maintenance call on the table."""
    import json

    tmp = manifest_path + ".__tmp"
    with open(tmp, "w") as mf:
        json.dump(state, mf)
        mf.flush()
        os.fsync(mf.fileno())
    os.rename(tmp, manifest_path)


def _read_manifest(manifest_path: str) -> dict:
    import json

    try:
        with open(manifest_path) as f:
            return json.load(f)
    except json.JSONDecodeError as e:
        raise RuntimeError(
            f"maintenance manifest {manifest_path} is unparseable "
            f"({e}). This should be impossible with the atomic "
            f"temp+rename writer; if the file was hand-edited or the "
            f"filesystem corrupted it, inspect the table directory "
            f"(dot-prefixed staged files are invisible to readers and "
            f"safe to keep), restore or delete the manifest, and "
            f"re-run."
        ) from e


def finish_compact_swap(path: str) -> int:
    """Repair a crashed compact() swap; returns files removed.

    Roll-FORWARD when every incoming file is available (in place or
    still in the tmp sibling): finish the renames, then remove the
    doomed originals. Roll BACK when the incoming set is incomplete
    and the tmp sibling is gone: remove the incoming files that made
    it in (all originals are still present — removal is ordered after
    the manifest check) so the table returns to its exact pre-compact
    state instead of a permanent superset. Idempotent no-op when no
    manifest exists. Called automatically at the top of compact() and
    delete_keys(); readers that care about exactness can call it
    before scanning.
    """
    manifest = os.path.join(path, _SWAP_MANIFEST)
    if not os.path.exists(manifest):
        return 0
    state = _read_manifest(manifest)
    doomed, incoming = state["doomed"], state["incoming"]
    tmp = os.path.join(os.path.dirname(path.rstrip("/")), state["tmp"])
    removed = 0
    missing = [
        n for n in incoming if not os.path.exists(os.path.join(path, n))
    ]
    for name in missing:  # roll forward from the tmp sibling if it survives
        src = os.path.join(tmp, name)
        if os.path.exists(src):
            os.rename(src, os.path.join(path, name))
    still_missing = [
        n for n in incoming if not os.path.exists(os.path.join(path, n))
    ]
    if still_missing:
        # Incomplete swap, tmp gone: roll back. Originals are all
        # present (their removal is gated on a complete incoming set).
        for name in incoming:
            p = os.path.join(path, name)
            if os.path.exists(p):
                os.remove(p)
                removed += 1
    else:
        for name in doomed:
            p = os.path.join(path, name)
            if os.path.exists(p):
                os.remove(p)
                removed += 1
        shutil.rmtree(tmp, ignore_errors=True)
    os.remove(manifest)
    if os.path.exists(os.path.join(path, _SNAPSHOT)):
        publish_snapshot(path)  # re-sync after the repaired swap
    return removed


def finish_delete_swap(path: str) -> int:
    """Repair a crashed delete_keys() per-file swap; returns files
    removed.

    Roll FORWARD when the replacement named by the manifest exists
    (it is only renamed in after being fully written and counted):
    remove the doomed original, which otherwise permanently
    duplicates its unmatched rows on the re-run. Roll BACK when the
    replacement is missing (crash before the rename): the original is
    intact, so only the manifest and any stranded ``*.__tmp`` staging
    directory need cleaning — the delete itself re-runs idempotently.
    Also garbage-collects staging directories orphaned by a crash
    BEFORE the manifest write (same single-writer assumption every
    maintenance entry point already makes). Idempotent no-op without
    a manifest; called at the top of delete_keys().
    """
    removed = 0
    manifest = os.path.join(path, _DELETE_MANIFEST)
    if os.path.exists(manifest):
        state = _read_manifest(manifest)
        doomed = os.path.join(path, state["doomed"])
        replacement = os.path.join(path, state["replacement"])
        if os.path.exists(replacement) and os.path.exists(doomed):
            os.remove(doomed)
            removed += 1
        os.remove(manifest)
    # Staging dirs (part-del-<token>.parquet.__tmp) from a crash
    # mid-write: invisible to Spark readers but their inner part
    # files pollute _parquet_files and leak forever.
    for root, dirs, _files in os.walk(path):
        for d in list(dirs):
            if d.startswith("part-del-") and d.endswith(".__tmp"):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                dirs.remove(d)
    if removed and os.path.exists(os.path.join(path, _SNAPSHOT)):
        publish_snapshot(path)  # re-sync after the repaired swap
    return removed


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return out


# ---------------------------------------------------------------------------
# Snapshot isolation for readers racing maintenance.
#
# Directory listing is not a snapshot: compact()'s rename-in-then-
# remove swap exposes a transient SUPERSET (every row duplicated) and
# delete/upsert expose partial mixes to any reader that lists the
# directory mid-swap. The fix is the one every transactional table
# format uses — reads resolve a manifest, not the listing:
#
# - ``_snapshot.json`` names the exact file set of the current
#   version (leading underscore: invisible to Spark listings and to
#   _parquet_files). It is replaced atomically (temp + rename), so a
#   racing reader resolves EITHER the old version OR the new one.
# - Maintenance ops publish at their commit point, ordered so that a
#   published file set is always fully on disk: compact publishes
#   after the rename-in loop and BEFORE removing originals;
#   delete_keys publishes after each per-file replacement lands and
#   before its original is removed; upsert_keys suppresses the
#   per-file publishes and publishes ONCE after the update file's
#   final rename — a MERGE is atomic to snapshot readers.
# - A reader holding version N can still lose files mid-scan when the
#   writer commits N+1 and removes N's files (plain filesystems have
#   no reference counting). ``with_snapshot`` wraps the read in the
#   standard optimistic retry: on a vanished-file error, re-resolve
#   the manifest and re-run. Production deployments keep a version-
#   retention window instead; same protocol, longer grace.
#
# Residual gap (What's missing #4): atomic-rename publication holds
# on POSIX and HDFS. On S3-class stores os.rename is copy+delete and
# listings are eventually consistent — the manifest flip must become
# a conditional PUT of a pointer object (or a catalog service); the
# READER protocol (resolve pointer -> read exact file set -> retry on
# conflict) carries over unchanged.
_SNAPSHOT = "_snapshot.json"


def publish_snapshot(path: str, files: list[str] | None = None) -> dict:
    """Atomically publish the table's current (or given) visible file
    set as the new snapshot version. Maintenance ops call this at
    their commit points; appending sinks that want their output
    visible to snapshot readers call it after appending."""
    manifest = os.path.join(path, _SNAPSHOT)
    prev = _read_manifest(manifest) if os.path.exists(manifest) else {}
    state = {
        "version": int(prev.get("version", 0)) + 1,
        "files": sorted(
            os.path.relpath(f, path)
            for f in (files if files is not None else _parquet_files(path))
        ),
    }
    _write_manifest_atomic(manifest, state)
    return state


def read_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """One consistent version of the table: the snapshot manifest's
    exact file list (legacy directory listing when no manifest
    exists — pre-snapshot tables keep working). The returned frame
    plans over that file set; if a concurrent writer commits and
    removes the version's files before the caller's action runs, the
    action fails with a vanished-file error — wrap the action in
    ``with_snapshot`` for the optimistic retry."""
    manifest = os.path.join(path, _SNAPSHOT)
    if not os.path.exists(manifest):
        return spark.read.parquet(path)
    state = _read_manifest(manifest)
    if not state["files"]:
        return spark.read.parquet(path).limit(0)
    df = spark.read.parquet(
        *[os.path.join(path, f) for f in state["files"]]
    )
    _verify_snapshot_listing(df, path, state)
    return df


def _verify_snapshot_listing(df: DataFrame, path: str, state: dict) -> None:
    """Raise (retryably) unless the frame's planned scan covers the
    snapshot's EXACT file set.

    ``spark.read.parquet`` checks path existence at resolution, but a
    file vanishing between that check and the leaf-file listing is
    TOLERATED by Spark's InMemoryFileIndex (it logs "was it deleted
    very recently?" and lists the path as empty) — so a reader racing
    a maintenance swap could otherwise silently scan a strict SUBSET
    of the version it resolved (observed as a 7-of-8-file "partial
    MERGE" read under suite load). Comparing ``df.inputFiles()``
    against the manifest closes the listing window; a vanish AFTER
    planning still fails loudly at task time (ignoreMissingFiles stays
    false), so no silent path remains. The raised message says "does
    not exist" so ``with_snapshot`` retries onto the next version.
    """
    from urllib.parse import unquote, urlparse

    planned = {
        os.path.realpath(unquote(urlparse(u).path) if "://" in u or
                         u.startswith("file:") else unquote(u))
        for u in df.inputFiles()
    }
    missing = [
        f
        for f in state["files"]
        if os.path.realpath(os.path.join(path, f)) not in planned
    ]
    if missing:
        raise FileNotFoundError(
            f"snapshot version {state.get('version')} file(s) vanished "
            f"during listing — does not exist: {missing}"
        )


def with_snapshot(
    spark: SparkSession,
    path: str,
    action,
    max_attempts: int = 20,
    backoff_s: float = 0.25,
    backoff_cap_s: float = 2.0,
):
    """Run ``action(df)`` against one snapshot version, retrying with
    a freshly resolved snapshot when the version's files vanish under
    the scan (a concurrent maintenance commit). Every successful
    return therefore reflects EXACTLY one published version — the
    isolation property tests/test_maintenance_isolation.py pins.

    Backoff is EXPONENTIAL (×1.5 per conflict, capped at
    ``backoff_cap_s``): a fixed 0.25 s × 20 budget is ~5 s of grace,
    which a single long maintenance commit (many-file rewrite on a
    busy box) can outlast — observed as a spurious "no stable
    version" on a loaded host. The growing backoff holds the same
    20-attempt conflict bound while extending the time budget to
    ~25 s, and an idle reader's first retries stay as fast as before.
    """
    import time

    last: Exception | None = None
    sleep_s = backoff_s
    for _ in range(max_attempts):
        try:
            # resolution INSIDE the retry: spark.read.parquet validates
            # paths eagerly, so a vanished version file raises here,
            # not just at action time
            return action(read_snapshot(spark, path))
        except Exception as e:  # vanished files surface as analysis
            # or task failures wrapping FileNotFound / "does not exist"
            msg = str(e)
            if (
                "FileNotFoundException" not in msg
                and "does not exist" not in msg
                and "PATH_NOT_FOUND" not in msg
                and "FILE_NOT_EXIST" not in msg
            ):
                raise
            last = e
            time.sleep(sleep_s)
            sleep_s = min(sleep_s * 1.5, backoff_cap_s)
    raise RuntimeError(
        f"with_snapshot: no stable version within {max_attempts} "
        f"attempts (writer holding the table?)"
    ) from last


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = _TARGET_BYTES_DEFAULT,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Bin-pack ``path``'s parquet files toward ``target_bytes`` each.

    Returns {files_before, files_after, rows}. Skips (and reports)
    when the directory is already a single adequately-sized file —
    unless ``sort_by`` is given, which always rewrites (a layout
    change is the point). Partition-dir layouts should be compacted
    per leaf directory so partition pruning survives; this operates
    on one leaf.

    ``sort_by``: cluster the rewritten data on these columns
    (repartitionByRange + sortWithinPartitions), so each output FILE
    and each parquet ROW GROUP covers a narrow, near-disjoint range
    of the sort key. Parquet stores per-row-group min/max statistics;
    a filter on the sort column then skips whole row groups and —
    with file-level stats — whole files at planning time. At 100 TB
    this is the difference between scanning the full table and
    touching the few files a time/key predicate selects (the same
    lever a transactional format's OPTIMIZE pulls; single-key
    clustering, which Spark expresses natively).

    ``zorder_by``: cluster on the MORTON interleave of several
    columns (functions/zorder.py) instead — lexicographic sort_by
    makes stats selective only for the leading column, while z-order
    gives every participating column partial locality, so a filter on
    ANY of them skips most row groups (OPTIMIZE ZORDER's contract;
    pruning factors pinned in tests/test_zorder.py). Mutually
    exclusive with ``sort_by``.
    """
    if sort_by and zorder_by:
        raise ValueError("sort_by and zorder_by are mutually exclusive")
    finish_compact_swap(path)
    finish_delete_swap(path)
    finish_upsert(spark, path)
    files = _parquet_files(path)
    if len(files) == 0 or (len(files) <= 1 and not (sort_by or zorder_by)):
        return {
            "files_before": len(files),
            "files_after": len(files),
            "rows": None,
            "skipped": True,
        }
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(path)
    n_rows = df.count()
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex}"
    # repartition (not coalesce): coalesce would chain the upstream
    # scan tasks 1:1 into few writers and lose read parallelism of the
    # compaction job itself on big inputs.
    if zorder_by:
        from scio_db_spark.functions.zorder import with_z_order

        clustered = (
            with_z_order(df, zorder_by)
            .repartitionByRange(int(n_out), "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        clustered.write.mode("overwrite").parquet(tmp)
    elif sort_by:
        clustered = df.repartitionByRange(
            int(n_out), *sort_by
        ).sortWithinPartitions(*sort_by)
        clustered.write.mode("overwrite").parquet(tmp)
    else:
        df.repartition(int(n_out)).write.mode("overwrite").parquet(tmp)
    check = spark.read.parquet(tmp).count()
    if check != n_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch ({check} != {n_rows}); "
            f"original left untouched"
        )
    # Move the new files IN before removing the old ones (Spark's
    # part-<uuid> names cannot collide with the existing files): every
    # crash point then leaves the directory a readable superset — a
    # remove-first ordering would strand all data in the tmp sibling if
    # the job died between the two loops. The manifest written first
    # bounds the duplicate window: a crash anywhere after it leaves a
    # state the next compact()/delete_keys()/finish_compact_swap()
    # repairs exactly (remove surviving listed originals), instead of
    # a permanent undetectable superset.
    new_files = _parquet_files(tmp)
    manifest = os.path.join(path, _SWAP_MANIFEST)
    _write_manifest_atomic(
        manifest,
        {
            "doomed": [os.path.basename(f) for f in files],
            "incoming": [os.path.basename(f) for f in new_files],
            "tmp": os.path.basename(tmp.rstrip("/")),
        },
    )
    for f in new_files:
        os.rename(f, os.path.join(path, os.path.basename(f)))
    # Snapshot commit point: the incoming set is fully on disk, the
    # originals still are too (superset on the FILESYSTEM, but
    # snapshot readers never see it — they resolve either the old
    # version or this one).
    publish_snapshot(
        path,
        [os.path.join(path, os.path.basename(f)) for f in new_files],
    )
    for f in files:
        os.remove(f)
    os.remove(manifest)
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "files_before": len(files),
        "files_after": len(_parquet_files(path)),
        "rows": n_rows,
        "skipped": False,
    }


def finish_upsert(spark: SparkSession, path: str) -> bool:
    """Repair a crashed upsert_keys(); returns True if one was found.

    The staged update file (dot-prefixed, invisible to readers and to
    _parquet_files) carries the update rows INCLUDING the key column,
    so recovery always rolls FORWARD to the exact MERGE result:
    re-run the idempotent delete with keys re-read from the staged
    file, rename it visible, drop the manifest. If the staged file is
    already gone the original run reached its final rename — only the
    manifest cleanup remained. Idempotent no-op without a manifest.
    """
    manifest = os.path.join(path, _UPSERT_MANIFEST)
    if not os.path.exists(manifest):
        _gc_orphan_staged(path)
        return False
    state = _read_manifest(manifest)
    staged = os.path.join(path, state["staged"])
    final = os.path.join(path, state["final"])
    if os.path.exists(staged):
        # The dot-prefixed staged file is hidden from Spark readers
        # even when addressed directly — copy it to a visible temp
        # sibling to re-read the keys (|updates|-sized, cheap).
        tmp = f"{path.rstrip('/')}__upsert_recover_{uuid.uuid4().hex}"
        os.makedirs(tmp)
        shutil.copy(staged, os.path.join(tmp, "staged.parquet"))
        try:
            # An empty VISIBLE file set means the crashed delete
            # already removed every matched file (or the table was
            # bootstrapping) — nothing left to delete from, and
            # spark.read.parquet on zero files cannot infer a schema.
            if _parquet_files(path):
                up = spark.read.parquet(tmp).localCheckpoint(eager=True)
                delete_keys(
                    spark, path, state["key_col"],
                    up.select(state["key_col"]),
                    _recover=False, _publish=False,
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        os.rename(staged, final)
    os.remove(manifest)
    _gc_orphan_staged(path)
    if os.path.exists(os.path.join(path, _SNAPSHOT)):
        publish_snapshot(path)  # re-sync after the rolled-forward MERGE
    return True


def _gc_orphan_staged(path: str) -> int:
    """Remove ``.upsert-staged-*`` files no manifest references.

    A crash between upsert_keys' staging rename and its manifest write
    leaves a dot-prefixed staged file nothing ever cleans — invisible
    to readers, but an unbounded leak across crashes. Called only
    AFTER the current manifest (if any) has been handled, so every
    survivor is an orphan. Same single-writer assumption as the other
    recovery paths.
    """
    if not os.path.isdir(path):
        return 0
    removed = 0
    for name in os.listdir(path):
        if name.startswith(".upsert-staged-") and name.endswith(".parquet"):
            os.remove(os.path.join(path, name))
            removed += 1
    return removed


def delete_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: DataFrame,
    _recover: bool = True,
    _publish: bool = True,
) -> dict:
    """Delete rows whose ``key_col`` appears in ``keys`` (a one-column
    DataFrame), rewriting ONLY the files that contain matches.

    Returns {files_scanned, files_rewritten, rows_deleted}.
    """
    finish_compact_swap(path)
    # Unconditional even when _recover=False (the finish_upsert
    # re-entry path): the half-swapped state is the delete loop's OWN
    # crash artifact and must be repaired before any re-run.
    finish_delete_swap(path)
    if _recover:
        finish_upsert(spark, path)
    # Pin the key set BEFORE any file is rewritten: a lazy ``keys``
    # derived from the TARGET table itself (the dedup-reduce pattern:
    # doomed ids = table ⟕ kept) would otherwise be re-evaluated
    # against files this loop has already deleted, failing the read
    # mid-rewrite.
    key_set = keys.select(
        F.col(keys.columns[0]).alias("__doomed")
    ).localCheckpoint(eager=True)
    df = spark.read.parquet(path)
    affected = (
        df.withColumn("__file", F.input_file_name())
        .join(
            F.broadcast(key_set),
            F.col(key_col) == F.col("__doomed"),
            "left_semi",
        )
        .select("__file")
        .distinct()
        .collect()
    )
    # Row attrs starting with "__" aren't getattr-accessible — index.
    # input_file_name() returns a URI (scheme + percent-encoding):
    # decode properly or paths with spaces/%-chars rewrite into a
    # bogus encoded directory while os.remove misses the original.
    from urllib.parse import unquote, urlparse

    def _to_path(uri: str) -> str:
        p = urlparse(uri)
        return unquote(p.path) if p.scheme else unquote(uri)

    files = sorted(_to_path(r[0]) for r in affected)
    files_scanned = len(_parquet_files(path))
    deleted = 0
    for f in files:
        part = spark.read.parquet(f)
        before = part.count()
        kept = part.join(
            F.broadcast(key_set),
            part[key_col] == F.col("__doomed"),
            "left_anti",
        )
        replacement = os.path.join(
            os.path.dirname(f), f"part-del-{uuid.uuid4().hex}.parquet"
        )
        tmp = replacement + ".__tmp"
        kept.coalesce(1).write.mode("overwrite").parquet(tmp)
        written = _parquet_files(tmp)
        after = spark.read.parquet(tmp).count() if written else 0
        # stage-then-commit per file: original removed only after the
        # replacement is fully written and counted. The manifest goes
        # down BEFORE the rename — between rename and remove both the
        # replacement and the original are visible, and without a
        # record of the pair a recovery re-running delete_keys would
        # rewrite the original again, permanently duplicating its
        # unmatched rows. finish_delete_swap rolls this window
        # forward (remove the stale original) instead.
        manifest = os.path.join(path, _DELETE_MANIFEST)
        if written:
            _write_manifest_atomic(
                manifest,
                {
                    "doomed": os.path.relpath(f, path),
                    "replacement": os.path.relpath(replacement, path),
                },
            )
            os.rename(written[0], replacement)
        shutil.rmtree(tmp, ignore_errors=True)
        if _publish:
            # per-file snapshot commit: replacement (if any) is fully
            # on disk, the original is excluded — each published
            # version is a consistent partial-progress state (upsert
            # suppresses these and publishes the MERGE atomically)
            publish_snapshot(
                path,
                [x for x in _parquet_files(path) if x != f],
            )
        os.remove(f)
        if written:
            os.remove(manifest)
        deleted += before - after
    return {
        "files_scanned": files_scanned,  # counted BEFORE the rewrite
        "files_rewritten": len(files),
        "rows_deleted": deleted,
    }


def compact_partitioned(
    spark: SparkSession,
    root: str,
    target_bytes: int = _TARGET_BYTES_DEFAULT,
) -> dict:
    """Compact every leaf partition directory under ``root`` in place.

    The windowed sinks write ``window_start=.../`` partition dirs;
    compacting per leaf (instead of rewriting the whole table) keeps
    the partition layout — and therefore partition pruning — intact,
    and bounds each job by one partition's data. Returns per-leaf
    stats keyed by relative path.
    """
    leaves = sorted(
        {os.path.dirname(f) for f in _parquet_files(root)}
    )
    out = {}
    for leaf in leaves:
        rel = os.path.relpath(leaf, root)
        out[rel] = compact(spark, leaf, target_bytes=target_bytes)
    return out


def upsert_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    updates: DataFrame,
) -> dict:
    """MERGE-style upsert: every table row whose ``key_col`` matches an
    update key is replaced by the update row(s); update keys absent
    from the table are inserted. Implemented as the composition the
    file layout makes surgical: ``delete_keys`` on the matched keys
    (rewrites ONLY files containing matches) + ONE appended file
    holding all update rows — cost scales with |affected files| +
    |updates|, not table size, the same contract DELETE/MERGE compiles
    to on a transactional table format.

    ``updates`` must carry the table's schema. It is pinned with an
    eager localCheckpoint BEFORE any file is touched, so an updates
    frame derived from the target table itself (the common
    read-modify-write pattern) cannot be re-evaluated against
    half-rewritten files. If the table holds several rows for a key,
    ALL are replaced by the update rows for that key (count may
    shrink) — MERGE semantics, documented here rather than guessed.

    Crash safety: the update rows are STAGED first, as a dot-prefixed
    parquet file inside the table directory (invisible to readers),
    and the .upsert-inprogress manifest — naming the staged file, its
    final visible name, and the key column — is committed atomically
    BEFORE delete_keys removes anything. A crash at any later point
    rolls forward via finish_upsert(): the staged file itself holds
    the keys to (idempotently) re-delete, so matched rows can never be
    lost — the defect in the previous delete-then-append ordering,
    where a crash between the two silently dropped every matched row.

    Returns {files_scanned, files_rewritten, rows_deleted,
    rows_upserted}.
    """
    finish_compact_swap(path)
    finish_delete_swap(path)
    finish_upsert(spark, path)
    cols = spark.read.parquet(path).columns
    up = updates.select(*cols).localCheckpoint(eager=True)
    n_up = up.count()
    # Stage: write to a tmp sibling, move the parquet into the table
    # under a dot name (invisible), THEN commit the manifest. A crash
    # before the manifest leaves only an orphaned dot file (harmless);
    # after it, finish_upsert rolls forward to the exact MERGE result.
    token = uuid.uuid4().hex
    tmp = f"{path.rstrip('/')}__upsert_{token}"
    up.coalesce(1).write.mode("overwrite").parquet(tmp)
    written = _parquet_files(tmp)
    staged_name = f".upsert-staged-{token}.parquet"
    final_name = f"part-upsert-{token}.parquet"
    if written:
        os.rename(written[0], os.path.join(path, staged_name))
    shutil.rmtree(tmp, ignore_errors=True)
    _write_manifest_atomic(
        os.path.join(path, _UPSERT_MANIFEST),
        {"staged": staged_name, "final": final_name, "key_col": key_col},
    )
    stats = delete_keys(
        spark, path, key_col, up.select(key_col),
        _recover=False, _publish=False,
    )
    if written:
        os.rename(
            os.path.join(path, staged_name),
            os.path.join(path, final_name),
        )
    # Snapshot commit point: delete + insert land as ONE version —
    # snapshot readers see pre-MERGE or post-MERGE, never the
    # deleted-but-not-yet-inserted middle.
    publish_snapshot(path)
    os.remove(os.path.join(path, _UPSERT_MANIFEST))
    return {
        "files_scanned": stats["files_scanned"],
        "files_rewritten": stats["files_rewritten"],
        "rows_deleted": stats["rows_deleted"],
        "rows_upserted": n_up,
    }


def upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    key_col: str,
    seq_col: str | None = None,
) -> dict:
    """One micro-batch of a streaming MERGE sink: collapse the batch
    to its latest row per key (by ``seq_col``, when rows for a key can
    co-occur in a batch), then upsert into the parquet table.

    Replay-safe by CONVERGENCE rather than by epoch bookkeeping:
    foreachBatch bodies are at-least-once, and re-applying the same
    upsert reproduces the identical table state (delete the same keys,
    append the same rows) — so a post-write pre-checkpoint crash
    replays into a no-op. That is the file-layout equivalent of a
    transactional MERGE sink (Delta's streaming merge), with cost
    ∝ |affected files| + |batch| per epoch via upsert_keys.

    First batch bootstraps the table with a plain write.
    """
    latest = batch_df
    if seq_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(key_col).orderBy(F.desc(seq_col))
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    # Recover BEFORE the bootstrap emptiness check: a crashed upsert
    # can leave the VISIBLE file set empty while a pending
    # .upsert-inprogress manifest + staged rows hold the real state —
    # mode('overwrite') below would silently delete both. Safe under
    # same-batch replay only by luck; a manual or different-batch
    # caller would lose the pending merge undetectably.
    finish_compact_swap(path)
    finish_delete_swap(path)
    finish_upsert(spark, path)
    if not _parquet_files(path):
        latest.write.mode("overwrite").parquet(path)
        return {
            "files_scanned": 0,
            "files_rewritten": 0,
            "rows_deleted": 0,
            "rows_upserted": latest.count(),
        }
    return upsert_keys(spark, path, key_col, latest)


def streaming_upsert_sink(
    stream_df: DataFrame,
    path: str,
    key_col: str,
    checkpoint: str,
    seq_col: str | None = None,
    trigger: dict | None = None,
):
    """Streaming MERGE sink: every micro-batch upserts into the keyed
    parquet table via upsert_batch (returns the started query)."""
    writer = stream_df.writeStream.foreachBatch(
        lambda batch_df, _epoch: upsert_batch(
            batch_df.sparkSession, batch_df, path, key_col, seq_col
        )
    ).option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
