"""Deterministic streaming test harness (S8).

The Spark analogue of Beam's ``testStreamOf``
(``MediationServiceSpec.scala:47-57``): each ``add_batch`` call writes
one parquet file into a monitored directory and runs ONE
``Trigger.AvailableNow`` pass over it against a persistent checkpoint,
so tests control exactly which records arrive in which micro-batch and
per-key state survives between batches exactly as it would across
micro-batches of a long-running query.

Why not a single continuous query + ``processAllAvailable``? With
``applyInPandasWithState(ProcessingTimeTimeout)`` Spark schedules
timer-check batches continuously, so ``processAllAvailable`` never
observes a quiescent stream and blocks forever. The start/stop model
below is the deterministic equivalent: state (and armed timeouts) are
restored from the checkpoint on every restart.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _stage_one_file(spark, rows, schema, input_dir: str) -> None:
    """Write rows as ONE parquet file into a monitored dir (the file
    source doesn't recurse into the directory a DataFrame write
    creates, hence the staging-dir + rename)."""
    df = spark.createDataFrame(rows, schema)
    staging = tempfile.mkdtemp(prefix="stream_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.rename(
        os.path.join(staging, part),
        os.path.join(input_dir, f"batch_{uuid.uuid4().hex}.parquet"),
    )
    shutil.rmtree(staging, ignore_errors=True)


def _run_available_now(
    out: DataFrame, output_mode: str, checkpoint_dir: str, collected: list
) -> None:
    """One Trigger.AvailableNow pass of ``out`` into ``collected``."""

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        collected.extend(batch_df.collect())

    query = (
        out.writeStream.foreachBatch(_sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()



class StreamHarness:
    """Drives a streaming transform micro-batch by micro-batch.

    Usage::

        h = StreamHarness(spark, schema)
        h.start(lambda stream: my_transform(stream))
        h.add_batch(rows)       # one micro-batch, runs to completion
        out1 = h.results()      # rows emitted so far
        h.add_batch(more_rows)
        ...
        h.stop()
    """

    def __init__(self, spark: SparkSession, schema: StructType | str):
        self.spark = spark
        self.schema = schema
        self.input_dir = tempfile.mkdtemp(prefix="stream_in_")
        self.checkpoint_dir = tempfile.mkdtemp(prefix="stream_ck_")
        self._transform: Callable[[DataFrame], DataFrame] | None = None
        self._output_mode = "update"
        self._collected: list = []

    def start(
        self,
        transform: Callable[[DataFrame], DataFrame],
        output_mode: str = "update",
    ) -> None:
        self._transform = transform
        self._output_mode = output_mode

    def _run_pass(self) -> None:
        stream = (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", "1")  # one file = one micro-batch
            .parquet(self.input_dir)
        )
        _run_available_now(
            self._transform(stream),
            self._output_mode,
            self.checkpoint_dir,
            self._collected,
        )

    def add_batch(self, rows: list, wait: bool = True) -> None:
        _stage_one_file(self.spark, rows, self.schema, self.input_dir)
        if wait:
            self._run_pass()

    def process_pending(self) -> None:
        """Run one available-now pass without adding data (fires due timers)."""
        self._run_pass()

    def results(self) -> list:
        return list(self._collected)

    def stop(self) -> None:
        self._transform = None
        # Remove the per-harness temp dirs (checkpoints include RocksDB
        # state — dozens of streaming tests would otherwise accumulate
        # hundreds of dirs per CI run).
        shutil.rmtree(self.input_dir, ignore_errors=True)
        shutil.rmtree(self.checkpoint_dir, ignore_errors=True)


class DualStreamHarness:
    """Two-input variant for stream-stream transforms (joins).

    Same start/stop + availableNow-pass model as ``StreamHarness``;
    ``add_batches(left_rows, right_rows)`` delivers one micro-batch
    containing the given rows on each side (either may be empty) and
    runs it to completion against the shared checkpoint, so join
    state and watermarks persist across calls exactly as across
    micro-batches of a long-running query.
    """

    def __init__(
        self,
        spark: SparkSession,
        left_schema: StructType | str,
        right_schema: StructType | str,
    ):
        self.spark = spark
        self._schemas = (left_schema, right_schema)
        self._input_dirs = (
            tempfile.mkdtemp(prefix="stream_in_l_"),
            tempfile.mkdtemp(prefix="stream_in_r_"),
        )
        self.checkpoint_dir = tempfile.mkdtemp(prefix="stream_ck2_")
        self._transform = None
        self._collected: list = []

    def start(self, transform, output_mode: str = "append") -> None:
        self._transform = transform
        self._output_mode = output_mode

    def add_batches(self, left_rows: list, right_rows: list) -> None:
        # Stage both sides' files first, then ONE pass consumes them
        # together (maxFilesPerTrigger=1 per side keeps it one file
        # each; an empty side simply contributes no rows this batch).
        for rows, schema, d in zip(
            (left_rows, right_rows), self._schemas, self._input_dirs
        ):
            if rows:
                _stage_one_file(self.spark, rows, schema, d)
        l_stream, r_stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
            for schema, d in zip(self._schemas, self._input_dirs)
        )
        _run_available_now(
            self._transform(l_stream, r_stream),
            self._output_mode,
            self.checkpoint_dir,
            self._collected,
        )

    def results(self) -> list:
        return list(self._collected)

    def stop(self) -> None:
        self._transform = None
        for d in self._input_dirs:
            shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(self.checkpoint_dir, ignore_errors=True)
