"""Micro-batch streaming harness (SURVEY §4.3.5 / §5.2).

Reproduces filemap's incremental model — new files appearing in a dataset
directory — as Structured Streaming file-source runs that the tests compare
against the batch-equivalent operators in operators/streaming.py.

The harness writes the (ns-normalized) events table out as N parquet files
so the stream reads clean µs timestamps; `maxFilesPerTrigger=1` turns the
file set into a deterministic sequence of micro-batches.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from filemap_spark.io import load_table


def make_stream_input(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> tuple[str, "object"]:
    """Write events as n_files parquet files under a temp dir; returns
    (input_dir, schema) ready for readStream."""
    base = tempfile.mkdtemp(prefix="filemap_stream_")
    input_dir = os.path.join(base, "input")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(n_files).write.mode("overwrite").parquet(input_dir)
    return input_dir, ev.schema


def read_stream(
    spark: SparkSession, input_dir: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def run_available_now(
    spark: SparkSession,
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
    max_batches_hint: str = "",
) -> DataFrame:
    """Run transform(stream) to completion with trigger(availableNow) into a
    memory sink; returns the sink table (materialized final answer)."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    checkpoint = tempfile.mkdtemp(prefix="filemap_ckpt_")
    q = (
        transform(stream_df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
