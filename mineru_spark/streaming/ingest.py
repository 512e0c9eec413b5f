"""Structured Streaming ingestion (SURVEY.md §2.9 streaming).

The reference is batch with a sliding processing window
(pipeline_analyze.py:207-323); the engine is batch-first with an optional
streaming front door:

    readStream(transcript files/queue)
      → withWatermark("ts", ...)            late-data bound
      → dropDuplicates(conv_id, turn_idx)   exactly-once turn semantics
      → foreachBatch(extract + append)      reuses the batch kernels + sink

``foreachBatch`` gives exactly-once per micro-batch against an idempotent
sink: each micro-batch runs the same lineage anti-join used by the batch
resume path, so replayed batches (after failure) write nothing twice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline import TRANSCRIPT_SCHEMA, extract, _path_has_data


def read_transcript_stream(spark: SparkSession, in_dir: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    """File-based streaming source with the transcript schema (stand-in for
    a Kafka/queue source; the schema contract is identical)."""
    return (spark.readStream
            .schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(in_dir))


def streaming_extract(spark: SparkSession, in_dir: str, out_dir: str,
                      checkpoint_dir: str, watermark: str = "1 hour"):
    """Start the streaming extraction job; returns the StreamingQuery.

    Late/duplicate turns inside the watermark are dropped by state;
    cross-restart duplicates are dropped by the sink's lineage anti-join
    (idempotent foreachBatch)."""
    extracted_path = os.path.join(out_dir, "extracted")

    src = (read_transcript_stream(spark, in_dir)
           .withWatermark("ts", watermark)
           .dropDuplicates(["conv_id", "turn_idx"]))

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        todo = batch_df
        if _path_has_data(spark, extracted_path):
            lineage = spark.read.parquet(extracted_path) \
                .select("conv_id", "turn_idx")
            todo = todo.join(lineage, ["conv_id", "turn_idx"], "left_anti")
        result = extract(todo).withColumn("part_id", F.spark_partition_id())
        result.write.mode("append").parquet(extracted_path)

    return (src.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
