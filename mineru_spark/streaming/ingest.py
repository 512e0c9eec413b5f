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

from ..pipeline import (TRANSCRIPT_SCHEMA, extract_finalized,
                        _path_has_data)


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
    (idempotent foreachBatch).

    Each micro-batch runs the same fused ``extract_finalized`` pass as the
    batch path, so adjacent office-table continuations arriving in one batch
    are merged identically.  Known limit (documented, matches the batch
    contract): a continuation whose anchor turn landed in an EARLIER batch
    is already committed and is not re-finalized — keep one conversation's
    turns inside one trigger (the file source groups by file; the producer
    should not split a conversation across files beyond the watermark)."""
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
        result = extract_finalized(todo) \
            .withColumn("part_id", F.spark_partition_id())
        result.write.mode("append").parquet(extracted_path)

    return (src.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_route_counts(spark: SparkSession, in_dir: str, out_dir: str,
                          checkpoint_dir: str, window: str = "10 minutes",
                          watermark: str = "30 minutes"):
    """Watermarked windowed aggregation over the live stream: per
    event-time window × parse route, count turns and payload bytes.

    The watermark bounds state: a row later than `watermark` behind the
    max seen ts is dropped instead of reopening its window — the
    late-data contract for a 10^12-turn stream where windows must close.
    Append output mode emits each window exactly once, when the watermark
    passes its end (checkpointable, replayable).
    """
    from ..pipeline import classify_routes

    src = classify_routes(read_transcript_stream(spark, in_dir))
    agg = (src.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "parse_route")
           .agg(F.count("*").alias("n_turns"),
                F.sum(F.length("text")).alias("payload_bytes"))
           .select(F.col("w.start").alias("w_start"),
                   F.col("w.end").alias("w_end"),
                   "parse_route", "n_turns", "payload_bytes"))
    return (agg.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


# ---------------------------------------------------------------------------
# Custom stateful operator (task brief: applyInPandasWithState)
# ---------------------------------------------------------------------------

def conv_progress_stream(spark: SparkSession, in_dir: str, out_dir: str,
                         checkpoint_dir: str):
    """Per-conversation streaming progress tracker: arbitrary keyed state
    via applyInPandasWithState.  State per conv_id = (turns_seen,
    max_turn_idx); each micro-batch emits the updated totals for the convs
    it touched — the streaming analog of the reference's per-doc
    on_doc_ready completion callback (cli/common.py:402-422).

    Returns the StreamingQuery appending progress rows to ``out_dir``
    (latest row per conv_id = current progress; the memory sink cannot
    recover from a checkpoint, so the sink is a parquet foreachBatch)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        turns = 0
        max_idx = -1
        if state.exists:
            turns, max_idx = state.get
        for pdf in pdf_iter:
            turns += len(pdf)
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((turns, max_idx))
        yield pd.DataFrame({"conv_id": [key[0]],
                            "turns_seen": [turns],
                            "max_turn_idx": [max_idx]})

    src = read_transcript_stream(spark, in_dir).select("conv_id", "turn_idx")
    out = (src.groupBy("conv_id")
           .applyInPandasWithState(
               track,
               outputStructType="conv_id string, turns_seen long, "
                                "max_turn_idx long",
               stateStructType="turns long, max_idx long",
               outputMode="update",
               timeoutConf=GroupStateTimeout.NoTimeout))
    def sink(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(int(epoch_id))) \
            .write.mode("append").parquet(out_dir)

    return (out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
