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

from .. import cache
from ..kernels.classify import OFFICE_SNIFF_RE
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


# a tail office run longer than this flushes anyway — bounds side-state
# per conversation (the cross-page merge window; real continuation chains
# are 2-4 tables)
MAX_OPEN_RUN = 64


def _split_open_tails(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(closed_rows, open_tail_rows) over raw transcript rows.

    A conversation's OPEN TAIL is the maximal suffix of ADJACENT office
    turns ending at its max turn_idx — exactly the rows a later batch
    could still extend through the cross-turn table merge.  Everything
    else is closed: a trailing non-office turn (or a gap) breaks the run,
    so no future turn can merge into it.  JVM-only: the office sniff +
    two window expressions, no Python."""
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
    wall = W.partitionBy("conv_id")
    flagged = (df.withColumn("_office",
                             F.col("text").rlike(OFFICE_SNIFF_RE)
                             .cast("int"))
               .withColumn("_max_idx", F.max("turn_idx").over(wall))
               .withColumn("_rn", F.row_number().over(w))
               # running AND of office-ness from the conversation's top
               .withColumn("_all_office",
                           F.min("_office").over(
                               w.rowsBetween(W.unboundedPreceding, 0)))
               .withColumn("_tail",
                           (F.col("_all_office") == 1)
                           & (F.col("turn_idx")
                              == F.col("_max_idx") - (F.col("_rn") - 1))
                           & (F.col("_rn") <= MAX_OPEN_RUN)))
    cols = df.columns
    closed = flagged.filter(~F.col("_tail")).select(*cols)
    tails = flagged.filter(F.col("_tail")).select(*cols)
    return closed, tails


def _run_state_path(out_dir: str, epoch: int | None = None) -> str:
    base = os.path.join(out_dir, "run_state")
    return base if epoch is None else os.path.join(base, f"epoch={epoch}")


def _read_run_state(spark: SparkSession, out_dir: str,
                    before_epoch: int | None = None) -> DataFrame | None:
    """Open-tail rows of the latest epoch (< before_epoch when given —
    a REPLAYED epoch must read the state that preceded it, never its own
    partial write), or None."""
    base = _run_state_path(out_dir)
    try:
        epochs = [int(d.split("=", 1)[1]) for d in os.listdir(base)
                  if d.startswith("epoch=")]
    except FileNotFoundError:
        return None
    if before_epoch is not None:
        epochs = [e for e in epochs if e < before_epoch]
    if not epochs:
        return None
    path = _run_state_path(out_dir, max(epochs))
    if not _path_has_data(spark, path):
        return None
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)


def streaming_extract(spark: SparkSession, in_dir: str, out_dir: str,
                      checkpoint_dir: str, watermark: str = "1 hour",
                      max_files_per_trigger: int = 8):
    """Start the streaming extraction job; returns the StreamingQuery.

    Late/duplicate turns inside the watermark are dropped by state;
    cross-restart duplicates are dropped by the sink's lineage anti-join
    (idempotent foreachBatch).

    CROSS-BATCH continuations: each micro-batch holds back every
    conversation's open tail office run (the rows a later batch could
    still merge into) in a raw side-state (`out_dir/run_state/epoch=N`)
    instead of committing them; the next batch unions the held rows with
    its own before the fused ``extract_finalized`` pass, so a
    continuation table whose anchor arrived in an EARLIER trigger merges
    exactly like the batch path.  The sink stays append-only — no row is
    ever revised.  Replay safety: the sink write precedes the state
    write, held rows are never in the sink (the anti-join can't drop
    them), and each epoch overwrites its own state dir, so a replayed
    epoch reproduces the same split.  Call :func:`flush_open_runs` after
    the stream drains (or on a watermark-style timer in a continuous
    deployment) to commit still-open tails.

    Assumes per-conversation in-order arrival (log-stream contract): a
    turn arriving after a LATER turn of its conversation was committed
    merges only with state-resident tails."""
    extracted_path = os.path.join(out_dir, "extracted")

    src = (read_transcript_stream(spark, in_dir, max_files_per_trigger)
           .withWatermark("ts", watermark)
           .dropDuplicates(["conv_id", "turn_idx"]))

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        todo = batch_df
        if _path_has_data(spark, extracted_path):
            lineage = spark.read.parquet(extracted_path) \
                .select("conv_id", "turn_idx")
            todo = todo.join(lineage, ["conv_id", "turn_idx"], "left_anti")
        state = _read_run_state(spark, out_dir, before_epoch=int(epoch_id))
        if state is not None:
            todo = todo.unionByName(state) \
                .dropDuplicates(["conv_id", "turn_idx"])
        closed, tails = _split_open_tails(todo)
        result = extract_finalized(closed) \
            .withColumn("part_id", F.spark_partition_id())
        result.write.mode("append").parquet(extracted_path)
        tails.write.mode("overwrite") \
            .parquet(_run_state_path(out_dir, int(epoch_id)))
        # batch actions complete: release the run-key cache so per-epoch
        # invocations of extract_finalized never accumulate cached frames
        # (tag-scoped: a concurrent query's caches in the same session
        # must survive the epoch — r4 ADVICE)
        cache.release("extract_keys")
        # prune state epochs older than the replay window (previous epoch)
        import shutil
        base = _run_state_path(out_dir)
        for d in os.listdir(base):
            if d.startswith("epoch=") \
                    and int(d.split("=", 1)[1]) < int(epoch_id) - 1:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    return (src.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def flush_open_runs(spark: SparkSession, out_dir: str) -> int:
    """Commit all still-open tail runs (stream drained / conversation
    closure): extract+finalize the held raw rows, append to the sink,
    clear the state.  Returns the number of rows flushed."""
    extracted_path = os.path.join(out_dir, "extracted")
    state = _read_run_state(spark, out_dir)
    if state is None:
        return 0
    todo = state
    if _path_has_data(spark, extracted_path):
        lineage = spark.read.parquet(extracted_path) \
            .select("conv_id", "turn_idx")
        todo = todo.join(lineage, ["conv_id", "turn_idx"], "left_anti")
    n = todo.count()
    if n:
        (extract_finalized(todo)
         .withColumn("part_id", F.spark_partition_id())
         .write.mode("append").parquet(extracted_path))
    import shutil
    shutil.rmtree(_run_state_path(out_dir), ignore_errors=True)
    return n


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
