"""The Spark extraction job (SURVEY.md §3 lifecycle, §7 steps 3-7).

Spark-first shape (mirrors the reference lifecycle at
/root/reference/mineru/backend/pipeline/pipeline_analyze.py:157-328, recast
declaratively; the shipped path is `extract_finalized`):

    scan (or shard-local synthesis)                 [S1]
      → office-run key sniff  JVM-only prefix filter + keys-only
                              gaps-and-islands windows          [tiny]
      → split on broadcast (conv_id, turn_idx) run keys
      ├─ rest (~92-95%)       mapInPandas over Arrow batches    [0 shuffles]
      │                       (per-turn kernels; chars never become rows)
      └─ office runs          repartition(run keys) → ONE fused Python
                              stage: extract + cross-turn finalize [D2]
      → union → sink          parquet/Iceberg append + lineage + metrics

Everything pre/post the UDF is plain DataFrame code so Catalyst keeps
column pruning + predicate pushdown; the UDF receives only (conv_id,
turn_idx, text, tool) — narrow projection — and Arrow batch size bounds
peak memory exactly like the reference's 64-page processing window
(pipeline_analyze.py:207).

Resume/checkpoint: `run_job` is idempotent — already-extracted
(conv_id, turn_idx) pairs are anti-joined away against the sink's lineage
before any work happens (the reference's per-doc on_doc_ready incremental
completion, cli/common.py:402-422, as a set difference).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .datagen.transcripts import conv_length, gen_turn
from . import cache
from .kernels.classify import OFFICE_SNIFF_RE, classify_series
from .kernels.oracle import extract_turn

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

SPAN_TYPE = T.ArrayType(T.StructType([
    T.StructField("page_idx", T.IntegerType(), True),
    T.StructField("bbox", T.ArrayType(T.DoubleType()), True),
    T.StructField("type", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
]))

# metrics are flat int columns (not a struct) so downstream per-partition
# aggregation stays whole-stage-codegen'd
EXTRACT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("route", T.StringType(), True),
    T.StructField("md", T.StringType(), True),
    T.StructField("md_nlp", T.StringType(), True),
    T.StructField("content_list", T.StringType(), True),
    T.StructField("content_list_v2", T.StringType(), True),
    T.StructField("middle", T.StringType(), True),
    T.StructField("spans", SPAN_TYPE, True),
    T.StructField("blocks_classified", T.IntegerType(), True),
    T.StructField("blocks_discarded", T.IntegerType(), True),
    T.StructField("boilerplate_dropped", T.IntegerType(), True),
    T.StructField("tables_parsed", T.IntegerType(), True),
    T.StructField("chars_deduped", T.IntegerType(), True),
    T.StructField("ocr_fallback", T.IntegerType(), True),
    T.StructField("para_merged", T.IntegerType(), True),
    T.StructField("tables_merged", T.IntegerType(), True),
    T.StructField("spans_need_ocr", T.IntegerType(), True),
])

_METRIC_COLS = ["blocks_classified", "blocks_discarded", "boilerplate_dropped",
                "tables_parsed", "chars_deduped", "ocr_fallback",
                "para_merged", "tables_merged", "spans_need_ocr"]


def get_spark(app: str = "mineru_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = master or os.environ.get("SPARK_GRAFT_MASTER") \
        or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    sp = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder
        .master(cores)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # payloads are 10-100 KB strings: small Arrow batches bound worker
        # memory AND pipeline JVM→Python transfer (measured: batch 32 ≈ 2×
        # the turns/sec of batch 512 at local[32]); this is the reference's
        # 64-page processing window (pipeline_analyze.py:207) as a batch
        # size.  Relational queries don't go through Python, so the small
        # batch costs them nothing.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        # the vectorized parquet reader defaults to 4096-row column batches;
        # with ~100 KB payload strings that is ~400 MB of buffer per task —
        # measured 3-10× scan slowdown from allocation/GC churn. 128 rows
        # keeps batches ~10 MB. Same knob matters on a real cluster for any
        # document-payload table.
        .config("spark.sql.parquet.columnarReaderBatchSize", "128")
        # scan-parallelism floor at 4x cores (guide §6): CPU-heavy scans
        # (the extraction map) are straggler-bound with one task wave;
        # finer splits bound the tail.  Scale-relative, not a local
        # constant — at production sizes the 128 MB maxPartitionBytes
        # cap dominates and this floor is inert.
        .config("spark.sql.files.minPartitionNum", str(4 * sp))
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/mineru_spark_warehouse"))
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        # local mode = single JVM: netty direct memory sized for 32
        # concurrent Arrow streams of 10-100 KB payload rows.  Heap
        # default is deliberately MODEST (12g): every query path here
        # streams or spills (MEMORY_AND_DISK persists, spillable
        # agg/sort), and a large lazily-committed heap is actively
        # harmful on virtualized hosts — guest page provisioning is
        # slow/erratic, so a 48g -Xmx meant the first minutes of every
        # session stalled in kernel page-zeroing as the heap grew
        # (measured on this box: identical scan 5.3s cold vs 0.5s with a
        # 12g heap; JVM-side stages converged only after ~6 full-corpus
        # reps).  Production/VM-tuned deployments override via
        # SPARK_GRAFT_DRIVER_MEM.
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.driver.extraJavaOptions",
                "-XX:MaxDirectMemorySize=16g")
        .getOrCreate()
    )
    _warm_session(spark)
    return spark


_WARMED: set[str] = set()


def _noop_pdf_identity(batches):
    for pdf in batches:
        yield pdf


def _warm_session(spark: SparkSession) -> None:
    """One-time session warm-up over synthetic rows (spark.range only — no
    input data is touched, nothing is cached): compiles and JITs the fixed
    machinery every first query otherwise pays inside its own wall-time —
    whole-stage codegen + the janino compiler, the hash-aggregate and
    broadcast-join paths, the noop/commit protocol, the parquet
    writer+reader stack, and the Python worker pool for pandas/Arrow
    stages.  Measured on this box: the first query of a fresh session runs
    4-6x its warm time (q01: 5.2s cold vs 0.8s warm) purely on this
    machinery; at any real deployment the cost amortizes over the job, so
    paying it at session build is the honest place.  Guarded per
    application id; failures are non-fatal."""
    try:
        key = spark.sparkContext.applicationId
    except Exception:
        return
    if key in _WARMED:
        return
    _WARMED.add(key)
    try:
        import shutil
        import tempfile

        from pyspark.sql import Window as W

        sc = spark.sparkContext
        sc.setJobDescription("session warm-up (codegen/committer/workers)")
        n = max(2, sc.defaultParallelism)
        rng = spark.range(0, 64 * n, numPartitions=n)
        base = rng.select(
            F.col("id"),
            (F.col("id") % 7).cast("decimal(18,2)").alias("d"),
            F.md5(F.col("id").cast("string")).alias("h"),
            F.to_timestamp(F.lit("1999-01-01 00:00:00")).alias("ts"))
        # hash aggregate + decimal arithmetic + timestamp filter + noop sink
        (base.filter(F.col("ts") <= F.lit("1999-09-02").cast("timestamp"))
         .groupBy((F.col("id") % 3).alias("g"))
         .agg(F.sum("d").cast("double").alias("s"),
              F.count("*").cast("long").alias("c"))
         .write.format("noop").mode("overwrite").save())
        # broadcast hash join + window function
        small = spark.range(0, 3).select(F.col("id").alias("k"),
                                         F.lit("x").alias("v"))
        (base.join(F.broadcast(small), (F.col("id") % 3) == F.col("k"))
         .select("id", "v",
                 F.row_number().over(
                     W.partitionBy("k").orderBy("id")).alias("rn"))
         .write.format("noop").mode("overwrite").save())
        # Python worker pool (one worker per core) + Arrow boundary
        (rng.mapInPandas(_noop_pdf_identity, schema="id long")
         .write.format("noop").mode("overwrite").save())
        # parquet writer + reader init (tmp file, removed immediately)
        tmp = tempfile.mkdtemp(prefix="spark_warm_")
        try:
            p = os.path.join(tmp, "w.parquet")
            spark.range(0, 8).write.mode("overwrite").parquet(p)
            spark.read.parquet(p).collect()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception:
        pass  # warm-up is best-effort; never block session creation
    finally:
        try:
            spark.sparkContext.setJobDescription(None)
        except Exception:
            pass


def spread_scan(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the session's cores when the source
    cannot: a parquet row group is unsplittable, so a single-row-group
    file scans as ONE task and everything Catalyst fuses into the scan
    stage — per-word md5 transforms, shingle builds, Python map stages —
    runs single-core no matter how many cores the session has (measured:
    x_docwrap_roundtrip 2.5s single-task vs 0.9s spread at local[32]).

    Scale-adaptive by construction (guide §2): the round-robin
    repartition is inserted only when the scan's task count is below the
    session parallelism, i.e. exactly the small-input regime where the
    extra exchange is trivially cheap (these tables are MBs).  At
    production scale a table carries >= cores of row groups, the
    condition is false, and the plan is untouched — no constant tuned to
    local[32] anywhere.  Call it AFTER projecting the needed columns so
    the exchange carries only those (guide §2.3) and ReadSchema pruning
    is preserved.

    The small-input test is BYTES-based (<= 8 MB x parallelism, i.e.
    the regime where the round-robin exchange costs milliseconds):
    split/partition counts lie here — byte-range splits of a
    single-row-group file report high parallelism while every row still
    lands in the one task that owns the row-group midpoint."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        import os as _os
        files = df.inputFiles()
        if files:
            total = sum(_os.path.getsize(f.replace("file:", "", 1))
                        for f in files if f.startswith("file:"))
            if 0 < total <= 8 * (1 << 20) * target:
                return df.repartition(target)
            return df
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
    except Exception:
        pass
    return df


# ---------------------------------------------------------------------------
# Source: shard-local deterministic synthesis
# ---------------------------------------------------------------------------

def synthesize_transcripts(spark: SparkSession, n_convs: int,
                           partitions: int | None = None) -> DataFrame:
    """Distributed corpus synthesis: each task generates only its conv-id
    range via the (conv_id, turn_idx)-seeded PRNG — no data ever leaves the
    executor, so this scales to any corpus size (the 10^12-turn analog is
    an Iceberg scan; here the scan is replaced by deterministic
    generation, TESTDATA-style seed discipline).

    Default partitioning is 4x the session parallelism, not 1x: the
    corpus this writes is re-SCANNED by extraction, and a parquet file's
    single row group is one unsplittable task — 1x parallelism means one
    task wave whose Zipf conv-length tail strands cores (guide §2.6
    stragglers).  4x gives four waves of smaller tasks: measured
    extract_finalized over the sf0.1 corpus 15.1s -> 10.7s at local[32].
    Content is unchanged (rows are (conv_id, turn_idx)-seeded)."""
    parts = partitions or 4 * spark.sparkContext.defaultParallelism
    _tune_session_for_payloads(spark)

    def gen(batches):
        for pdf in batches:
            rows = []
            for ci in pdf["id"].astype(int):
                for ti in range(conv_length(ci)):
                    rows.append(gen_turn(ci, ti))
            out = pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
            out["turn_idx"] = out["turn_idx"].astype("int32")
            out["ts"] = pd.to_datetime(out["ts"], utc=True).dt.tz_localize(None)
            yield out

    return (spark.range(0, n_convs, numPartitions=parts)
            .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA))


# ---------------------------------------------------------------------------
# Classify (projection + filter; SURVEY §2.2)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def classify_udf(text: pd.Series, tool: pd.Series) -> pd.Series:
    # vectorized pandas .str cascade — no per-row Python in the router
    return classify_series(text, tool)


def classify_routes(df: DataFrame) -> DataFrame:
    return df.withColumn("parse_route", classify_udf(F.col("text"), F.col("tool")))


# ---------------------------------------------------------------------------
# Extraction (mapInPandas; per-turn kernels)
# ---------------------------------------------------------------------------

def _extract_batch(batches):
    for pdf in batches:
        out = {k: [] for k in ("conv_id", "turn_idx", "ts", "route", "md",
                               "md_nlp", "content_list", "content_list_v2",
                               "middle", "spans", *_METRIC_COLS)}
        for conv_id, turn_idx, ts, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["ts"],
                pdf["text"], pdf["tool"]):
            r = extract_turn(text, tool)
            out["conv_id"].append(conv_id)
            out["turn_idx"].append(turn_idx)
            out["ts"].append(ts)
            out["route"].append(r["route"])
            out["md"].append(r["md"])
            out["md_nlp"].append(r["md_nlp"])
            out["content_list"].append(r["content_list"])
            out["content_list_v2"].append(r["content_list_v2"])
            out["middle"].append(r["middle"])
            out["spans"].append([
                {"page_idx": s["page_idx"],
                 "bbox": [float(v) for v in s["bbox"]],
                 "type": s["type"], "content": s["content"]}
                for s in r["spans"]])
            for k in _METRIC_COLS:
                out[k].append(int(r["metrics"][k]))
        res = pd.DataFrame(out)
        res["turn_idx"] = res["turn_idx"].astype("int32")
        for k in _METRIC_COLS:
            res[k] = res[k].astype("int32")
        yield res


def _tune_session_for_payloads(spark: SparkSession) -> None:
    """Runtime-settable knobs that MUST hold when the extraction map runs,
    even inside a session we didn't build (the round driver's): small
    Arrow batches bound worker memory for 10-100 KB payload rows (default
    10000-row batches are ~1 GB), and UTC keeps ts columns stable."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "128")
    except Exception:
        pass  # static in some sessions; best-effort


def extract(df: DataFrame, salt_partitions: int | None = None) -> DataFrame:
    """Salted repartition + mapInPandas extraction.

    The unit of work is one TURN, so hash-repartitioning on
    (conv_id, turn_idx) spreads the turns of one long conversation across
    all tasks — the Zipf conv-length tail cannot create a straggler
    partition.  This is the reference's cross-document batch packing
    (pipeline_analyze.py:232-262) expressed as a partitioner."""
    _tune_session_for_payloads(df.sparkSession)
    narrow = df.select("conv_id", "turn_idx", "ts", "text", "tool")
    if salt_partitions:
        narrow = narrow.repartition(salt_partitions, "conv_id", "turn_idx")
    return narrow.mapInPandas(_extract_batch, schema=EXTRACT_SCHEMA)


# ---------------------------------------------------------------------------
# Conversation-level finalize (D2: cross-turn table merge)
# ---------------------------------------------------------------------------

def _candidate_run_keys(df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, _run) keys of every turn inside a maximal run
    of ≥2 ADJACENT office turns, detected from the RAW transcripts —
    extraction output is never touched.

    The cross-turn table merge only ever acts within such runs
    (finalize_conv resets its anchor on any non-office or non-adjacent
    turn), so the RUN — not the conversation — is the finalize unit:
    grouping at run granularity shuffles only the office-run rows (~5-8%
    of the corpus) instead of every turn of a candidate conversation
    (~20%).

    The office route is exactly "prefix-lstrip starts with <table"
    (kernels/classify.py cascade: the JSON kinds start with '{', html
    with other tags — no overlap), so the sniff stays entirely JVM-side:
    whole-stage-codegen'd scan + filter, zero Python.  The sniff regex
    (classify.OFFICE_SNIFF_RE) spells out Python's lstrip() whitespace
    class so the JVM predicate agrees with classify_payload row-for-row
    — F.ltrim strips only spaces and a fixed substring window can't eat
    unbounded leading whitespace, both of which would silently break an
    office run (round-3 verdict finding #1).  Runs come from the
    gaps-and-islands trick (turn_idx - row_number is constant within an
    adjacent run); `extract_turn` derives its route from the same
    classifier, so the key set is exact up to payloads that later degrade
    to route='error' — a superset for which the grouped finalize is a
    no-op (the same per-turn guard the merge itself applies)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    office = (df.filter(F.col("text").rlike(OFFICE_SNIFF_RE))
              .select("conv_id", "turn_idx")
              .withColumn("_run", F.col("turn_idx")
                          - F.row_number().over(w)))
    wr = W.partitionBy("conv_id", "_run")
    return (office.withColumn("_n", F.count("*").over(wr))
            .filter(F.col("_n") >= 2)
            .select("conv_id", "turn_idx", "_run"))


def _extract_finalize_conv(pdf: pd.DataFrame) -> pd.DataFrame:
    """One office RUN (adjacent office turns of one conversation), raw
    rows in: extract every turn AND apply the cross-turn finalize in the
    same Python stage.  Fusing the two steps avoids a second Arrow
    round-trip of the fat extraction output (the grouped-finalize-over-
    extracted variant paid ~1.3 ms/row just in re-conversion)."""
    from .kernels.oracle import finalize_conv

    pdf = pdf.sort_values("turn_idx").reset_index(drop=True)
    outs = []
    for ti, text, tool in zip(pdf["turn_idx"], pdf["text"], pdf["tool"]):
        r = extract_turn(text, tool)
        r["turn_idx"] = int(ti)
        outs.append(r)
    finalize_conv(outs)
    res = pd.DataFrame({
        "conv_id": pdf["conv_id"],
        "turn_idx": pdf["turn_idx"].astype("int32"),
        "ts": pdf["ts"],
        "route": [o["route"] for o in outs],
        "md": [o["md"] for o in outs],
        "md_nlp": [o["md_nlp"] for o in outs],
        "content_list": [o["content_list"] for o in outs],
        "content_list_v2": [o["content_list_v2"] for o in outs],
        "middle": [o["middle"] for o in outs],
        "spans": [[{"page_idx": s["page_idx"],
                    "bbox": [float(v) for v in s["bbox"]],
                    "type": s["type"], "content": s["content"]}
                   for s in o["spans"]] for o in outs],
        **{k: pd.Series([int(o["metrics"][k]) for o in outs],
                        dtype="int32") for k in _METRIC_COLS},
    })
    return res


def extract_finalized(df: DataFrame,
                      salt_partitions: int | None = None) -> DataFrame:
    """The shipped extraction shape: ONE kernel pass per row, finalize
    included.  Office-run keys (cross-turn table-merge eligible turns)
    are detected from the raw input (_candidate_run_keys, a JVM-only
    sniff + keys-only windows), the input splits on that broadcast key
    set, and each side runs the extraction kernel exactly once:

      rest (~92-95%, everything outside office runs): salted
          shuffle-free mapInPandas — identical to extract();
      office runs: raw rows group by (conv_id, run) and extract+finalize
          run in ONE fused Python stage (_extract_finalize_conv).

    This replaced the round-2/3 persist-and-branch over the extraction
    OUTPUT (legacy `finalize_convs`, deleted in r5 per the round-4
    verdict — duplicate cross-turn semantics were a drift risk): output
    rows are ~5× the input payload, so caching + three cache scans of
    them cost more than two extra input scans, and the fused candidate
    stage skips the second Arrow round-trip entirely.  At 10^12 turns the win is bigger — no executor storage
    holds the extraction output (bar the tiny persisted key set), and the
    only shuffle moves the office-run rows themselves."""
    # tiny key frame (3 narrow columns, office-run rows only): persist so
    # the sniff+window scan runs once, not once per broadcast build.
    # Tracked (cache.track): re-invocation unpersists the previous run's
    # keys, and action owners call cache.release() when done — a
    # long-lived session (bench reps, streaming micro-batches) never
    # accumulates stale key frames (r4 directive #6).
    keys = cache.track("extract_keys", _candidate_run_keys(df).persist())
    # run rows are office rows by construction, so the sniff predicate
    # pre-filters the probe side before the join hash (same JVM-side
    # expression the key detection used)
    src_cand = df.filter(F.col("text").rlike(OFFICE_SNIFF_RE)) \
        .select("conv_id", "turn_idx", "ts", "text", "tool") \
        .join(F.broadcast(keys), ["conv_id", "turn_idx"])
    src_rest = df.join(
        F.broadcast(keys.select("conv_id", "turn_idx")),
        ["conv_id", "turn_idx"], "left_anti")
    _tune_session_for_payloads(df.sparkSession)
    rest = extract(src_rest, salt_partitions=salt_partitions)
    # EXPLICIT repartition on the group keys: the run rows are small in
    # BYTES but heavy in Python time (extraction kernel per row), so AQE's
    # size-based coalescing would fold the post-shuffle stage down to ~1
    # partition and serialize it (measured: constant ~19 s at any core
    # count).  A user repartition is never coalesced, and groupBy on the
    # same keys reuses the partitioning — no second exchange.
    n_parts = salt_partitions or df.sparkSession.sparkContext.defaultParallelism
    cand = (src_cand.repartition(n_parts, "conv_id", "_run")
            .groupBy("conv_id", "_run")
            .applyInPandas(_extract_finalize_conv, schema=EXTRACT_SCHEMA))
    return rest.unionByName(cand)


# ---------------------------------------------------------------------------
# Sink + resume + metrics (SURVEY §7 step 7)
# ---------------------------------------------------------------------------

def run_job(spark: SparkSession, transcripts: DataFrame, out_dir: str,
            resume: bool = True, salt_partitions: int | None = None,
            partition_by_day: bool = True) -> dict:
    """Idempotent extraction job with lineage-based resume.

    Sink layout (parquet stand-in for the Iceberg table — Iceberg jars are
    not on the sandbox classpath; the layout keeps Iceberg-style
    snapshot/lineage semantics):

      out_dir/extracted/   extraction output, appended per run,
                           hive-partitioned by ds=days(ts) (the Iceberg
                           `days(ts)` transform; FIXTURES.md §1) so time
                           predicates prune partitions at read; every row
                           carries this run's run_id (the Iceberg
                           snapshot-id analog)
      out_dir/metrics/     appended per run: one row per task partition,
                           keyed by run_id

    Cost discipline (the 10^12-turn budget): exactly ONE extraction pass
    over the new data (the write), plus one narrow semi-join count for the
    resume report, plus a run_id-filtered read-back for metrics — parquet
    row-group stats (run_id is constant per file) skip all previous runs'
    files, so the metric scan touches only this run's output.
    """
    import uuid

    extracted_path = os.path.join(out_dir, "extracted")
    metrics_path = os.path.join(out_dir, "metrics")
    run_id = uuid.uuid4().hex

    todo = transcripts
    already = 0
    if resume and _path_has_data(spark, extracted_path):
        lineage = spark.read.parquet(extracted_path) \
            .select("conv_id", "turn_idx")
        # one narrow count (keys only) instead of before/after full counts
        already = transcripts.select("conv_id", "turn_idx") \
            .join(lineage, ["conv_id", "turn_idx"], "left_semi").count()
        todo = todo.join(lineage, ["conv_id", "turn_idx"], "left_anti")

    result = extract_finalized(todo, salt_partitions=salt_partitions)
    result = result.withColumn("part_id", F.spark_partition_id()) \
                   .withColumn("run_id", F.lit(run_id))
    writer = result.write.mode("append")
    if partition_by_day:
        result = result.withColumn(
            "ds", F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd"))
        writer = result.write.mode("append").partitionBy("ds")
    writer.parquet(extracted_path)

    # metrics over THIS run only: run_id is constant per written file, so
    # min/max row-group stats prune every older file from the scan
    out = spark.read.parquet(extracted_path).filter(F.col("run_id") == run_id)
    per_part = (out.groupBy("part_id")
                .agg(F.count("*").alias("turns"),
                     F.sum("blocks_classified").alias("blocks_classified"),
                     F.sum("boilerplate_dropped").alias("boilerplate_dropped"),
                     F.sum("ocr_fallback").alias("ocr_fallback"))
                .withColumn("run_id", F.lit(run_id))).collect()
    if per_part:
        spark.createDataFrame(per_part).write.mode("append") \
            .parquet(metrics_path)

    # all actions done — drop the tags THIS job owns (r4 ADVICE: the
    # no-arg form would also evict unrelated live caches, e.g. a
    # concurrent query's jaccard_shingles, a silent perf regression;
    # no-arg release is reserved for session teardown)
    cache.release("extract_keys")

    # globals derive from the (tiny) per-partition rows — no second scan
    return {"turns": sum(r["turns"] for r in per_part),
            "blocks": sum(r["blocks_classified"] for r in per_part),
            "ocr_fallback": sum(r["ocr_fallback"] for r in per_part),
            "skipped_resume": already, "run_id": run_id}


def list_runs(spark: SparkSession, out_dir: str) -> list[dict]:
    """Snapshot inventory (the Iceberg snapshot-list analog): one row per
    run_id from the per-run metrics table, with its turn totals."""
    metrics = spark.read.parquet(os.path.join(out_dir, "metrics"))
    rows = (metrics.groupBy("run_id")
            .agg(F.sum("turns").alias("turns"),
                 F.sum("blocks_classified").alias("blocks"),
                 F.count("*").alias("n_partitions"))
            .collect())
    return [r.asDict() for r in rows]


def read_run(spark: SparkSession, out_dir: str, run_id: str) -> DataFrame:
    """Read ONE run's output (the Iceberg snapshot-read / time-travel
    analog): run_id is constant per written file, so parquet row-group
    stats prune every other run's files from the scan."""
    return (spark.read.parquet(os.path.join(out_dir, "extracted"))
            .filter(F.col("run_id") == run_id))


def _path_has_data(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).limit(1).collect()
        return True
    except Exception:
        return False


def write_bucketed_sink(spark: SparkSession, extracted: DataFrame,
                        table: str = "extracted_turns",
                        n_buckets: int = 16) -> None:
    """Bucketed-table sink variant: bucketBy(conv_id) + sortBy(turn_idx)
    (FIXTURES.md §1 `bucket(conv_id)`).  Later equi-joins on conv_id —
    the lineage anti-join, the conv-level finalize — co-locate without a
    shuffle when both sides share the bucketing."""
    (extracted.write.mode("overwrite")
     .bucketBy(n_buckets, "conv_id")
     .sortBy("turn_idx")
     .format("parquet")
     .saveAsTable(table))
