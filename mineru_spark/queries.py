"""Relational query pack (SURVEY.md §2.9) + corpus text/embedding ops.

Each query exists twice: a DataFrame-API implementation here and a DuckDB
ANSI-SQL oracle in ``ORACLES`` (surfaced through __spark_entry__.py).  The
driver runs both at sf=0.01 and compares row count + schema + value hash,
so conventions are strict:

- every computed column is aliased identically on both sides;
- money sums go through DECIMAL (exact) then CAST AS DOUBLE, so the two
  engines cannot diverge by float summation order;
- timestamps are surfaced as epoch microseconds (unix_micros /
  epoch_us) — never as engine-formatted strings;
- LIMIT queries carry a total tie-break order.

The queries map 1:1 to the operator checklist extracted from the
reference (SURVEY.md §2.9): interval-join analog (E7), sessionization
(B3), as-of join (B10), first-match window dedup (E12), partial+final
aggregation, top-k, set ops, string/array scalar functions, plus the
training-data-pipeline ops (dedup family, similarity search, quality
scoring) over the documents/embeddings tables.
"""

from __future__ import annotations

from . import cache
from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver may run these in its own session: pin UTC so NTZ→TZ casts
    # (epoch-micros surfacing, second-granularity session gaps) agree with
    # DuckDB's naive-as-UTC semantics regardless of host timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # small-SF correctness runs shouldn't pay 200 default shuffle
    # partitions; AQE coalesces anyway, this just trims scheduling noise.
    # Parameterised to the session's parallelism (r6) — a constant 32 was
    # only right for one box size.
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(spark.sparkContext.defaultParallelism))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _us(col):
    """Epoch microseconds from a (possibly NTZ) timestamp column; session
    timezone is pinned UTC so NTZ→TZ cast is the identity instant."""
    return F.unix_micros(F.col(col).cast("timestamp") if isinstance(col, str)
                         else col.cast("timestamp"))


_STOPWORDS = ("the", "a", "of", "and", "to")
_STOP_SQL = "('the','a','of','and','to')"


# ---------------------------------------------------------------------------
# TPC-H-style relational operators
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir):
    """Partial+final hash aggregation (SURVEY §2.9 aggregations)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                   - dec("l_discount"))).cast("decimal(28,4)"))
            .cast("double").alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q03_top_orders(spark, sf_dir):
    """Join + agg + deterministic top-k (SURVEY §2.9 sorts/top-k)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)")
              - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             _us(F.first("o_orderdate")).alias("o_orderdate_us"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q05_nation_revenue(spark, sf_dir):
    """Multi-way join through the dimension chain; small dims broadcast.

    r6: the fact side is projected to the 3 needed columns and spread
    (single-row-group files scan as one task, so the join probes and the
    decimal partial agg all ran single-core; interleaved A/B at sf0.1:
    1.37s -> 1.16s best, much better tail under load)."""
    from .pipeline import spread_scan
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = spread_scan(_t(spark, sf_dir, "lineitem")
                     .select("l_orderkey", "l_extendedprice", "l_discount"))
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)")
              - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count("*").cast("long").alias("n_items"))
    )


def q_broadcast_part_brand(spark, sf_dir):
    """Broadcast dimension join (label-map analog, SURVEY §2.9 joins/B1)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("double").alias("sum_qty"),
             F.count("*").cast("long").alias("n_items"))
    )


def q_window_top_order_per_cust(spark, sf_dir):
    """First-match-wins window dedup — the Spark analog of the reference's
    span→block first-block-wins consumption (E12, span_pre_proc.py:234-308)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                           F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey",
                F.col("o_totalprice").cast("double").alias("top_price"))
    )


def q_stable_turn_order(spark, sf_dir):
    """Stable (conv, turn) ordering analog over orders: dense per-customer
    sequence numbers (the north rule's stable turn ordering as a window)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"),
                                           F.asc("o_orderkey"))
    return o.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).cast("long").alias("seq"),
        _us("o_orderdate").alias("o_orderdate_us"),
    )


# ---------------------------------------------------------------------------
# Events: sessionization, as-of join, interval join, windows
# ---------------------------------------------------------------------------

def q_sessionize_events(spark, sf_dir):
    """Sessionization = lag + gap flag + running sum (B3 line-merge analog,
    span_block_fix.py:52-88)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    flagged = ev.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))
    per_sess = sess.groupBy("user_id", "sid").agg(F.count("*").alias("n"))
    return per_sess.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.max("n").cast("long").alias("max_session_events"),
    )


def q_asof_prior_view(spark, sf_dir):
    """As-of/nearest join: for each click, the most recent prior view by the
    same user (caption→parent nearest-match analog, B10,
    visual_magic_model_utils.py:535-621)."""
    ev = _t(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    out = ev.withColumn("prior_view", F.last(view_ts, ignorenulls=True).over(w))
    return (out.filter(F.col("event_type") == "click")
            .select("event_id", "user_id",
                    _us("ts").alias("ts_us"),
                    _us(F.col("prior_view")).alias("prior_view_us")))


def q_value_band_join(spark, sf_dir):
    """Interval/range join via broadcast band dim — the relational analog of
    char-in-span containment (E7, span_pre_proc.py:311-364)."""
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(i, float(i * 50), float((i + 1) * 50), f"band_{i}") for i in range(8)],
        "band_id int, lo double, hi double, band string")
    return (
        ev.join(F.broadcast(bands),
                (ev.value >= bands.lo) & (ev.value < bands.hi))
        .groupBy("band")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)"))
             .cast("double").alias("sum_value"))
    )


def q_daily_events(spark, sf_dir):
    """Partition-bucket aggregation over time (date_trunc, SURVEY §2.9)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                   .alias("day"))
        .agg(F.count("*").cast("long").alias("n_events"),
             F.countDistinct("user_id").cast("long").alias("n_users"),
             F.sum(F.col("value").cast("decimal(18,6)"))
             .cast("double").alias("sum_value"))
    )


def q_events_pivot(spark, sf_dir):
    """Manual pivot (conditional aggregation) per user."""
    ev = _t(spark, sf_dir, "events")
    cnt = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)) \
        .cast("long").alias(f"n_{t}")
    return ev.groupBy("user_id").agg(cnt("view"), cnt("click"),
                                     cnt("purchase"), cnt("error"),
                                     cnt("signup"))


def q_topk_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("user_id")).limit(5))


# ---------------------------------------------------------------------------
# Set ops / rollup / percentiles / distinct
# ---------------------------------------------------------------------------

def q_set_ops(spark, sf_dir):
    """unionByName + exceptAll (preproc ∪ discarded / regression-diff
    analogs, SURVEY §2.9 set ops)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT")
    c = o.filter(F.col("o_custkey") % 10 == 0)
    return (a.unionByName(b).exceptAll(c)
            .groupBy("o_orderstatus")
            .agg(F.count("*").cast("long").alias("n")))


def q_rollup_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_price")))


def q_percentile_price(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4)
                 .alias("p50"),
                 F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4)
                 .alias("p90")))


def q_distinct_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").cast("long").alias("n_parts"),
                 F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
                 F.count("*").cast("long").alias("n_rows")))


# ---------------------------------------------------------------------------
# Documents: text analysis + dedup family
# ---------------------------------------------------------------------------

def q_doc_tokens(spark, sf_dir):
    """Token counting: whitespace + regex tokenizer (training-data op)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0))
        .cast("long").alias("re_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def q_doc_quality(spark, sf_dir):
    """Quality scoring: stopword ratio + mean word length (training-data
    op; boilerplate-likeness heuristics in the same family as the HTML
    link-density rule)."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), " +")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda x: x.isin(*_STOPWORDS)))
    return d.select(
        "doc_id",
        F.round(n_stop.cast("double") / n_words.cast("double"), 6)
        .alias("stop_ratio"),
        F.round((F.length(F.regexp_replace("text", " ", "")).cast("double"))
                / n_words.cast("double"), 6).alias("mean_word_len"),
        n_words.cast("long").alias("n_words"),
    )


# language-ID profiles: marker stopwords per language (n-gram/stopword
# heuristic — the training-data op; scripts checked first)
# ONE language-ID decision shared by this oracle-checked query, the
# markdown emitter's M2 paragraph join (emit.merge_lines), and their
# DuckDB oracle — constants live in kernels/langid.py (r4 directive #8)
from .kernels.langid import LANG_PROFILES as _LANG_PROFILES  # noqa: E402
from .kernels.langid import SCRIPT_RULES as _SCRIPT_RULES  # noqa: E402


def q_doc_langid(spark, sf_dir):
    """Language identification (training-data op): script-class character
    ratios decide ko/ja/zh/ru outright (cascade order — kana outranks the
    unified-CJK test because Japanese mixes both); Latin text votes by
    language-marker stopword hits with a fixed priority tie-break.
    Deterministic and SQL-expressible, so DuckDB verifies the full
    decision function — the SAME cascade emit.merge_lines runs per
    paragraph for the M2 CJK join (kernels/langid.lang_of), so the md
    spacing rule is itself oracle-checked here.  (The documents table's
    `lang` METADATA is not derivable from its synthetic English-vocab
    text — the operator honestly predicts from the text itself.)"""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), " +")
    total = F.greatest(F.length(F.regexp_replace("text", " ", "")),
                       F.lit(1)).cast("double")
    ratios = {lang: F.length(F.regexp_replace(
        "text", f"[^{cls}]", "")).cast("double") / total
        for lang, cls, _thr in _SCRIPT_RULES}

    def _hits(ws):
        # single-arg lambda (a default arg would make Spark treat it as an
        # (element, index) higher-order function)
        return F.size(F.filter(words, lambda w: w.isin(*ws)))

    hits = {lang: _hits(ws) for lang, ws in _LANG_PROFILES}
    best = None
    for lang, _cls, thr in _SCRIPT_RULES:
        cond = ratios[lang] > thr
        best = F.when(cond, F.lit(lang)) if best is None \
            else best.when(cond, F.lit(lang))
    cond = best
    for lang, _ in _LANG_PROFILES:
        c = hits[lang]
        others = [hits[o] for o, _ in _LANG_PROFILES if o != lang]
        expr = (c > 0)
        for o in others:
            expr = expr & (c >= o)
        cond = cond.when(expr, F.lit(lang))
    pred = cond.otherwise(F.lit("und"))
    return d.select("doc_id", pred.alias("pred_lang"),
                    F.round(ratios["zh"], 6).alias("cjk_ratio"),
                    *[hits[lang].cast("long").alias(f"hits_{lang}")
                      for lang, _ in _LANG_PROFILES])


def q_doc_quality_signals(spark, sf_dir):
    """Gopher-style quality signals (training-data op): punctuation and
    digit character ratios, max word length, and the duplicate word-bigram
    fraction (repetition signal: 1 − distinct/total bigrams)."""
    # materialize the word split once — inlining it into the bigram
    # transform would re-split per element (the O(words²) trap)
    base = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split(F.trim("text"), " +").alias("w"))
    nchars = F.greatest(F.length("text"), F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(
        "text", r"[^.,;:!?'\"()\[\]{}-]", "")).cast("double") / nchars
    digit = F.length(F.regexp_replace(
        "text", "[^0-9]", "")).cast("double") / nchars
    bigrams = F.expr(
        "CASE WHEN size(w) < 2 THEN array() "
        "ELSE transform(sequence(0, size(w) - 2), "
        "i -> concat_ws(' ', w[i], w[i+1])) END")
    n_bi = F.greatest(F.size(bigrams), F.lit(1)).cast("double")
    dup_bi = F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") \
        / n_bi
    return base.select(
        "doc_id",
        F.round(punct, 6).alias("punct_ratio"),
        F.round(digit, 6).alias("digit_ratio"),
        F.array_max(F.transform("w", F.length)).cast("long")
        .alias("max_word_len"),
        F.round(dup_bi, 6).alias("dup_bigram_ratio"),
    )


def q_exact_dedup(spark, sf_dir):
    """Exact dedup by content hash: keeper = min doc_id per md5 group."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy(F.md5(F.col("text")).alias("content_hash"))
            .agg(F.min("doc_id").cast("long").alias("keeper"),
                 F.count("*").cast("long").alias("n_dups")))


_MINHASH_SEEDS = (0, 1, 2, 3)


def _minhash_col(seed: int):
    words = F.split(F.trim("text"), " +")
    return F.array_min(F.transform(
        words, lambda w: F.md5(F.concat(w, F.lit(f"#{seed}"))))) \
        .alias(f"mh{seed}")


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (word shingles, 4 seeds) — both engines hash with
    md5 so signatures are bit-identical (training-data near-dup op)."""
    from .pipeline import spread_scan
    d = spread_scan(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return d.select("doc_id", *[_minhash_col(s) for s in _MINHASH_SEEDS])


def q_minhash_lsh_buckets(spark, sf_dir):
    """LSH banding: band key = md5(mh0||mh1); reports bucket sizes and the
    implied candidate-pair count (shingle→minhash→band→bucket join)."""
    sig = q_minhash_signatures(spark, sf_dir)
    band = F.md5(F.concat("mh0", "mh1")).alias("band_key")
    return (sig.select("doc_id", band)
            .groupBy("band_key")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .withColumn("n_candidate_pairs",
                        (F.col("n_docs") * (F.col("n_docs") - 1) / 2)
                        .cast("long")))


JACCARD_MIN = 0.5
LSH_MAX_BUCKET = 100   # hot-bucket guard: buckets beyond this are skipped
                       # (exact dedup runs first in the pipeline, so a
                       # mega-bucket means byte-identical boilerplate)


def _shingles(d: DataFrame) -> DataFrame:
    """(doc_id, sh): distinct 3-word shingle set per document (n-gram unit
    for Jaccard).  The word split is materialized in its own projection so
    the transform lambda references the array — inlining the split into the
    lambda would re-split the text per shingle index (O(words²)).  Guarded
    for <3-word docs (Spark's sequence(0, -1) would descend)."""
    from .pipeline import spread_scan
    return (spread_scan(d.select("doc_id", "text"))
            .select("doc_id", F.split(F.trim("text"), " +").alias("w"))
            .select("doc_id", F.array_distinct(F.expr(
                "CASE WHEN size(w) < 3 THEN array() "
                "ELSE transform(sequence(0, size(w) - 3), "
                "i -> concat_ws(' ', w[i], w[i+1], w[i+2])) END"))
                .alias("sh")))


def q_jaccard_pairs(spark, sf_dir):
    """n-gram (3-word shingle) Jaccard near-dup over the FULL corpus,
    scale-safe: candidate pairs come from MinHash-LSH band buckets
    (2 bands × 2 rows, the same md5 minhash family as
    q_minhash_signatures), then the exact shingle Jaccard is verified per
    candidate with an array intersection — never an all-pairs join.

    Scale shape: the only join is a shuffle equi-join on (band_idx,
    band_key); bucket size is capped at LSH_MAX_BUCKET (hot buckets =
    byte-identical boilerplate, which exact dedup removes upstream), so
    candidate fan-out per key is bounded.  Recall is the standard LSH
    trade-off (2 bands of 2: P(candidate) = 1-(1-s²)² — 25/25 true pairs
    at sf0.01); more bands raise it without changing the plan shape.

    The shingle base is persisted: signatures, candidate generation and
    pair verification all read it (3 consumers — recomputing the shingle
    transform per consumer measured 1.6× slower).  At production scale
    this is a MATERIALIZED signature table bucketed by band key; the
    persist is the single-session analog.
    """
    from pyspark import StorageLevel

    d = _t(spark, sf_dir, "documents")
    sh = cache.track("jaccard_shingles",
                     _shingles(d).persist(StorageLevel.MEMORY_AND_DISK))
    sig = sh.select(
        "doc_id",
        *[F.array_min(F.transform(
            "sh", lambda s, k=k: F.md5(F.concat(s, F.lit(f"#{k}")))))
          .alias(f"mh{k}") for k in range(4)])
    bands = sig.select("doc_id", F.explode(F.array(
        F.struct(F.lit(0).alias("bi"),
                 F.md5(F.concat("mh0", "mh1")).alias("bk")),
        F.struct(F.lit(1).alias("bi"),
                 F.md5(F.concat("mh2", "mh3")).alias("bk")),
    )).alias("b")).select("doc_id", "b.bi", "b.bk")
    # candidate pairs per bucket via collect_list + in-bucket pair
    # expansion (r6): the old count-agg + join-back + self-join chain
    # spent its time in stage scheduling, not data (3 exchanges over
    # tiny frames).  The hot-bucket guard stays TWO-PHASE so a
    # boilerplate mega-bucket is never collected into one row: the count
    # agg finds the small keys (tiny frame, broadcast), bands
    # semi-reduce to those keys BEFORE the collect, and only then does
    # each (capped, <= LSH_MAX_BUCKET) bucket expand its pairs — ordered
    # via least/greatest = the old a.doc_id < b.doc_id, cross-bucket
    # DISTINCT unchanged, fan-out bounded by C(LSH_MAX_BUCKET, 2), never
    # a cartesian.
    small_keys = (bands.groupBy("bi", "bk")
                  .agg(F.count("*").alias("_n"))
                  .filter((F.col("_n") >= 2)
                          & (F.col("_n") <= LSH_MAX_BUCKET))
                  .select("bi", "bk"))
    pair_expr = F.expr(
        "flatten(transform(ds, (a, i) -> "
        "transform(slice(ds, i + 2, size(ds)), b -> "
        "struct(least(a, b) AS da, greatest(a, b) AS db))))")
    cand = (bands.join(F.broadcast(small_keys), ["bi", "bk"])
            .groupBy("bi", "bk")
            .agg(F.collect_list("doc_id").alias("ds"))
            .select(F.explode(pair_expr).alias("p"))
            .select("p.da", "p.db")
            .distinct())
    sets = sh.select("doc_id", "sh", F.size("sh").alias("nsh"))
    pairs = (cand
             .join(sets.select(F.col("doc_id").alias("da"),
                               F.col("sh").alias("sa"),
                               F.col("nsh").alias("na")), "da")
             .join(sets.select(F.col("doc_id").alias("db"),
                               F.col("sh").alias("sb"),
                               F.col("nsh").alias("nb")), "db"))
    inter = F.size(F.array_intersect("sa", "sb"))
    return (pairs.select(
                "da", "db",
                F.round(inter.cast("double")
                        / (F.col("na") + F.col("nb") - inter).cast("double"),
                        6).alias("jaccard"))
            .filter(F.col("jaccard") >= JACCARD_MIN))


def q_simhash(spark, sf_dir):
    """60-bit SimHash from word md5s — bit-majority over word hashes
    (dedup family).  Spark computes all 60 bit votes as aggregate
    expressions over ONE exploded word row per word (a single partial+
    final hash agg — the naive words × 60-bit-positions explode would
    multiply the shuffle by 60); DuckDB verifies with the explicit
    bit-position formulation, so the two different plans must agree."""
    from .pipeline import spread_scan
    d = spread_scan(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    words = (d.select("doc_id",
                      F.explode(F.split(F.trim("text"), " +")).alias("word"))
             .select("doc_id",
                     F.conv(F.substring(F.md5("word"), 1, 15), 16, 10)
                     .cast("long").alias("h")))
    votes = words.groupBy("doc_id").agg(
        *[F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
          .alias(f"v{b}") for b in range(60)])
    sim = None
    for b in range(60):
        term = F.when(F.col(f"v{b}") > 0,
                      F.lit(1 << b).cast("long")).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("long").alias("simhash"))


def q_doc_lang_stats(spark, sf_dir):
    """Language-wise corpus stats (string scalar fns + agg)."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.col("n_chars").cast("long")).cast("long")
                 .alias("total_chars"),
                 F.round(F.avg(F.length("text")), 4).alias("avg_len")))


# ---------------------------------------------------------------------------
# Embeddings: similarity search
# ---------------------------------------------------------------------------

def q_embed_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k against the vec_id=0 query vector, computed
    JVM-side with higher-order array functions (similarity-search baseline;
    the LSH-bucketed scale path is textops.embedding_lsh)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0) \
        .select(F.col("embedding").alias("qe"))
    dot = F.aggregate(
        F.zip_with("embedding", "qe",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(F.aggregate(
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    return (e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
            .select("vec_id", "label",
                    F.round(dot / (norm(F.col("embedding")) * norm(F.col("qe"))),
                            6).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(10))


def q_embed_label_centroid_norm(spark, sf_dir):
    """Per-label centroid L2 norm: array agg via explode with position —
    the partial+final agg pattern over vector columns."""
    e = _t(spark, sf_dir, "embeddings")
    pos = (e.select("label", F.posexplode("embedding").alias("pos", "v")))
    cent = (pos.groupBy("label", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("c")))
    return (cent.groupBy("label")
            .agg(F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6)
                 .alias("centroid_norm"),
                 (F.count("*")).cast("long").alias("dim")))


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q03_top_orders": """
        SELECT o_orderkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
               epoch_us(MIN(o_orderdate)) AS o_orderdate_us
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q05_nation_revenue": """
        SELECT r_name, n_name,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q_broadcast_part_brand": """
        SELECT p_brand,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "q_window_top_order_per_cust": """
        SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS top_price
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) t
        WHERE rn = 1
    """,
    "q_stable_turn_order": """
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC) AS BIGINT) AS seq,
               epoch_us(o_orderdate) AS o_orderdate_us
        FROM orders
    """,
    "q_sessionize_events": """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts)::BIGINT - epoch(lag(ts) OVER w)::BIGINT > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        ), per_sess AS (
          SELECT user_id, sid, COUNT(*) AS n FROM sess GROUP BY user_id, sid
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(MAX(n) AS BIGINT) AS max_session_events
        FROM per_sess GROUP BY user_id
    """,
    "q_asof_prior_view": """
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               epoch_us(prior_view) AS prior_view_us
        FROM (
          SELECT event_id, user_id, ts, event_type,
                 last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_view
          FROM events) t
        WHERE event_type = 'click'
    """,
    "q_value_band_join": """
        WITH bands AS (
          SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi,
                 'band_' || i AS band
          FROM generate_series(0, 7) t(i)
        )
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band
    """,
    "q_daily_events": """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1
    """,
    "q_events_pivot": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup
        FROM events GROUP BY user_id
    """,
    "q_topk_users": """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
        ORDER BY n DESC, user_id ASC LIMIT 5
    """,
    "q_set_ops": """
        WITH u AS (
          SELECT * FROM orders WHERE o_orderstatus = 'O'
          UNION ALL
          SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
        ), d AS (
          SELECT * FROM u
          EXCEPT ALL
          SELECT * FROM orders WHERE o_custkey % 10 = 0
        )
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
        FROM d GROUP BY o_orderstatus
    """,
    "q_rollup_orders": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "q_percentile_price": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_distinct_parts": """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_doc_tokens": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    """,
    "q_doc_quality": f"""
        SELECT doc_id,
               ROUND(CAST(len(list_filter(regexp_split_to_array(trim(text), ' +'),
                          x -> x IN {_STOP_SQL})) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), ' +')), 6) AS stop_ratio,
               ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), ' +')), 6) AS mean_word_len,
               CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_words
        FROM documents
    """,
    "q_exact_dedup": """
        SELECT md5(text) AS content_hash,
               CAST(MIN(doc_id) AS BIGINT) AS keeper,
               CAST(COUNT(*) AS BIGINT) AS n_dups
        FROM documents GROUP BY md5(text)
    """,
    "q_minhash_signatures": """
        SELECT doc_id,
               list_aggregate(list_transform(regexp_split_to_array(trim(text), ' +'),
                   w -> md5(w || '#0')), 'min') AS mh0,
               list_aggregate(list_transform(regexp_split_to_array(trim(text), ' +'),
                   w -> md5(w || '#1')), 'min') AS mh1,
               list_aggregate(list_transform(regexp_split_to_array(trim(text), ' +'),
                   w -> md5(w || '#2')), 'min') AS mh2,
               list_aggregate(list_transform(regexp_split_to_array(trim(text), ' +'),
                   w -> md5(w || '#3')), 'min') AS mh3
        FROM documents
    """,
    "q_minhash_lsh_buckets": """
        WITH sig AS (
          SELECT doc_id,
                 list_aggregate(list_transform(regexp_split_to_array(trim(text), ' +'),
                     w -> md5(w || '#0')), 'min') AS mh0,
                 list_aggregate(list_transform(regexp_split_to_array(trim(text), ' +'),
                     w -> md5(w || '#1')), 'min') AS mh1
          FROM documents
        )
        SELECT md5(mh0 || mh1) AS band_key,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS n_candidate_pairs
        FROM sig GROUP BY 1
    """,
    # DuckDB recomputes the identical minhash bands (same md5 family), the
    # identical bucket cap, and the exact shingle Jaccard per candidate.
    "q_jaccard_pairs": """
        WITH ws AS (
          SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS s
          FROM ws CROSS JOIN generate_series(0, 4095) t(i)
          WHERE i <= len(w) - 3
        ), sig AS (
          SELECT doc_id, MIN(md5(s || '#0')) AS mh0, MIN(md5(s || '#1')) AS mh1,
                 MIN(md5(s || '#2')) AS mh2, MIN(md5(s || '#3')) AS mh3
          FROM sh GROUP BY doc_id
        ), bands AS (
          SELECT doc_id, 0 AS bi, md5(mh0 || mh1) AS bk FROM sig
          UNION ALL
          SELECT doc_id, 1 AS bi, md5(mh2 || mh3) AS bk FROM sig
        ), sized AS (
          SELECT * FROM (
            SELECT doc_id, bi, bk, COUNT(*) OVER (PARTITION BY bi, bk) AS _n
            FROM bands) WHERE _n <= 100
        ), cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM sized a JOIN sized b
            ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
        ), nsh AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT da, db, COUNT(*) AS i
          FROM cand JOIN sh a ON a.doc_id = da
                    JOIN sh b ON b.doc_id = db AND a.s = b.s
          GROUP BY da, db
        )
        SELECT da, db,
               ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
        FROM inter JOIN nsh na ON da = na.doc_id JOIN nsh nb ON db = nb.doc_id
        WHERE ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) >= 0.5
    """,
    "q_simhash": """
        WITH words AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(unnest(regexp_split_to_array(trim(text), ' +'))), 1, 15)) AS BIGINT) AS h
          FROM documents
        ), bits AS (
          SELECT doc_id, h, b
          FROM words, generate_series(0, 59) t(b)
        ), votes AS (
          SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS v
          FROM bits GROUP BY doc_id, b
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    """,
    "q_doc_lang_stats": """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(AVG(length(text)), 4) AS avg_len
        FROM documents GROUP BY lang
    """,
    "q_embed_cosine_topk": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label,
               ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))),
                     6) AS cos
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))) DESC,
                 vec_id ASC
        LIMIT 10
    """,
    "q_embed_label_centroid_norm": """
        WITH pos AS (
          -- constant-bound series (dim=64); lateral list bounds are not
          -- supported in duckdb 1.0
          SELECT label, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS v
          FROM embeddings CROSS JOIN generate_series(0, 63) t(i)
          WHERE i < len(embedding)
        ), cent AS (
          SELECT label, pos, AVG(v) AS c FROM pos GROUP BY label, pos
        )
        SELECT label, ROUND(sqrt(SUM(c * c)), 6) AS centroid_norm,
               CAST(COUNT(*) AS BIGINT) AS dim
        FROM cent GROUP BY label
    """,
    "x_docwrap_roundtrip": """
        SELECT doc_id, text AS md FROM documents
    """,
}


RELATIONAL_QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_top_orders": q03_top_orders,
    "q05_nation_revenue": q05_nation_revenue,
    "q_broadcast_part_brand": q_broadcast_part_brand,
    "q_window_top_order_per_cust": q_window_top_order_per_cust,
    "q_stable_turn_order": q_stable_turn_order,
    "q_sessionize_events": q_sessionize_events,
    "q_asof_prior_view": q_asof_prior_view,
    "q_value_band_join": q_value_band_join,
    "q_daily_events": q_daily_events,
    "q_events_pivot": q_events_pivot,
    "q_topk_users": q_topk_users,
    "q_set_ops": q_set_ops,
    "q_rollup_orders": q_rollup_orders,
    "q_percentile_price": q_percentile_price,
    "q_distinct_parts": q_distinct_parts,
    "q_doc_tokens": q_doc_tokens,
    "q_doc_quality": q_doc_quality,
    "q_exact_dedup": q_exact_dedup,
    "q_minhash_signatures": q_minhash_signatures,
    "q_minhash_lsh_buckets": q_minhash_lsh_buckets,
    "q_jaccard_pairs": q_jaccard_pairs,
    "q_simhash": q_simhash,
    "q_doc_lang_stats": q_doc_lang_stats,
    "q_embed_cosine_topk": q_embed_cosine_topk,
    "q_embed_label_centroid_norm": q_embed_label_centroid_norm,
}


# ---------------------------------------------------------------------------
# Similarity-search + near-dup additions (cross-engine checkable)
# ---------------------------------------------------------------------------

def q_lsh_signature(spark, sf_dir):
    """SRP-LSH bucket signatures (simsearch scale path) — the 6 deterministic
    hyperplanes are literal arrays, so DuckDB recomputes the identical
    signature and the bucketing is verified across engines."""
    from .simsearch import signature_col

    e = _t(spark, sf_dir, "embeddings")
    return e.select("vec_id", signature_col().alias("lsh_sig"))


def _lsh_oracle_sql() -> str:
    from .simsearch import _PLANES

    terms = []
    for p, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(f"{v!r}" for v in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
            f"CAST({arr} AS DOUBLE[])) > 0 THEN {1 << p} ELSE 0 END)")
    return ("SELECT vec_id, CAST(" + " + ".join(terms)
            + " AS BIGINT) AS lsh_sig FROM embeddings")


SIMHASH_MAX_HAMMING = 8
# 10 chunks of 6 bits covering the 60-bit signature: hamming ≤ 8
# differing bits across 10 chunks → by pigeonhole at least TWO chunks
# are bit-identical.  That gives two exact join levels:
#   level 1: equi-join on a single (chunk_idx, chunk_value) — ≥1 clean
#     shared chunk guarantees recall;
#   level 2 (hot-bucket escalation): docs whose chunk lands in a bucket
#     bigger than SIMHASH_MAX_BUCKET re-join on 12-bit chunk-PAIR keys
#     (45 (i<j) pairs) — ≥2 clean shared chunks guarantee every pair
#     whose clean chunks are ALL hot still shares a clean pair key, so
#     recall stays 1 while per-key fan-out drops ~64×.
_SIMHASH_CHUNK_BITS = 6
_SIMHASH_N_CHUNKS = 10
# single-chunk buckets beyond this size escalate to pair keys instead of
# feeding the quadratic single-chunk self-join (r4 directive #5; the
# production knob — the analog of LSH_MAX_BUCKET, but exact: hot rows
# are rerouted, never dropped)
SIMHASH_MAX_BUCKET = 100


def _simhash_chunk_col(ci: int):
    return (F.shiftright(F.col("simhash"), ci * _SIMHASH_CHUNK_BITS)
            .bitwiseAND(F.lit((1 << _SIMHASH_CHUNK_BITS) - 1)))


def _simhash_pairs_on(keyed, ka: str, kb: str):
    """Self equi-join on (ka, kb) → verified hamming pairs."""
    return (keyed.alias("a").join(
                keyed.alias("b"),
                (F.col(f"a.{ka}") == F.col(f"b.{ka}"))
                & (F.col(f"a.{kb}") == F.col(f"b.{kb}"))
                & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"),
                    F.bit_count(F.col("a.simhash").bitwiseXOR(
                        F.col("b.simhash"))).cast("long").alias("hamming"))
            .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING))


def q_simhash_near_pairs(spark, sf_dir):
    """SimHash near-duplicate pairs (hamming ≤ 8) over the FULL corpus via
    two-level pigeonhole banding: explode each 60-bit signature into 10
    six-bit chunks and equi-join on (chunk_idx, chunk_value) for chunks
    in buckets ≤ SIMHASH_MAX_BUCKET; docs holding a chunk in a HOT bucket
    escalate to a join on 12-bit chunk-pair keys (45 per doc), whose
    buckets are ~64× smaller.  Exact at both levels — ≤8 errors over 10
    chunks leave ≥2 clean chunks, so a qualifying pair always shares
    either a cold clean chunk (level 1) or a clean chunk pair (level 2)
    — and the oracle cross-checks against DuckDB's brute-force all-pairs,
    so the recall proof is re-verified empirically every round.

    Scale shape: both joins are shuffle equi-joins; the single-chunk
    fan-out that grew with corpus size is now bounded by construction
    (hot buckets are rerouted to the finer key, never self-joined and
    never dropped).  On the ADVERSARIAL level-2 case — every doc sharing
    one 6-bit chunk, so the whole corpus escalates — the pair-key
    buckets are structurally ~64× smaller than the hot single-chunk
    bucket whenever the remaining chunks carry entropy, and
    test_simhash_adversarial_hot_chunk_bucket_bound pins both the bound
    and exact recall on a crafted such corpus (r5 directive #8).  A
    corpus hot at the 12-bit PAIR level too means near-identical
    signatures en masse — byte-duplicate-heavy data where exact dedup
    upstream is the real fix (a triple-key level CANNOT close it
    exactly: hamming ≤ 8 over 10 chunks guarantees only 2 clean chunks,
    and 3 are needed for a clean triple)."""
    return _simhash_near_pairs_from(q_simhash(spark, sf_dir))


def _simhash_near_pairs_from(sig):
    """Two-level pigeonhole pairing over an arbitrary (doc_id, simhash)
    frame — separated from the corpus read so adversarial-signature
    tests (crafted hot buckets) can drive the exact same plan
    (r5 directive #8).

    The signature frame is persisted (r6): it feeds THREE consumers
    (the chunk explode, the bucket sizing join, the hot-doc escalation)
    and without the persist the whole upstream signature computation —
    the 60-vote agg over exploded words — re-executes per consumer
    (measured ~3s -> ~1.2s warm at sf0.01).  Same rationale and shape as
    the jaccard shingle persist: at production scale this is the
    materialized signature table."""
    from pyspark import StorageLevel

    sig = cache.track("simhash_sigs",
                      sig.persist(StorageLevel.MEMORY_AND_DISK))
    chunks = [F.struct(F.lit(ci).alias("ci"),
                       _simhash_chunk_col(ci).alias("cv"))
              for ci in range(_SIMHASH_N_CHUNKS)]
    ch = (sig.select("doc_id", "simhash",
                     F.explode(F.array(*chunks)).alias("c"))
          .select("doc_id", "simhash", "c.ci", "c.cv"))
    sized = ch.join(ch.groupBy("ci", "cv").agg(F.count("*").alias("_n")),
                    ["ci", "cv"])
    cold = sized.filter(F.col("_n") <= SIMHASH_MAX_BUCKET)
    l1 = _simhash_pairs_on(cold, "ci", "cv")

    # escalation: any doc with ≥1 hot chunk re-keys on all 45 chunk pairs
    hot_docs = (sized.filter(F.col("_n") > SIMHASH_MAX_BUCKET)
                .select("doc_id", "simhash").distinct())
    pair_keys = [F.struct(
        F.lit(i * _SIMHASH_N_CHUNKS + j).alias("pi"),
        (_simhash_chunk_col(i) * (1 << _SIMHASH_CHUNK_BITS)
         + _simhash_chunk_col(j)).alias("pv"))
        for i in range(_SIMHASH_N_CHUNKS)
        for j in range(i + 1, _SIMHASH_N_CHUNKS)]
    hp = (hot_docs.select("doc_id", "simhash",
                          F.explode(F.array(*pair_keys)).alias("p"))
          .select("doc_id", "simhash", "p.pi", "p.pv"))
    l2 = _simhash_pairs_on(hp, "pi", "pv")
    return l1.unionByName(l2).dropDuplicates(["da", "db"])


ORACLES["q_lsh_signature"] = _lsh_oracle_sql()
# DuckDB verifies with the BRUTE-FORCE all-pairs join over the full corpus:
# pigeonhole banding is exact, so the banded Spark plan must reproduce the
# exhaustive answer bit-for-bit (a genuinely independent recall check).
ORACLES["q_simhash_near_pairs"] = """
    WITH words AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(unnest(regexp_split_to_array(trim(text), ' +'))), 1, 15)) AS BIGINT) AS h
      FROM documents
    ), bits AS (
      SELECT doc_id, h, b FROM words, generate_series(0, 59) t(b)
    ), votes AS (
      SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS v
      FROM bits GROUP BY doc_id, b
    ), sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
"""

RELATIONAL_QUERIES["q_lsh_signature"] = q_lsh_signature
RELATIONAL_QUERIES["q_simhash_near_pairs"] = q_simhash_near_pairs


# Near-dup clustering: hard iteration cap.  Min-label propagation needs
# rounds = cluster diameter; hamming≤8 clusters are quasi-cliques
# (diameter 2-3), so the cap only guards a pathological chain corpus —
# the loop breaks on convergence (zero label changes) long before it.
CC_MAX_ITERS = 50


def _cc_labels_from(pairs):
    """Min-label propagation over an arbitrary (da, db) pair frame →
    (doc_id, comp) for every doc appearing in some pair.  Separated from
    the corpus read so structural tests can drive a crafted graph (a
    chain forcing multi-round propagation) through the exact shipped
    loop.  Labels materialize per round via eager localCheckpoint (see
    inline note), the convergence check is a scalar count over the fused
    change flag, and labels only ever decrease — so the loop terminates
    at the component-min fixpoint in ~diameter/2 rounds (the jump step
    advances a long path two hops per round)."""
    edges = cache.track("cc_edges", pairs.unionByName(
        pairs.select(F.col("db").alias("da"), F.col("da").alias("db")))
        .persist())
    # labels are REBUILT from a truncated lineage every round (eager
    # localCheckpoint): the jump step references `mid` twice, so without
    # truncation the logical plan DOUBLES per round — exponential
    # analysis cost by round ~10.  Checkpointing also caps the recovery
    # chain; a cluster deployment would use checkpoint(dir) for
    # executor-loss safety (deploy-time lever, same plan shape).
    labels = (edges.select(F.col("da").alias("doc_id"))
              .distinct()
              .withColumn("comp", F.col("doc_id"))
              .localCheckpoint())
    for _ in range(CC_MAX_ITERS):
        # (1) neighbor-min: mid(v) = min(comp(v), min over N(v))
        nbr = (edges.join(labels.select(F.col("doc_id").alias("db"),
                                        F.col("comp")), "db")
               .groupBy("da").agg(F.min("comp").alias("nmin"))
               .select(F.col("da").alias("doc_id"), "nmin"))
        mid = (labels.select("doc_id", F.col("comp").alias("old"))
               .join(nbr, "doc_id", "left")
               .select("doc_id", "old",
                       F.least(F.col("old"),
                               F.coalesce(F.col("nmin"), F.col("old")))
                       .alias("mid")))
        # (2) pointer jump: comp(v) ← min(mid(v), mid(mid(v))) — labels
        # are node ids, so one extra hop per round roughly halves the
        # rounds a long path needs (both steps only ever REPLACE a label
        # with a smaller label of the same component, so the fixpoint —
        # every node at its component min — is unchanged)
        jump = mid.select(F.col("doc_id").alias("mid"),
                          F.col("mid").alias("jmp"))
        new = (mid.join(jump, "mid", "left")
               .withColumn("comp",
                           F.least(F.col("mid"),
                                   F.coalesce(F.col("jmp"), F.col("mid"))))
               .select("doc_id", "comp",
                       (F.col("comp") < F.col("old")).alias("_chg"))
               .localCheckpoint())
        # labels only decrease, so "changed" is the fused strict-less
        # flag — one action per round on the already-materialized
        # checkpoint, no extra join
        n_changed = new.filter("_chg").count()
        labels = new
        if n_changed == 0:
            break
    return labels.select("doc_id", "comp")


def q_dedup_components(spark, sf_dir):
    """Near-duplicate CLUSTERS + canonical-document selection: connected
    components over the exact SimHash near-pair graph (hamming ≤ 8),
    then one representative per cluster (longest text, doc_id
    tiebreak) — the step a training-data pipeline runs between pair
    generation and corpus rewrite (keep the canonical, drop the rest).

    Spark shape (scale rationale): iterative min-label propagation, but
    ONLY over docs that appear in some near-pair — every iterated frame
    is proportional to the DUPLICATE subset, not the corpus; the full
    documents table joins back exactly once at the end (docs without a
    pair are their own singleton component by construction).  Each
    round is a neighbor-min (equi-join + partial/final min-agg) plus a
    pointer-jump hop (comp ← comp(comp)), all keyed by doc_id;
    convergence is a scalar count over a fused change flag; each
    round's label frame materializes via eager localCheckpoint, which
    both truncates lineage (the jump self-join would otherwise double
    the logical plan per round) and caps the recovery chain.  Rounds ≈
    component diameter / 2: the loop converges in 2-4 rounds on real
    near-dup graphs regardless of corpus size (cluster diameter does
    not grow with corpus scale); at 10^12 docs the deploy-time lever is
    reliable checkpoint(dir) instead of local.  DuckDB verifies with an
    independent recursive-CTE reachability closure over its own
    brute-force all-pairs graph."""
    pairs = q_simhash_near_pairs(spark, sf_dir).select("da", "db")
    labels = _cc_labels_from(pairs)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = W.partitionBy("comp").orderBy(F.length("text").desc(), "doc_id")
    return (d.join(labels.select("doc_id", "comp"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("comp", F.col("doc_id")).alias("comp"),
                    "text")
            .select("doc_id", "comp",
                    (F.row_number().over(w) == 1).alias("is_canonical")))


# DuckDB recomputes the clusters INDEPENDENTLY: brute-force all-pairs
# near-dup graph (no banding), then a recursive reachability closure
# (every label a node can reach; MIN per node = the component id) — a
# different algorithm with the same exact answer, so both the pairing
# recall AND the propagation fixpoint are cross-checked.
ORACLES["q_dedup_components"] = """
    WITH RECURSIVE words AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(unnest(regexp_split_to_array(trim(text), ' +'))), 1, 15)) AS BIGINT) AS h
      FROM documents
    ), bits AS (
      SELECT doc_id, h, b FROM words, generate_series(0, 59) t(b)
    ), votes AS (
      SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS v
      FROM bits GROUP BY doc_id, b
    ), sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    ), edges AS (
      SELECT da AS src, db AS dst FROM pairs
      UNION ALL
      SELECT db AS src, da AS dst FROM pairs
    ), walk(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id
    ), comp AS (
      SELECT id AS doc_id, MIN(lbl) AS comp FROM walk GROUP BY id
    )
    SELECT d.doc_id, c.comp,
           (ROW_NUMBER() OVER (PARTITION BY c.comp
                               ORDER BY length(d.text) DESC, d.doc_id) = 1)
           AS is_canonical
    FROM documents d JOIN comp c ON d.doc_id = c.doc_id
"""

RELATIONAL_QUERIES["q_dedup_components"] = q_dedup_components


PACK_SHARD_TOKENS = 2048   # tokens per training shard (manifest budget)
PACK_BUCKET_DOCS = 64      # coarse doc_id buckets for the two-level cumsum


def q_pack_shards(spark, sf_dir):
    """Token-budget shard packing (training-data op): assign every doc a
    shard id so each shard holds ~PACK_SHARD_TOKENS whitespace tokens of
    consecutive (doc_id-ordered) documents — the manifest step before
    writing fixed-size training shards.  Discipline: shard boundaries
    fall at budget multiples of the running token stream and a doc
    belongs to the shard where it STARTS (docs never split; a shard can
    overrun by < one doc, expected size = budget).

    Spark shape: a single ordered window would serialize the prefix sum
    into ONE task, so the cumsum is a distributed two-level prefix sum —
    within-bucket cumsum (window partitioned by coarse doc_id bucket)
    plus a bucket-offset window over the per-bucket totals (one row per
    bucket — corpus/64 rows, broadcast back).  Identical math to the
    oracle's single window; everything stays exact BIGINT (integer DIV,
    no doubles — a 100 TB running total exceeds 2^53)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("tokens"))
    b = d.withColumn(
        "bucket", F.expr(f"doc_id DIV {PACK_BUCKET_DOCS}"))
    off = (b.groupBy("bucket").agg(F.sum("tokens").alias("bt"))
           .select("bucket",
                   (F.sum("bt").over(
                       W.orderBy("bucket")
                       .rowsBetween(W.unboundedPreceding, W.currentRow))
                    - F.col("bt")).alias("boff")))
    wb = (W.partitionBy("bucket").orderBy("doc_id")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (b.join(F.broadcast(off), "bucket")
            .withColumn("cum0", F.sum("tokens").over(wb) - F.col("tokens")
                        + F.col("boff"))
            .select("doc_id", "tokens",
                    F.expr(f"CAST(cum0 DIV {PACK_SHARD_TOKENS} AS BIGINT)")
                    .alias("shard_id")))


ORACLES["q_pack_shards"] = f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT)
               AS tokens
      FROM documents
    ), c AS (
      SELECT doc_id, tokens,
             SUM(tokens) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - tokens AS cum0
      FROM t
    )
    SELECT doc_id, tokens,
           CAST(cum0 // {PACK_SHARD_TOKENS} AS BIGINT) AS shard_id
    FROM c
"""

RELATIONAL_QUERIES["q_pack_shards"] = q_pack_shards


def q_bigram_typicality(spark, sf_dir):
    """Corpus-typicality quality score: per doc, the occurrence-weighted
    mean GLOBAL count of its word bigrams — how corpus-typical the doc's
    phrasing is (outlier/garbage docs score low; the linear-space analog
    of a bigram-LM likelihood, deliberately log-free: every aggregate is
    exact integer/decimal arithmetic, so the score is bit-identical
    across engines and partition orders — the x_kmeans exactness trick;
    a log2 would differ in final ULPs between libm implementations).

    Scale shape: the bigram explode feeds a map-side-combinable
    (doc_id, bigram) partial agg, so the shuffle moves per-doc DISTINCT
    bigrams, not corpus characters; the global count table groups by
    bigram and equi-joins back on the bigram key (Zipf-tailed but far
    smaller than the corpus; never broadcast, never collected)."""
    d = _t(spark, sf_dir, "documents")
    bigrams = F.expr("CASE WHEN size(w) < 2 THEN array() ELSE "
                     "transform(sequence(0, size(w) - 2), "
                     "i -> concat_ws(' ', w[i], w[i+1])) END")
    dbg = (d.select("doc_id", F.split(F.trim("text"), " +").alias("w"))
           .select("doc_id", F.explode(bigrams).alias("bg"))
           .groupBy("doc_id", "bg").agg(F.count("*").alias("cnt")))
    g = dbg.groupBy("bg").agg(F.sum("cnt").alias("gcnt"))
    dot = (dbg.join(g, "bg")
           .groupBy("doc_id")
           .agg(F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("gcnt"))
                .alias("dot"),
                F.sum("cnt").alias("nbg")))
    return (d.select("doc_id").join(dot, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("nbg", F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    F.coalesce(F.round(F.col("dot").cast("double")
                                       / F.col("nbg").cast("double"), 6),
                               F.lit(0.0)).alias("typicality")))


ORACLES["q_bigram_typicality"] = """
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
      FROM documents
    ), bgx AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                    ELSE list_transform(range(1, len(w)),
                                        i -> w[i] || ' ' || w[i + 1])
                    END) AS bg
      FROM base
    ), dbg AS (
      SELECT doc_id, bg, COUNT(*) AS cnt FROM bgx GROUP BY doc_id, bg
    ), g AS (
      SELECT bg, SUM(cnt) AS gcnt FROM dbg GROUP BY bg
    ), dot AS (
      SELECT d.doc_id, SUM(d.cnt * g.gcnt) AS dot, SUM(d.cnt) AS nbg
      FROM dbg d JOIN g USING (bg) GROUP BY d.doc_id
    )
    SELECT b.doc_id,
           CAST(COALESCE(dot.nbg, 0) AS BIGINT) AS n_bigrams,
           COALESCE(ROUND(CAST(dot.dot AS DOUBLE)
                          / CAST(dot.nbg AS DOUBLE), 6), 0.0) AS typicality
    FROM base b LEFT JOIN dot ON b.doc_id = dot.doc_id
"""

RELATIONAL_QUERIES["q_bigram_typicality"] = q_bigram_typicality


def q_semi_anti_orders(spark, sf_dir):
    """EXISTS / NOT EXISTS as left-semi / left-anti joins (SURVEY §2.9:
    regression-diff and resume-lineage join shapes)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") >= 45).select("l_orderkey").distinct()
    with_big = (o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
                .groupBy("o_orderstatus")
                .agg(F.count("*").cast("long").alias("n"))
                .withColumn("kind", F.lit("with_big_item")))
    without = (o.join(big, o.o_orderkey == big.l_orderkey, "left_anti")
               .groupBy("o_orderstatus")
               .agg(F.count("*").cast("long").alias("n"))
               .withColumn("kind", F.lit("without_big_item")))
    return with_big.unionByName(without)


def q_cube_orders(spark, sf_dir):
    """CUBE grouping sets over status × priority."""
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_price")))


ORACLES["q_semi_anti_orders"] = """
    WITH big AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 45
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           'with_big_item' AS kind
    FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY o_orderstatus
    UNION ALL
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           'without_big_item' AS kind
    FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM big)
    GROUP BY o_orderstatus
"""
ORACLES["q_cube_orders"] = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""
RELATIONAL_QUERIES["q_semi_anti_orders"] = q_semi_anti_orders
RELATIONAL_QUERIES["q_cube_orders"] = q_cube_orders


def _langid_oracle_sql() -> str:
    hit = {lang: ("CAST(len(list_filter(regexp_split_to_array(trim(text),"
                  f" ' +'), x -> x IN ('" + "','".join(ws) + "'))) AS BIGINT)")
           for lang, ws in _LANG_PROFILES}
    prio = [lang for lang, _ in _LANG_PROFILES]
    branches = [f"WHEN n_{lang} / total > {thr} THEN '{lang}'"
                for lang, _cls, thr in _SCRIPT_RULES]
    for lang in prio:
        conds = [f"h_{lang} > 0"] + [f"h_{lang} >= h_{o}"
                                     for o in prio if o != lang]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    scripts = ",\n                 ".join(
        f"CAST(length(regexp_replace(text, '[^{cls}]', '', 'g'))"
        f" AS DOUBLE) AS n_{lang}" for lang, cls, _thr in _SCRIPT_RULES)
    return f"""
        WITH base AS (
          SELECT doc_id, text,
                 CAST(GREATEST(length(replace(text, ' ', '')), 1) AS DOUBLE)
                   AS total,
                 {scripts},
                 {', '.join(f"{sql} AS h_{lang}"
                            for lang, sql in hit.items())}
          FROM documents
        )
        SELECT doc_id,
               CASE {' '.join(branches)}
                    ELSE 'und' END AS pred_lang,
               ROUND(n_zh / total, 6) AS cjk_ratio,
               {', '.join(f"h_{lang} AS hits_{lang}" for lang in prio)}
        FROM base
    """


ORACLES["q_doc_langid"] = _langid_oracle_sql()
ORACLES["q_doc_quality_signals"] = r"""
    WITH base AS (
      SELECT doc_id, text, regexp_split_to_array(trim(text), ' +') AS w,
             CAST(GREATEST(length(text), 1) AS DOUBLE) AS nchars
      FROM documents
    ), bi AS (
      SELECT doc_id, text, w, nchars,
             CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                  ELSE list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i + 1]) END AS bg
      FROM base
    )
    SELECT doc_id,
           ROUND(CAST(length(regexp_replace(text,
                 '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / nchars, 6)
             AS punct_ratio,
           ROUND(CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS DOUBLE) / nchars, 6) AS digit_ratio,
           CAST(list_aggregate(list_transform(w, x -> length(x)), 'max')
                 AS BIGINT) AS max_word_len,
           ROUND(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
                 / GREATEST(len(bg), 1), 6) AS dup_bigram_ratio
    FROM bi
"""
RELATIONAL_QUERIES["q_doc_langid"] = q_doc_langid
RELATIONAL_QUERIES["q_doc_quality_signals"] = q_doc_quality_signals


def q_doc_repetition(spark, sf_dir):
    """Within-document repetition signal (RefinedWeb/Gopher-style
    repetition REMOVAL stats, positional): a word POSITION is repeated
    when the trigram starting there already occurred earlier in the same
    document.  Whole-corpus shape: posexplode + two windows partitioned
    by doc_id — at 10^12 docs the window key is the doc, so state is one
    document's positions, never global.  Emits per doc: trigram count,
    repeated-position count, repetition ratio (the filter a cleaning
    pass would threshold on)."""
    from pyspark.sql import Window as W

    base = _t(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split(F.trim("text"), " +"))
        .alias("pos", "w"))
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    tri = F.concat_ws(" ", "w", F.lead("w", 1).over(wdoc),
                      F.lead("w", 2).over(wdoc))
    g = base.select("doc_id", "pos", tri.alias("tri"),
                    F.lead("w", 2).over(wdoc).alias("_w2")) \
        .filter(F.col("_w2").isNotNull())   # only complete trigrams
    wtri = W.partitionBy("doc_id", "tri").orderBy("pos")
    flagged = g.select(
        "doc_id",
        (F.row_number().over(wtri) > 1).cast("int").alias("dup"))
    return (flagged.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_trigrams"),
                 F.sum("dup").cast("long").alias("n_repeated"),
                 F.round(F.sum("dup").cast("double")
                         / F.count("*"), 6).alias("rep_ratio")))


ORACLES["q_doc_repetition"] = """
    WITH words AS (
      SELECT doc_id, w, pos
      FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), ' +')) AS w,
               generate_subscripts(
                   regexp_split_to_array(trim(text), ' +'), 1) - 1 AS pos
        FROM documents
      )
    ), tri AS (
      SELECT doc_id, pos,
             w || ' ' || LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
               || ' ' || LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos)
               AS tri,
             LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM words
    ), flagged AS (
      SELECT doc_id,
             CASE WHEN ROW_NUMBER() OVER (
                 PARTITION BY doc_id, tri ORDER BY pos) > 1
                  THEN 1 ELSE 0 END AS dup
      FROM tri WHERE w2 IS NOT NULL
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(dup) AS BIGINT) AS n_repeated,
           ROUND(CAST(SUM(dup) AS DOUBLE) / COUNT(*), 6) AS rep_ratio
    FROM flagged GROUP BY doc_id
"""
RELATIONAL_QUERIES["q_doc_repetition"] = q_doc_repetition


DECON_N = 8         # decontamination n-gram width (The-Pile-style 13-gram
                    # rule scaled to the synthetic doc length; the width is
                    # a literal, not a plan property)
DECON_EVAL_MOD = 50  # deterministic eval split: doc_id % 50 == 0


def q_decontaminate(spark, sf_dir):
    """Train/eval decontamination (training-data op): flag training
    documents sharing any word 8-gram with the held-out eval split (the
    GPT-3/Pile n-gram overlap rule).  Per train doc: distinct-gram count,
    contaminated-gram count, overlap ratio, flag.

    Scale shape: the eval split is SMALL by construction at any corpus
    size, so its distinct-gram set broadcasts — the only shuffle is the
    per-doc gram aggregation; no train×eval pair join ever forms.  At
    10^12 docs the eval grams become a materialized bloom/set table and
    the join key is unchanged."""
    d = _t(spark, sf_dir, "documents")
    grams = (d.select("doc_id", F.split(F.trim("text"), " +").alias("w"))
             .select("doc_id", F.explode(F.array_distinct(F.expr(
                 f"CASE WHEN size(w) < {DECON_N} THEN array() "
                 f"ELSE transform(sequence(0, size(w) - {DECON_N}), "
                 f"i -> concat_ws(' ', slice(w, i + 1, {DECON_N}))) END"
             ))).alias("g")))
    is_eval = (F.col("doc_id") % DECON_EVAL_MOD) == 0
    eval_grams = grams.filter(is_eval).select("g").distinct()
    train = grams.filter(~is_eval)
    totals = train.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"))
    hits = (train.join(F.broadcast(eval_grams), "g")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("_hits")))
    return (totals.join(hits, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce("_hits", F.lit(0)).cast("long")
                    .alias("n_contaminated"),
                    F.round(F.coalesce("_hits", F.lit(0)).cast("double")
                            / F.col("n_grams"), 6)
                    .alias("contamination_ratio"),
                    (F.coalesce("_hits", F.lit(0)) > 0)
                    .alias("contaminated")))


ORACLES["q_decontaminate"] = f"""
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(w) - {DECON_N} + 2),
               i -> array_to_string(w[i:i + {DECON_N} - 1], ' ')))) AS g
      FROM words WHERE len(w) >= {DECON_N}
    ), ev AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {DECON_EVAL_MOD} = 0
    ), train AS (
      SELECT * FROM grams WHERE doc_id % {DECON_EVAL_MOD} != 0
    ), tot AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
      FROM train GROUP BY doc_id
    ), hit AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_cont
      FROM train t JOIN ev e USING (g) GROUP BY t.doc_id
    )
    SELECT doc_id, n_grams,
           COALESCE(n_cont, 0) AS n_contaminated,
           ROUND(CAST(COALESCE(n_cont, 0) AS DOUBLE) / n_grams, 6)
             AS contamination_ratio,
           COALESCE(n_cont, 0) > 0 AS contaminated
    FROM tot LEFT JOIN hit USING (doc_id)
"""
RELATIONAL_QUERIES["q_decontaminate"] = q_decontaminate


SAMPLE_PER_STRATUM = 20  # deterministic per-language sample size


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (training-data op): up to K
    documents per language stratum, selected by md5(doc_id) rank — the
    distributed, replayable analog of per-group reservoir sampling (the
    hash IS the reservoir priority, so any re-run or incremental batch
    picks the same sample).  One window shuffle keyed by the stratum;
    state per key is the stratum's rows, never global."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    pri = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("lang").orderBy(pri, "doc_id")
    return (d.select("doc_id", "lang", "n_chars",
                     pri.alias("pri"),
                     F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= SAMPLE_PER_STRATUM)
            .select("doc_id", "lang", "n_chars",
                    F.col("rk").cast("long").alias("rk")))


ORACLES["q_stratified_sample"] = f"""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, n_chars, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {SAMPLE_PER_STRATUM}
"""
RELATIONAL_QUERIES["q_stratified_sample"] = q_stratified_sample


# cleaning-pass thresholds (C4/Gopher-style; fixed literals shared with
# the oracle SQL)
CLEAN_MIN_WORDS = 5
CLEAN_MAX_WORD_LEN = 40
CLEAN_MAX_PUNCT = 0.3
CLEAN_MAX_DUP_BIGRAM = 0.5


def q_clean_filter(spark, sf_dir):
    """The composed cleaning PASS a training pipeline runs (training-data
    op): every document gets keep/drop + the FIRST matching reason in a
    fixed cascade — duplicate (not the min-doc_id keeper of its content
    hash), too_few_words, long_word, high_punct, repetitive (dup-bigram
    ratio), lang_und (no script/stopword evidence, the q_doc_langid
    'und' outcome) — composing the oracle-checked signal family into the
    actual filter decision.

    Scale shape: one narrow window shuffle keyed by content hash (the
    dedup rank) + per-row expressions; no joins.  Reason literals and
    thresholds are shared with the DuckDB oracle."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    w = F.split(F.trim("text"), " +")
    nwords = F.size(w)
    nchars = F.greatest(F.length("text"), F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(
        "text", r"""[^.,;:!?'"()\[\]{}-]""", "")).cast("double") / nchars
    maxw = F.array_max(F.transform(w, F.length))
    bigrams = F.expr("CASE WHEN size(w) < 2 THEN array() ELSE "
                     "transform(sequence(0, size(w) - 2), "
                     "i -> concat_ws(' ', w[i], w[i+1])) END")
    dup_bg = (F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double")
              / F.greatest(F.size(bigrams), F.lit(1)))
    # language evidence: any script ratio over threshold OR any stopword
    # hit (== q_doc_langid pred != 'und', same shared constants)
    total = F.greatest(F.length(F.regexp_replace("text", " ", "")),
                       F.lit(1)).cast("double")
    script_ev = None
    for lang, cls, thr in _SCRIPT_RULES:
        c = (F.length(F.regexp_replace("text", f"[^{cls}]", ""))
             .cast("double") / total) > thr
        script_ev = c if script_ev is None else (script_ev | c)
    stop_ev = None
    for _lang, ws in _LANG_PROFILES:
        c = F.size(F.filter(w, lambda x: x.isin(*ws))) > 0
        stop_ev = c if stop_ev is None else (stop_ev | c)
    has_lang = script_ev | stop_ev

    dup_rank = F.row_number().over(
        W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id"))
    base = d.select("doc_id", w.alias("w"), nwords.alias("nw"),
                    F.round(punct, 6).alias("punct"),
                    maxw.alias("maxw"),
                    F.round(dup_bg, 6).alias("dupbg"),
                    has_lang.alias("has_lang"),
                    dup_rank.alias("dup_rank"))
    reason = (F.when(F.col("dup_rank") > 1, F.lit("duplicate"))
              .when(F.col("nw") < CLEAN_MIN_WORDS, F.lit("too_few_words"))
              .when(F.col("maxw") > CLEAN_MAX_WORD_LEN, F.lit("long_word"))
              .when(F.col("punct") > CLEAN_MAX_PUNCT, F.lit("high_punct"))
              .when(F.col("dupbg") > CLEAN_MAX_DUP_BIGRAM,
                    F.lit("repetitive"))
              .when(~F.col("has_lang"), F.lit("lang_und"))
              .otherwise(F.lit("ok")))
    return base.select("doc_id", reason.alias("reason"),
                       (reason == "ok").alias("keep"))


def _clean_filter_oracle_sql() -> str:
    script_ev = " OR ".join(
        f"(CAST(length(regexp_replace(text, '[^{cls}]', '', 'g')) AS DOUBLE)"
        f" / total) > {thr}" for _lang, cls, thr in _SCRIPT_RULES)
    stop_ev = " OR ".join(
        "len(list_filter(w, x -> x IN ('" + "','".join(ws) + "'))) > 0"
        for _lang, ws in _LANG_PROFILES)
    return f"""
        WITH base AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), ' +') AS w,
                 CAST(GREATEST(length(text), 1) AS DOUBLE) AS nchars,
                 CAST(GREATEST(length(replace(text, ' ', '')), 1) AS DOUBLE)
                   AS total,
                 ROW_NUMBER() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) AS dup_rank
          FROM documents
        ), feat AS (
          SELECT doc_id, w, total, dup_rank,
                 len(w) AS nw,
                 ROUND(CAST(length(regexp_replace(text,
                   '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE)
                   / nchars, 6) AS punct,
                 list_aggregate(list_transform(w, x -> length(x)), 'max')
                   AS maxw,
                 ROUND(1.0 - CAST(len(list_distinct(
                   CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                        ELSE list_transform(range(1, len(w)),
                                            i -> w[i] || ' ' || w[i + 1])
                   END)) AS DOUBLE)
                   / GREATEST(CASE WHEN len(w) < 2 THEN 0
                              ELSE len(w) - 1 END, 1), 6) AS dupbg,
                 ({script_ev} OR {stop_ev}) AS has_lang,
                 text
          FROM base
        )
        SELECT doc_id,
               CASE WHEN dup_rank > 1 THEN 'duplicate'
                    WHEN nw < {CLEAN_MIN_WORDS} THEN 'too_few_words'
                    WHEN maxw > {CLEAN_MAX_WORD_LEN} THEN 'long_word'
                    WHEN punct > {CLEAN_MAX_PUNCT} THEN 'high_punct'
                    WHEN dupbg > {CLEAN_MAX_DUP_BIGRAM} THEN 'repetitive'
                    WHEN NOT has_lang THEN 'lang_und'
                    ELSE 'ok' END AS reason,
               (CASE WHEN dup_rank > 1 THEN 'duplicate'
                    WHEN nw < {CLEAN_MIN_WORDS} THEN 'too_few_words'
                    WHEN maxw > {CLEAN_MAX_WORD_LEN} THEN 'long_word'
                    WHEN punct > {CLEAN_MAX_PUNCT} THEN 'high_punct'
                    WHEN dupbg > {CLEAN_MAX_DUP_BIGRAM} THEN 'repetitive'
                    WHEN NOT has_lang THEN 'lang_und'
                    ELSE 'ok' END) = 'ok' AS keep
        FROM feat
    """


ORACLES["q_clean_filter"] = _clean_filter_oracle_sql()
RELATIONAL_QUERIES["q_clean_filter"] = q_clean_filter


COS_NEAR_MIN = 0.25  # near-dup cosine threshold on the isotropic synthetic
                     # embeddings (top-pair cosines ≈ 0.3; a production 0.9
                     # threshold only changes the literal)


def q_embed_near_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (dedup family): candidates
    come from BANDED SRP-LSH — the 16-plane signature (same deterministic
    hyperplane family DuckDB recomputes in q_lsh_signature) splits into
    SRP_BANDS bands of SRP_BAND_BITS bits, a pair is a candidate when ANY
    band matches (MinHash-style OR-of-ANDs), then the exact cosine is
    verified per distinct candidate.  Plan: explode ×SRP_BANDS + one
    shuffle equi-join on (band_idx, band_value); never an all-pairs cross
    join.  Per-(band, value) bucket size is ~N/2^SRP_BAND_BITS, so at
    larger corpus N the band width (not this plan shape) is the knob that
    bounds the self-join — the round-2 fixed 64-bucket variant degenerated
    to ~N²/64 pairs and was replaced by this."""
    from .simsearch import band_cols, signature_col

    e = _t(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding", signature_col().alias("sig"))
    banded = e.select(
        "vec_id", "embedding",
        F.explode(F.array(*band_cols(F.col("sig")))).alias("b")) \
        .select("vec_id", "embedding", "b.bi", "b.bv")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.bi") == F.col("b.bi"))
                   & (F.col("a.bv") == F.col("b.bv"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("va"),
                    F.col("b.vec_id").alias("vb"),
                    F.col("a.embedding").alias("ea"),
                    F.col("b.embedding").alias("eb"))
            .dropDuplicates(["va", "vb"]))
    dot = F.aggregate(
        F.zip_with("ea", "eb",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(F.aggregate(
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    cos = dot / (norm(F.col("ea")) * norm(F.col("eb")))
    return (cand.select("va", "vb", F.round(cos, 6).alias("cos"))
            .filter(F.col("cos") >= COS_NEAR_MIN))


IVF_N_CENTROIDS = 16
IVF_NPROBE = 4


def _ivf_centroids(spark, sf_dir):
    """Deterministic coarse quantizer: the vectors of vec_id 1..16 act as
    the IVF centroid set (a fixed-sample quantizer — no training pass, so
    both engines derive identical centroids from the data itself)."""
    e = _t(spark, sf_dir, "embeddings")
    rows = (e.filter((F.col("vec_id") >= 1)
                     & (F.col("vec_id") <= IVF_N_CENTROIDS))
            .orderBy("vec_id").collect())
    return [[float(v) for v in r["embedding"]] for r in rows]


def q_ivf_assign(spark, sf_dir):
    """IVF coarse assignment (similarity-search scale path): every vector
    goes to its max-dot centroid.  At production scale `cent` is the
    partition/bucket key — a query probes nprobe lists instead of the
    corpus.  Dots are rounded to 9 dp before the argmax so both engines
    compare identical decimals (float fold order differs).

    r6 restructure (guide §7.3): the old shape projected 16 per-centroid
    dot expressions (each a zip_with+fold over a 64-literal array), then
    a greatest(16) and a 16-branch CASE over those columns; projection
    collapse inlined the giant subtrees into every branch and the
    OPTIMIZER took ~40s per invocation at sf0.01 (measured: 42.8s plan /
    39.1s execute — driver-side tree walking, not data work).  Same
    semantics as ONE map-only higher-order expression:
    array_max(transform(centroid-literals, c -> struct(dot, -ci))) —
    struct ordering is lexicographic, so the max is (largest dot, then
    smallest centroid id), exactly the old first-match CASE and the
    oracle's MIN(ci) over d = max.  Every dot subtree appears exactly
    once, the plan stays MAP-ONLY (zero shuffle at any scale — the same
    property the kmeans final assignment pins), and plan+execute is
    ~0.5s."""
    cents = _ivf_centroids(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings")
    cents_lit = F.array(*[
        F.struct(F.lit(ci).alias("ci"),
                 F.array(*[F.lit(float(v)) for v in c]).alias("c"))
        for ci, c in enumerate(cents)])

    def dot(carr):
        return F.round(F.aggregate(
            F.zip_with("embedding", carr,
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, v: acc + v), 9)

    m = F.array_max(F.transform(
        cents_lit,
        lambda cent: F.struct(dot(cent["c"]).alias("d"),
                              (-cent["ci"]).cast("long").alias("nci"))))
    return e.select("vec_id",
                    (-m.getField("nci")).cast("long").alias("cent"))


def q_ivf_topk(spark, sf_dir):
    """IVF-flat top-k (similarity-search scale path, the brief's IVF
    variant): probe the IVF_NPROBE centroids nearest the query (vec_id 0),
    compute the exact cosine only inside those lists, take the top 10.
    At scale the assignment is a bucketed column: probing = partition
    pruning, candidates ≪ N."""
    import numpy as np

    cents = _ivf_centroids(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            e.filter(F.col("vec_id") == 0).select("embedding")
            .first()["embedding"]]
    q = np.array(qvec)
    qd = np.round([float(np.array(c) @ q) for c in cents], 9)
    probes = sorted(range(len(cents)),
                    key=lambda ci: (-qd[ci], ci))[:IVF_NPROBE]
    assign = q_ivf_assign(spark, sf_dir).filter(F.col("cent").isin(probes))
    cand = e.join(assign, "vec_id").filter(F.col("vec_id") != 0)
    qn = float(np.linalg.norm(q))
    qcol = F.array(*[F.lit(v) for v in qvec])
    dot = F.aggregate(F.zip_with("embedding", qcol,
                                 lambda x, y: x.cast("double") * y),
                      F.lit(0.0), lambda a, v: a + v)
    norm = F.sqrt(F.aggregate(
        F.transform("embedding",
                    lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v))
    return (cand.select("vec_id", "cent",
                        F.round(dot / (norm * F.lit(qn)), 6).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(10))


_IVF_ASSIGN_CTE = f"""
        cents AS (
          SELECT vec_id - 1 AS ci, CAST(embedding AS DOUBLE[]) AS c
          FROM embeddings WHERE vec_id BETWEEN 1 AND {IVF_N_CENTROIDS}
        ), dots AS (
          SELECT e.vec_id, cents.ci,
                 ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        cents.c), 9) AS d
          FROM embeddings e CROSS JOIN cents
        ), best AS (
          SELECT vec_id, MAX(d) AS m FROM dots GROUP BY vec_id
        ), assign AS (
          SELECT d.vec_id, CAST(MIN(d.ci) AS BIGINT) AS cent
          FROM dots d JOIN best b ON d.vec_id = b.vec_id AND d.d = b.m
          GROUP BY d.vec_id
        )"""

ORACLES["q_ivf_assign"] = f"""
    WITH {_IVF_ASSIGN_CTE}
    SELECT vec_id, cent FROM assign
"""
ORACLES["q_ivf_topk"] = f"""
    WITH {_IVF_ASSIGN_CTE}, q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
      WHERE vec_id = 0
    ), probes AS (
      SELECT cents.ci FROM cents, q
      ORDER BY ROUND(list_dot_product(cents.c, q.qe), 9) DESC, cents.ci ASC
      LIMIT {IVF_NPROBE}
    )
    SELECT e.vec_id, a.cent,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos
    FROM embeddings e
    JOIN assign a ON e.vec_id = a.vec_id
    JOIN probes p ON a.cent = p.ci
    CROSS JOIN q
    WHERE e.vec_id != 0
    ORDER BY cos DESC, e.vec_id ASC
    LIMIT 10
"""
ORACLES["q_embed_near_pairs"] = """
    WITH sig AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             ({SIG_TERMS}) AS s
      FROM embeddings
    ), bands AS (
      {BAND_SELECTS}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM bands a JOIN bands b
        ON a.bi = b.bi AND a.bv = b.bv AND a.vec_id < b.vec_id
    )
    SELECT c.va, c.vb,
           ROUND(list_dot_product(x.emb, y.emb)
                 / (sqrt(list_dot_product(x.emb, x.emb))
                    * sqrt(list_dot_product(y.emb, y.emb))), 6) AS cos
    FROM cand c
    JOIN sig x ON x.vec_id = c.va
    JOIN sig y ON y.vec_id = c.vb
    WHERE ROUND(list_dot_product(x.emb, y.emb)
                / (sqrt(list_dot_product(x.emb, x.emb))
                   * sqrt(list_dot_product(y.emb, y.emb))), 6) >= {THR}
"""


def _near_pairs_oracle_sql() -> str:
    from .simsearch import SRP_BAND_BITS, SRP_BANDS, _PLANES

    terms = []
    for p, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(f"{v!r}" for v in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
            f"CAST({arr} AS DOUBLE[])) > 0 THEN {1 << p} ELSE 0 END)")
    mask = (1 << SRP_BAND_BITS) - 1
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT vec_id, {i} AS bi, "
        f"((s // {1 << (i * SRP_BAND_BITS)}) & {mask}) AS bv FROM sig"
        for i in range(SRP_BANDS))
    return ORACLES["q_embed_near_pairs"] \
        .replace("{SIG_TERMS}", " + ".join(terms)) \
        .replace("{BAND_SELECTS}", band_selects) \
        .replace("{THR}", repr(COS_NEAR_MIN))


ORACLES["q_embed_near_pairs"] = _near_pairs_oracle_sql()
RELATIONAL_QUERIES["q_embed_near_pairs"] = q_embed_near_pairs
RELATIONAL_QUERIES["q_ivf_assign"] = q_ivf_assign
RELATIONAL_QUERIES["q_ivf_topk"] = q_ivf_topk


def write_signature_table(spark, sf_dir: str, table: str = "doc_signatures",
                          n_buckets: int = 8) -> None:
    """Materialize the MinHash band-key table BUCKETED BY band key — the
    production shape the q_jaccard_pairs docstring names: candidate
    generation becomes a co-located self-join (no Exchange on the bucket
    key), and incremental dedup joins new docs against it without
    reshuffling the corpus."""
    d = _t(spark, sf_dir, "documents")
    sh = _shingles(d)
    sig = sh.select(
        "doc_id", "sh",
        *[F.array_min(F.transform(
            "sh", lambda s, k=k: F.md5(F.concat(s, F.lit(f"#{k}")))))
          .alias(f"mh{k}") for k in range(4)])
    bands = sig.select(
        "doc_id", "sh",
        F.explode(F.array(
            F.struct(F.lit(0).alias("bi"),
                     F.md5(F.concat("mh0", "mh1")).alias("bk")),
            F.struct(F.lit(1).alias("bi"),
                     F.md5(F.concat("mh2", "mh3")).alias("bk")),
        )).alias("b")).select("doc_id", "sh", "b.bi", "b.bk")
    (bands.write.mode("overwrite")
     .bucketBy(n_buckets, "bk").sortBy("bk")
     .format("parquet").saveAsTable(table))


# ---------------------------------------------------------------------------
# PII redaction (training-data op: Dolma/CCNet-style scrub pass).
# The synthetic documents corpus is PII-free word soup, so the query
# APPENDS deterministic PII spans derived from doc_id — identically in
# Spark and the DuckDB oracle — then detects and masks them; the gate
# thus checks the detector/redactor on real matches, not on vacuous
# zero-match rows.
# ---------------------------------------------------------------------------

# shared pattern literals — Java regex (Spark) and RE2 (DuckDB) agree on
# this subset: ASCII classes, bounded repeats, no backrefs/lookaround
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IP_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def q_pii_redact(spark, sf_dir):
    """PII scrub pass (training-data op): per-document counts of emails /
    phone numbers / IPv4 addresses plus the masked text (<EMAIL>,
    <PHONE>, <IP>), replacement ordered email -> phone -> ip so a
    placeholder never feeds a later pattern.

    Scale shape: pure per-row JVM regexp expressions after the scan — no
    shuffle, no UDF, no collect; the projection prunes to (doc_id, text).
    At 100 TB this is a map-only pass bounded by scan throughput."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(did % 3 == 0, F.concat(
            F.lit(" Contact user"), did.cast("string"),
            F.lit("@mail"), (did % 5).cast("string"),
            F.lit(".example.com now."))).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.concat(
            F.lit(" Call "), (did % 700 + 200).cast("string"),
            F.lit("-555-"), (did % 9000 + 1000).cast("string"),
            F.lit("."))).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.concat(
            F.lit(" Host 10."), (did % 256).cast("string"),
            F.lit("."), (did % 100).cast("string"),
            F.lit("."), (did % 254 + 1).cast("string"),
            F.lit(" up."))).otherwise(F.lit("")))
    base = d.select("doc_id", aug.alias("t"))
    red = F.regexp_replace(F.regexp_replace(F.regexp_replace(
        F.col("t"), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE, "<PHONE>"), PII_IP_RE, "<IP>")
    return base.select(
        "doc_id",
        F.regexp_count("t", F.lit(PII_EMAIL_RE)).cast("long")
        .alias("n_emails"),
        F.regexp_count("t", F.lit(PII_PHONE_RE)).cast("long")
        .alias("n_phones"),
        F.regexp_count("t", F.lit(PII_IP_RE)).cast("long").alias("n_ips"),
        red.alias("redacted"))


ORACLES["q_pii_redact"] = f"""
    WITH base AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0 THEN ' Contact user'
                  || CAST(doc_id AS VARCHAR) || '@mail'
                  || CAST(doc_id % 5 AS VARCHAR) || '.example.com now.'
                ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN ' Call '
                  || CAST(doc_id % 700 + 200 AS VARCHAR) || '-555-'
                  || CAST(doc_id % 9000 + 1000 AS VARCHAR) || '.'
                ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN ' Host 10.'
                  || CAST(doc_id % 256 AS VARCHAR) || '.'
                  || CAST(doc_id % 100 AS VARCHAR) || '.'
                  || CAST(doc_id % 254 + 1 AS VARCHAR) || ' up.'
                ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(t, '{PII_IP_RE}')) AS BIGINT)
             AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{PII_PHONE_RE}', '<PHONE>', 'g'),
             '{PII_IP_RE}', '<IP>', 'g') AS redacted
    FROM base
"""
RELATIONAL_QUERIES["q_pii_redact"] = q_pii_redact


# ---------------------------------------------------------------------------
# Document chunking (training-data op): fixed-size overlapping word
# windows — the step between cleaning and shard packing when a model's
# context is shorter than a document.
# ---------------------------------------------------------------------------

CHUNK_WORDS = 64    # words per chunk
CHUNK_STRIDE = 48   # chunk start stride (overlap = CHUNK_WORDS - stride)


def q_chunk_docs(spark, sf_dir):
    """Split every document into fixed-size overlapping word windows:
    chunk k starts at word k*CHUNK_STRIDE and takes CHUNK_WORDS words
    (the last chunk may be shorter).  A chunk is emitted only when it
    contributes at least one word beyond the previous chunk's coverage
    (start < n_words - overlap, start 0 always) — no fully-redundant
    tail windows.

    Scale shape: per-row split + a generator explode over the chunk
    index sequence — map-only, no shuffle, no Python; output rows
    ~ corpus_words / stride regardless of document skew (a 1 GB doc
    becomes many rows, never one fat row)."""
    ov = CHUNK_WORDS - CHUNK_STRIDE
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " +").alias("w"))
    n_chunks = F.expr(
        f"CASE WHEN size(w) > {ov} THEN "
        f"1 + CAST((size(w) - {ov} - 1) DIV {CHUNK_STRIDE} AS BIGINT) "
        "ELSE CAST(1 AS BIGINT) END")
    return (d.withColumn("chunk_id",
                         F.explode(F.sequence(F.lit(0).cast("long"),
                                              n_chunks - 1)))
            .select("doc_id", "chunk_id",
                    F.expr(f"slice(w, chunk_id * {CHUNK_STRIDE} + 1, "
                           f"{CHUNK_WORDS})").alias("cw"))
            .select("doc_id", "chunk_id",
                    F.size("cw").cast("long").alias("n_words"),
                    F.array_join("cw", " ").alias("chunk_text")))


ORACLES["q_chunk_docs"] = f"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
      FROM documents
    ), n AS (
      SELECT doc_id, w,
             CASE WHEN len(w) > {CHUNK_WORDS - CHUNK_STRIDE} THEN
               1 + (len(w) - {CHUNK_WORDS - CHUNK_STRIDE} - 1)
                   // {CHUNK_STRIDE}
             ELSE 1 END AS n_chunks
      FROM base
    )
    SELECT doc_id, CAST(u.k AS BIGINT) AS chunk_id,
           CAST(len(list_slice(w, u.k * {CHUNK_STRIDE} + 1,
                               u.k * {CHUNK_STRIDE} + {CHUNK_WORDS}))
                AS BIGINT) AS n_words,
           array_to_string(list_slice(w, u.k * {CHUNK_STRIDE} + 1,
                                      u.k * {CHUNK_STRIDE} + {CHUNK_WORDS}),
                           ' ') AS chunk_text
    FROM n, UNNEST(range(n.n_chunks)) AS u(k)
"""
RELATIONAL_QUERIES["q_chunk_docs"] = q_chunk_docs


# ---------------------------------------------------------------------------
# Classifier-based quality filtering (training-data op): a fastText-style
# linear model over hashed bag-of-words features — the CCNet/fastText
# quality-filter shape with a deterministic weight table so both engines
# score bit-identically (no model file: weight = integer hash chain).
# ---------------------------------------------------------------------------

QC_BUCKETS = 4096      # hashed feature space |V|
QC_MIX = 2654435761    # Knuth multiplicative constant for the weight chain
QC_WMOD = 8191         # weight range modulus → weights in [-4095, 4095]


def q_quality_classifier(spark, sf_dir):
    """Hashed linear quality score per document: each token hashes into
    one of QC_BUCKETS buckets (md5 first 8 hex), the bucket maps to a
    deterministic pseudo-weight ((bucket*QC_MIX) % QC_WMOD - (QC_WMOD-1)/2),
    and the document scores the MEAN weight normalized to [-1, 1]
    (sum/n/4095).  quality_pass is the >= 0 decision — the shape of a
    fastText quality classifier head (score = w·x/|x|) with the learned
    table replaced by a hash chain both engines reproduce exactly.

    Scale shape: ONE aggregate() expression per row — map-only, no
    shuffle, no Python, integer arithmetic until the final division
    (bit-stable across engines and partitionings); at 100 TB this is a
    scan-bound pass like the PII redactor."""
    w_expr = (f"((CAST(conv(substring(md5(w),1,8),16,10) AS BIGINT) "
              f"% {QC_BUCKETS}) * {QC_MIX}) % {QC_WMOD} - {(QC_WMOD - 1) // 2}")
    toks = "filter(split(trim(text), ' +'), w -> w != '')"
    d = _t(spark, sf_dir, "documents")
    return (d.select(
        "doc_id",
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"aggregate({toks}, CAST(0 AS BIGINT), "
               f"(acc, w) -> acc + {w_expr})").alias("_ws"))
        .select(
        "doc_id", "n_tokens",
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("_ws").cast("double") / F.col("n_tokens")
                       / ((QC_WMOD - 1) / 2), 6))
        .otherwise(F.lit(0.0)).alias("quality_score"))
        .withColumn("quality_pass", F.col("quality_score") >= 0))


ORACLES["q_quality_classifier"] = f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), ' +'),
                         w -> w != '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             COALESCE(list_sum(list_transform(toks,
               w -> ((CAST(('0x' || substr(md5(w),1,8)) AS BIGINT)
                      % {QC_BUCKETS}) * {QC_MIX}) % {QC_WMOD}
                     - {(QC_WMOD - 1) // 2})), 0) AS ws
      FROM t
    )
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens > 0 THEN
             ROUND((CAST(ws AS DOUBLE) / n_tokens)
                   / {(QC_WMOD - 1) // 2}, 6)
           ELSE 0.0 END AS quality_score,
           (CASE WHEN n_tokens > 0 THEN
             ROUND((CAST(ws AS DOUBLE) / n_tokens)
                   / {(QC_WMOD - 1) // 2}, 6)
           ELSE 0.0 END) >= 0 AS quality_pass
    FROM s
"""
RELATIONAL_QUERIES["q_quality_classifier"] = q_quality_classifier


# ---------------------------------------------------------------------------
# Domain mixture weights (training-data op): inverse-sqrt temperature
# resampling over sources — upweight small domains, downweight dominant
# ones (the multilingual/multi-source mixture-balancing step before
# shard packing).  sqrt is IEEE-exact in both engines and the decimal
# denominator sum is partition-order independent, so the weights gate
# bit-for-bit.
# ---------------------------------------------------------------------------

def q_domain_mix(spark, sf_dir):
    """Per-source sampling weights: w_s = sqrt(c_s) / Σ sqrt(c), and the
    per-document oversample factor w_s * N / c_s (how many times each
    doc of that source is drawn when sampling N documents from the
    mixture).  α=0.5 temperature: dominant sources shrink, rare sources
    grow, ordering preserved.

    Scale shape: one partial+final count per source (tiny result ∝
    #sources), denominator as a decimal window sum over that tiny frame
    — exact, order-independent — then per-row doubles.  No data-sized
    shuffle beyond the count agg; at 100 TB the agg is the only pass."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    sq = F.expr("CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(30,12))")
    win = W.partitionBy()
    return (counts
            .withColumn("_sq", sq)
            .withColumn("_den", F.sum("_sq").over(win))
            .withColumn("_tot", F.sum("n_docs").over(win))
            .select(
                "source", "n_docs", "_tot",
                F.round(F.col("_sq").cast("double")
                        / F.col("_den").cast("double"), 6)
                .alias("mix_weight"))
            .withColumn("sample_factor",
                        F.round(F.col("mix_weight") * F.col("_tot")
                                / F.col("n_docs"), 6))
            .drop("_tot"))


ORACLES["q_domain_mix"] = """
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), s AS (
      SELECT source, n_docs,
             CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(30,12)) AS sq
      FROM c
    ), den AS (
      SELECT SUM(sq) AS d, SUM(n_docs) AS tot FROM s
    )
    SELECT source, n_docs,
           ROUND(CAST(sq AS DOUBLE) / CAST(d AS DOUBLE), 6) AS mix_weight,
           ROUND(ROUND(CAST(sq AS DOUBLE) / CAST(d AS DOUBLE), 6)
                 * tot / n_docs, 6) AS sample_factor
    FROM s, den
"""
RELATIONAL_QUERIES["q_domain_mix"] = q_domain_mix


# ---------------------------------------------------------------------------
# Corpus-level boilerplate n-grams (training-data op): the most frequent
# word trigrams across the corpus — template/boilerplate detection that
# feeds removal rules (the Dolma/C4-style repeated-line analysis at
# n-gram granularity).
# ---------------------------------------------------------------------------

TOP_NGRAMS_K = 20


def q_top_ngrams(spark, sf_dir):
    """Top-K corpus trigrams by total occurrence count (ties broken by
    gram text) with their document frequency.

    Scale shape: per-row trigram explode → ONE partial+final count agg
    keyed by gram (map-side combine absorbs the heavy hitters — the
    hottest gram produces one partial row per task, not a shuffle of
    every occurrence); doc frequency via count(DISTINCT doc_id) inside
    the same grouping (Spark expands to a two-phase agg).  Final top-K
    is a K-row sort.  Survives 100 TB: both aggs are linear scans with
    combiners, nothing collects."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " +").alias("w"))
    grams = (d.filter(F.size("w") >= 3)
             .select("doc_id", F.explode(F.expr(
                 "transform(sequence(0, size(w)-3), "
                 "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"))
                 .alias("gram")))
    return (grams.groupBy("gram")
            .agg(F.count("*").alias("n_occurrences"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .orderBy(F.desc("n_occurrences"), F.asc("gram"))
            .limit(TOP_NGRAMS_K))


ORACLES["q_top_ngrams"] = f"""
    WITH ws AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
      FROM documents
    ), g AS (
      SELECT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS gram
      FROM ws CROSS JOIN generate_series(0, 8191) t(i)
      WHERE len(w) >= 3 AND i <= len(w) - 3
    )
    SELECT gram, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM g GROUP BY gram
    ORDER BY n_occurrences DESC, gram ASC
    LIMIT {TOP_NGRAMS_K}
"""
RELATIONAL_QUERIES["q_top_ngrams"] = q_top_ngrams


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (training-data op): the per-document
# dedup decision metric of Lee et al. 2022 ("Deduplicating Training Data
# Makes Language Models Better") — a document's fraction of k-word
# windows whose exact text occurs more than once in the corpus.  Docs
# above a threshold are dropped (or the spans cut); here we emit the
# per-doc metric + decision.
# ---------------------------------------------------------------------------

DUP_SPAN_K = 16        # window length in words (ref uses 50 BPE tokens)
DUP_SPAN_DROP = 0.5    # drop decision threshold on the duplicated fraction


def q_dup_spans(spark, sf_dir):
    """Per-document exact-substring duplication: explode every k-word
    window, key it by md5 (16-hex prefix — 64 bits, collision-free at
    any realistic corpus), count corpus-wide occurrences per key, and
    score each doc by the fraction of its windows occurring >1 time.

    Scale shape: explode ∝ total words; ONE partial+final count agg
    keyed by the 16-char hash (map-side combine absorbs boilerplate
    heavy hitters — the hottest window ships one partial row per task);
    the join back is a narrow equi-join on the same key (hot keys =
    AQE skew-split territory, rows stay (doc_id, hash)-thin); final
    per-doc agg is a second combiner pass.  Docs shorter than k words
    re-enter via a left join with zero spans.  No Python, no window-
    over-explode (a window would sort each hash partition for nothing).
    """
    k = DUP_SPAN_K
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr("filter(split(trim(text), ' +'), w -> w != '')")
        .alias("w"))
    grams = (d.filter(F.size("w") >= k)
             .select("doc_id", F.explode(F.expr(
                 f"transform(sequence(1, size(w)-{k}+1), "
                 f"i -> substring(md5(array_join(slice(w, i, {k}), ' ')),"
                 f" 1, 16))")).alias("gh")))
    occ = grams.groupBy("gh").agg(F.count("*").alias("n_occ"))
    per_doc = (grams.join(occ, "gh")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_spans"),
                    F.sum((F.col("n_occ") > 1).cast("long"))
                    .alias("dup_spans")))
    return (d.select("doc_id").join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                # double, not long: the frozen DuckDB oracle's
                # SUM(CASE ...) is HUGEINT, which materializes as float64
                # on the driver's hash surface (3.0, not 3) — match it.
                F.coalesce(F.col("dup_spans").cast("double"),
                           F.lit(0.0)).alias("dup_spans"))
            .withColumn("dup_frac",
                        F.when(F.col("n_spans") > 0,
                               F.round(F.col("dup_spans").cast("double")
                                       / F.col("n_spans"), 6))
                        .otherwise(F.lit(0.0)))
            .withColumn("drop_doc", F.col("dup_frac") >= DUP_SPAN_DROP))


ORACLES["q_dup_spans"] = f"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), ' +'),
                         w -> w != '') AS w
      FROM documents
    ), g AS (
      SELECT doc_id,
             substr(md5(array_to_string(list_slice(w, i, i+{DUP_SPAN_K}-1),
                                        ' ')), 1, 16) AS gh
      FROM ws CROSS JOIN generate_series(1, 8192) t(i)
      WHERE len(w) >= {DUP_SPAN_K} AND i <= len(w) - {DUP_SPAN_K} + 1
    ), occ AS (
      SELECT gh, COUNT(*) AS n_occ FROM g GROUP BY gh
    ), pd AS (
      SELECT g.doc_id, COUNT(*) AS n_spans,
             SUM(CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END) AS dup_spans
      FROM g JOIN occ USING (gh) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(pd.n_spans, 0) AS n_spans,
           COALESCE(pd.dup_spans, 0) AS dup_spans,
           CASE WHEN COALESCE(pd.n_spans, 0) > 0 THEN
             ROUND(CAST(pd.dup_spans AS DOUBLE) / pd.n_spans, 6)
           ELSE 0.0 END AS dup_frac,
           (CASE WHEN COALESCE(pd.n_spans, 0) > 0 THEN
             ROUND(CAST(pd.dup_spans AS DOUBLE) / pd.n_spans, 6)
           ELSE 0.0 END) >= {DUP_SPAN_DROP} AS drop_doc
    FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
"""
RELATIONAL_QUERIES["q_dup_spans"] = q_dup_spans


# ---------------------------------------------------------------------------
# CCNet-style paragraph dedup WITH corpus rewrite (training-data op): the
# transformation step (Wenzek et al. 2019 §4.1 dedups at paragraph
# granularity and rewrites the corpus keeping one occurrence), where
# q_dup_spans only scores.  The synthetic corpus has no newlines, so a
# "paragraph" is a deterministic non-overlapping PARA_SEG_WORDS-word
# segment (final partial segment included).
# ---------------------------------------------------------------------------

PARA_SEG_WORDS = 20


def q_para_dedup(spark, sf_dir):
    """Per-document segment dedup + rewrite: explode every document into
    consecutive word segments, keep a segment iff it is corpus-unique OR
    it is the globally-first occurrence of its text (min (doc_id,
    seg_idx) — the deterministic analog of CCNet's keep-first-seen), and
    emit the cleaned text rebuilt from the kept segments in order.

    Scale shape: segment explode is map-only (rows ∝ corpus_words /
    seg); ONE partial+final agg keyed by the segment text computes
    (occurrence count, keeper position) with map-side combine; the join
    back is a narrow equi-join on the same key; the per-doc rebuild is a
    second combiner agg whose sort/filter/join run as JVM higher-order
    array expressions — no Python anywhere.  At 100 TB the group key
    becomes xxhash64(seg_text) with an exact text tiebreak, same plan."""
    s = PARA_SEG_WORDS
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " +").alias("w"))
    n_segs = F.expr(f"CAST((size(w) + {s} - 1) DIV {s} AS BIGINT)")
    segs = (d.withColumn("seg_idx",
                         F.explode(F.sequence(F.lit(0).cast("long"),
                                              F.greatest(n_segs,
                                                         F.lit(1)) - 1)))
            .select("doc_id", "seg_idx",
                    F.array_join(
                        F.expr(f"slice(w, seg_idx * {s} + 1, {s})"),
                        " ").alias("seg_text")))
    stats = segs.groupBy("seg_text").agg(
        F.count("*").alias("occ"),
        F.min(F.struct("doc_id", "seg_idx")).alias("keeper"))
    marked = (segs.join(stats, "seg_text")
              .withColumn("keep",
                          (F.col("occ") == 1)
                          | ((F.col("doc_id") == F.col("keeper.doc_id"))
                             & (F.col("seg_idx")
                                == F.col("keeper.seg_idx")))))
    return (marked.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_segs"),
                 F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("keep"),
                                    F.struct("seg_idx", "seg_text")))),
                         lambda x: x.seg_text),
                     " ").alias("clean_text"))
            .orderBy("doc_id"))


ORACLES["q_para_dedup"] = f"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
      FROM documents
    ), n AS (
      SELECT doc_id, w,
             GREATEST((len(w) + {PARA_SEG_WORDS} - 1)
                      // {PARA_SEG_WORDS}, 1) AS n_segs
      FROM base
    ), segs AS (
      SELECT doc_id, CAST(u.k AS BIGINT) AS seg_idx,
             array_to_string(
               list_slice(w, u.k * {PARA_SEG_WORDS} + 1,
                          u.k * {PARA_SEG_WORDS} + {PARA_SEG_WORDS}),
               ' ') AS seg_text
      FROM n, UNNEST(range(n.n_segs)) AS u(k)
    ), ranked AS (
      SELECT *,
             COUNT(*) OVER (PARTITION BY seg_text) AS occ,
             ROW_NUMBER() OVER (PARTITION BY seg_text
                                ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(CASE WHEN occ > 1 AND rn > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           COALESCE(string_agg(
             CASE WHEN occ = 1 OR rn = 1 THEN seg_text END,
             ' ' ORDER BY seg_idx), '') AS clean_text
    FROM ranked GROUP BY doc_id ORDER BY doc_id
"""
RELATIONAL_QUERIES["q_para_dedup"] = q_para_dedup


# ---------------------------------------------------------------------------
# Leakage-safe split assignment (training-data op): deterministic
# train/val/test bucketing keyed on the CONTENT hash, not the row id —
# exact duplicates (and re-crawls of the same text) always land in the
# SAME split, so dedup-later cannot leak eval text into train.  The
# standard step between cleaning and shard packing.
# ---------------------------------------------------------------------------

# hex-prefix thresholds over 256 md5 buckets: [00, f6) train = 246/256,
# [f6, fb) val = 5/256, [fb, ff] test = 5/256.  String comparison on the
# lowercase hex prefix is engine-portable (no hex→int conversion needed).
SPLIT_VAL_LO = "f6"
SPLIT_TEST_LO = "fb"


def q_split_assign(spark, sf_dir):
    """Per-document split: bucket = first two hex chars of md5(text);
    split by fixed bucket ranges.  Map-only (no shuffle, no Python) —
    a scan-bound pass at 100 TB; the downstream anti-leak property is
    structural: identical text ⇒ identical bucket ⇒ identical split."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("text")), 1, 2)
    return (d.select(
        "doc_id", bucket.alias("bucket_hex"),
        F.when(bucket < SPLIT_VAL_LO, F.lit("train"))
         .when(bucket < SPLIT_TEST_LO, F.lit("val"))
         .otherwise(F.lit("test")).alias("split"))
        .orderBy("doc_id"))


ORACLES["q_split_assign"] = f"""
    SELECT doc_id,
           substr(md5(text), 1, 2) AS bucket_hex,
           CASE WHEN substr(md5(text), 1, 2) < '{SPLIT_VAL_LO}'
                  THEN 'train'
                WHEN substr(md5(text), 1, 2) < '{SPLIT_TEST_LO}'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents ORDER BY doc_id
"""
RELATIONAL_QUERIES["q_split_assign"] = q_split_assign


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (training-data op): per-source
# approximate distinct-document estimate — the cardinality primitive
# behind dedup planning and shard sizing at 100 TB, where exact
# count-distinct shuffles every key.  Built FROM SCRATCH to be
# bit-identical across engines: md5-derived registers, rho from hex
# string algebra (no engine bit intrinsics), register sums as EXACT
# dyadic integers (sum of 2^(57-M) in decimal(38,0) — every term is a
# power of two, so no float fold-order drift), and the final estimate
# rounded to 4 decimals so the one ln()/division step cannot diverge in
# the last ulp.  Flajolet et al. 2007 estimator with the small-range
# correction; p=8 (256 registers).
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 256            # 2^p registers, keyed by the first 2 md5 hex chars
HLL_WBITS = 57         # 14 hex chars of rank material + 1
_HLL_POW = 144115188075855872  # 2^57, the common denominator


def q_hll_distinct(spark, sf_dir):
    """Per-source HLL distinct-text estimate + the exact count to judge
    it against.  Scale shape: ONE partial+final max-agg keyed by
    (source, register) — 256 rows per source cross the wire regardless
    of corpus size — then a tiny per-source fold; the exact-distinct
    column is gate-scale instrumentation (at 100 TB you ship only the
    sketch).  rho = leading zero BITS of the 56-bit suffix + 1, computed
    as 4×(leading '0' hex chars) + a first-nonzero-nibble table."""
    d = _t(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("h"))
    w = F.substring("h", 3, 14)
    stripped = F.expr("TRIM(LEADING '0' FROM substring(h, 3, 14))")
    first = F.substring(stripped, 1, 1)
    extra = (F.when(first.isin("4", "5", "6", "7"), 1)
             .when(first.isin("2", "3"), 2)
             .when(first == "1", 3)
             .otherwise(0))
    rho = (F.when(stripped == "", F.lit(HLL_WBITS))
           .otherwise((F.lit(14) - F.length(stripped)) * 4 + extra + 1))
    regs = (d.select("source", F.substring("h", 1, 2).alias("reg"),
                     rho.alias("rho"),
                     F.col("h").alias("hh"))
            .groupBy("source", "reg")
            .agg(F.max("rho").alias("m_j"),
                 F.count("*").alias("n_rows_reg"),
                 F.countDistinct("hh").alias("n_distinct_reg")))
    per_src = (regs.groupBy("source").agg(
        F.sum("n_rows_reg").cast("long").alias("n_rows"),
        F.sum("n_distinct_reg").cast("long").alias("exact_distinct"),
        F.count("*").cast("long").alias("hll_registers"),
        F.sum(F.expr(f"CAST(POW(CAST(2 AS DOUBLE), "
                     f"{HLL_WBITS} - m_j) AS DECIMAL(38, 0))"))
        .alias("s_seen")))
    # zero registers contribute 2^-0 = 1 → 2^57 each (exact integers)
    s_total = (F.col("s_seen")
               + (F.lit(HLL_M) - F.col("hll_registers"))
               * F.lit(_HLL_POW).cast("decimal(38,0)"))
    v = F.lit(HLL_M) - F.col("hll_registers")
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    raw = (F.lit(alpha * HLL_M * HLL_M)
           * (F.lit(float(_HLL_POW)) / s_total.cast("double")))
    est = (F.when((v > 0) & (raw <= 2.5 * HLL_M),
                  F.lit(float(HLL_M))
                  * F.log(F.lit(float(HLL_M)) / v.cast("double")))
           .otherwise(raw))
    return (per_src.select(
        "source", "n_rows", "exact_distinct", "hll_registers",
        F.round(est, 4).alias("hll_estimate"))
        .orderBy("source"))


ORACLES["q_hll_distinct"] = f"""
    WITH d AS (
      SELECT source, md5(text) AS h FROM documents
    ), r AS (
      SELECT source, substr(h, 1, 2) AS reg, h,
             CASE WHEN ltrim(substr(h, 3, 14), '0') = ''
                  THEN {HLL_WBITS}
                  ELSE (14 - len(ltrim(substr(h, 3, 14), '0'))) * 4
                       + (CASE WHEN substr(ltrim(substr(h, 3, 14), '0'),
                                           1, 1) IN ('4','5','6','7')
                                 THEN 1
                               WHEN substr(ltrim(substr(h, 3, 14), '0'),
                                           1, 1) IN ('2','3') THEN 2
                               WHEN substr(ltrim(substr(h, 3, 14), '0'),
                                           1, 1) = '1' THEN 3
                               ELSE 0 END) + 1 END AS rho
      FROM d
    ), regs AS (
      SELECT source, reg, MAX(rho) AS m_j,
             COUNT(*) AS n_rows_reg,
             COUNT(DISTINCT h) AS n_distinct_reg
      FROM r GROUP BY source, reg
    ), per_src AS (
      SELECT source,
             CAST(SUM(n_rows_reg) AS BIGINT) AS n_rows,
             CAST(SUM(n_distinct_reg) AS BIGINT) AS exact_distinct,
             CAST(COUNT(*) AS BIGINT) AS hll_registers,
             SUM(CAST(POW(CAST(2 AS DOUBLE), {HLL_WBITS} - m_j)
                      AS DECIMAL(38, 0))) AS s_seen
      FROM regs GROUP BY source
    )
    SELECT source, n_rows, exact_distinct, hll_registers,
           ROUND(CASE WHEN ({HLL_M} - hll_registers) > 0
                       AND (CAST({0.7213 / (1.0 + 1.079 / HLL_M)} AS DOUBLE)
                            * {HLL_M} * {HLL_M})
                           * (CAST({_HLL_POW} AS DOUBLE)
                              / CAST(s_seen + ({HLL_M} - hll_registers)
                                     * CAST({_HLL_POW} AS DECIMAL(38, 0))
                                     AS DOUBLE))
                           <= {2.5 * HLL_M}
                  THEN CAST({HLL_M} AS DOUBLE)
                       * ln(CAST({HLL_M} AS DOUBLE)
                            / CAST({HLL_M} - hll_registers AS DOUBLE))
                  ELSE (CAST({0.7213 / (1.0 + 1.079 / HLL_M)} AS DOUBLE)
                        * {HLL_M} * {HLL_M})
                       * (CAST({_HLL_POW} AS DOUBLE)
                          / CAST(s_seen + ({HLL_M} - hll_registers)
                                 * CAST({_HLL_POW} AS DECIMAL(38, 0))
                                 AS DOUBLE))
                  END, 4) AS hll_estimate
    FROM per_src ORDER BY source
"""
RELATIONAL_QUERIES["q_hll_distinct"] = q_hll_distinct


# ---------------------------------------------------------------------------
# BM25 top-k retrieval (training-data op): score documents against a fixed
# query-term set — the retrieval primitive behind decontamination probes,
# eval-set neighbor lookups, and quality spot-checks over a corpus.
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "window", "merge", "vector")
BM25_TOPK = 10


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 (Lucene's +1 idf form) over whitespace tokens:
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1),
    score(d) = Σ_t idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl));
    top-k by rounded score desc, doc_id asc.

    Scale shape: tokens are REDUCED to the query terms per row before
    anything aggregates — tf comes from a per-row higher-order filter
    over the tiny exploded term array (map-only, rows ∝ docs×|q|), df
    is a |q|-row agg that BROADCASTS back, corpus stats are one scalar
    agg, and the only data-sized shuffle keys on doc_id for the final
    per-doc sum.  No posting list, no token explode, no pair join —
    scan-bound at 100 TB with a takeOrdered top-k."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id",
                 F.expr("filter(split(trim(text), ' +'), w -> w != '')")
                 .alias("toks"))
         .select("doc_id", F.size("toks").cast("long").alias("dl"),
                 "toks"))
    stats = d.agg(F.count("*").cast("long").alias("n_docs"),
                  F.avg("dl").alias("avgdl"))
    terms = F.array(*[F.lit(t) for t in BM25_TERMS])
    tf = (d.select("doc_id", "dl", F.explode(terms).alias("term"), "toks")
          .select("doc_id", "dl", "term",
                  F.expr("size(filter(toks, w -> w = term))")
                  .cast("long").alias("tf"))
          .filter(F.col("tf") > 0))
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    k1, b = BM25_K1, BM25_B
    part = (F.log((F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0)
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b
                                   + b * F.col("dl") / F.col("avgdl"))))
    return (tf.join(F.broadcast(df_t), "term")
            .crossJoin(F.broadcast(stats))
            .select("doc_id", part.alias("_s"))
            .groupBy("doc_id")
            .agg(F.round(F.sum("_s"), 6).alias("bm25"))
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(BM25_TOPK))


ORACLES["q_bm25_topk"] = f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), ' +'),
                         w -> w != '') AS toks
      FROM documents
    ), dd AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dd
    ), tf AS (
      SELECT doc_id, dl, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM dd, UNNEST(toks) AS s(t)
      WHERE t IN ('spark', 'window', 'merge', 'vector')
      GROUP BY doc_id, dl, t
    ), dft AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    )
    SELECT tf.doc_id,
           ROUND(SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                     * (tf * ({BM25_K1} + 1.0))
                     / (tf + {BM25_K1} * (1.0 - {BM25_B}
                                          + {BM25_B} * dl / avgdl))), 6)
             AS bm25
    FROM tf JOIN dft USING (term) CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT {BM25_TOPK}
"""
RELATIONAL_QUERIES["q_bm25_topk"] = q_bm25_topk


# ---------------------------------------------------------------------------
# Embedding int8 quantization (training-data op): symmetric max-abs
# quantization of the embedding column — the storage/serving compaction
# step between embedding generation and ANN index build (4x smaller
# vectors; the IVF/SRP operators above consume either form).
# ---------------------------------------------------------------------------

def q_embed_quantize(spark, sf_dir):
    """Symmetric int8 quantization per vector: amax = max|x|,
    q_i = clamp(round(x_i * 127 / amax), ±127), scale = amax/127
    (an all-zero vector quantizes to zeros with scale 0).  The quantize
    expression is written with the IDENTICAL operation order
    (x*127/amax) in both engines so IEEE double rounding matches bit
    for bit.

    Scale shape: pure per-row higher-order expressions — map-only, no
    shuffle, no Python; at 100 TB this is a scan-bound rewrite pass."""
    e = _t(spark, sf_dir, "embeddings")
    amax = ("aggregate(embedding, CAST(0.0 AS DOUBLE), "
            "(a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))")
    q = ("CASE WHEN _amax > 0.0 THEN "
         "transform(embedding, x -> CAST(least(127.0, greatest(-127.0, "
         "round(CAST(x AS DOUBLE) * 127.0 / _amax))) AS INT)) "
         "ELSE transform(embedding, x -> 0) END")
    return (e.select("vec_id", "embedding",
                     F.expr(amax).alias("_amax"))
            .select("vec_id",
                    F.size("embedding").cast("long").alias("dim"),
                    F.round(F.col("_amax") / 127.0, 9).alias("scale"),
                    F.expr(q).alias("qvec")))


ORACLES["q_embed_quantize"] = """
    WITH base AS (
      SELECT vec_id, embedding,
             list_aggregate(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE))), 'max') AS amax
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(amax / 127.0, 9) AS scale,
           CASE WHEN amax > 0.0 THEN
             list_transform(embedding, x -> CAST(least(127.0,
               greatest(-127.0, round(CAST(x AS DOUBLE) * 127.0 / amax)))
               AS INTEGER))
           ELSE list_transform(embedding, x -> 0) END AS qvec
    FROM base
"""
RELATIONAL_QUERIES["q_embed_quantize"] = q_embed_quantize
