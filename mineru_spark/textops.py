"""Corpus text ops that need Python kernels (the SQL-expressible dedup /
quality / token ops live in queries.py with DuckDB oracles).

- document fingerprinting: polynomial rolling hash over the whole text +
  winnowed k-gram fingerprints (the classic local-similarity signature);
  modular exponentiation makes it order-sensitive, which plain SQL can't
  express — driver records the rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

FP_BASE = 257
FP_MOD = (1 << 61) - 1  # Mersenne prime
WINNOW_K = 8            # k-gram length (chars)
WINNOW_W = 16           # winnowing window


def rolling_fingerprint(text: str) -> int:
    """Whole-document polynomial hash (order-sensitive)."""
    h = 0
    for ch in text:
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    return h


def winnow_fingerprints(text: str) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): minimum k-gram hash per
    sliding window → a compact, position-robust fingerprint set."""
    n = len(text)
    if n < WINNOW_K:
        return [rolling_fingerprint(text)] if text else []
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    # rolling k-gram hashes, vectorized with precomputed base powers
    pows = np.array([pow(FP_BASE, WINNOW_K - 1 - i, FP_MOD)
                     for i in range(WINNOW_K)], dtype=np.uint64)
    m = n - WINNOW_K + 1
    hashes = np.zeros(m, dtype=np.uint64)
    for i in range(WINNOW_K):  # K iterations of length-m vector ops
        hashes = (hashes + (codes[i:i + m] * pows[i]) % FP_MOD) % FP_MOD
    if m <= WINNOW_W:
        return [int(hashes.min())]
    # sliding-window minima via stride trick
    from numpy.lib.stride_tricks import sliding_window_view
    mins = sliding_window_view(hashes, WINNOW_W).min(axis=1)
    return sorted({int(v) for v in mins})


@F.pandas_udf(T.LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return pd.Series([rolling_fingerprint(t or "") % (1 << 62) for t in text])


_WINNOW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("fp", T.ArrayType(T.LongType()), True),
    T.StructField("n_fp", T.IntegerType(), True),
])


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document: whole-text rolling hash + winnowed fingerprint set."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(batches):
        for pdf in batches:
            fps = [winnow_fingerprints(t or "") for t in pdf["text"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "fp": fps,
                "n_fp": pd.Series([len(f) for f in fps], dtype="int32"),
            })

    return d.select("doc_id", "text").mapInPandas(run, schema=_WINNOW_SCHEMA)


FP_MAX_DF = 100  # hot-key guard: a fingerprint shared by more documents
                 # than this is corpus boilerplate (shared template/banner),
                 # not a near-dup signal — it would fan out quadratically


def fingerprint_overlap_pairs(spark: SparkSession, sf_dir: str,
                              min_shared: int = 20,
                              max_df: int = FP_MAX_DF) -> DataFrame:
    """Near-dup candidates by shared winnowed fingerprints (explode +
    self-join on fingerprint value — the dedup join shape at scale).

    Scale safety: join keys are document-frequency-capped first (a
    fingerprint held by >max_df docs creates ~df²/2 pairs; boilerplate
    common to 10⁶ docs would make 10¹² rows).  Dropping ubiquitous
    fingerprints loses no near-dup evidence — winnowing emits ~dozens of
    fingerprints per doc, and a true near-dup pair shares many low-df ones."""
    fps = doc_fingerprints(spark, sf_dir)
    w = fps.select("doc_id", F.explode("fp").alias("f"))
    rare = (w.groupBy("f").agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df).select("f"))
    w = w.join(rare, "f")
    a, b = w.alias("a"), w.alias("b")
    return (a.join(b, (F.col("a.f") == F.col("b.f"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("da"),
                     F.col("b.doc_id").alias("db"))
            .agg(F.count("*").cast("long").alias("shared_fp"))
            .filter(F.col("shared_fp") >= min_shared))


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016): learn the top-K merge rules
# from the corpus — the tokenizer-construction step of a training-data
# pipeline.  Iterative like Lloyd's k-means; the cross-engine gate is a
# golden parquet from an independent plain-Python implementation
# (golden.ensure_golden_bpe), so the whole loop is value-hash-checked.
# ---------------------------------------------------------------------------

BPE_MERGES = 12
_EOW = "</w>"   # classic word-end symbol


def _merge_pair_col(col, a: str, bsym: str, merged: str):
    """Greedy left-to-right non-overlapping merge of the symbol pair
    (a, b) inside one symbol array, as a JVM left fold: push each
    symbol unless the accumulator ends with `a` and the symbol is `b`,
    in which case the tail rewrites to the merged token.  Matches the
    reference BPE apply exactly (after a merge the NEW token sits at
    the tail, so an overlapping occurrence cannot re-fire)."""
    return F.aggregate(
        col, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(bsym)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(s))))


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE_MERGES merge rules over the documents corpus.

    Scale shape: the working set is the DISTINCT word-frequency table
    (the standard BPE scalability fact — vocabulary, not corpus,
    bounds the loop), built with ONE explode+count agg; each iteration
    runs one combiner pair-count agg (rows ∝ distinct adjacent pairs),
    collects exactly ONE argmax row to the driver (count DESC, then
    lexicographic (left, right) — the deterministic tie-break the
    golden mirrors), and rewrites the symbol arrays map-only via the
    fold above.  localCheckpoint truncates the per-iteration plan
    growth exactly like the dedup-components loop.  No Python rows
    ever cross the wire."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (docs.select(F.explode(F.split(F.trim("text"), " +"))
                         .alias("w"))
             .where(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("freq"))
             .select(F.concat(F.split(F.col("w"), ""),
                              F.array(F.lit(_EOW))).alias("syms"),
                     "freq"))
    words = words.localCheckpoint()
    rules = []
    for rank in range(1, BPE_MERGES + 1):
        pairs = (words
                 .where(F.size("syms") >= 2)
                 .select(F.explode(F.expr(
                     "transform(sequence(1, size(syms) - 1), "
                     "i -> struct(element_at(syms, i) AS l, "
                     "element_at(syms, i + 1) AS r))")).alias("p"),
                     "freq")
                 .groupBy("p.l", "p.r")
                 .agg(F.sum("freq").alias("n"))
                 .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                 .limit(1).collect())
        if not pairs or pairs[0]["n"] < 2:
            break
        left, right, n = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["n"])
        merged = left + right
        rules.append((rank, left, right, merged, n))
        words = words.select(
            _merge_pair_col(F.col("syms"), left, right, merged)
            .alias("syms"), "freq").localCheckpoint()
    return spark.createDataFrame(
        rules, "merge_rank long, left string, right string, "
               "merged string, pair_count long")
