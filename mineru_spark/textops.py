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
