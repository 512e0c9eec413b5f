"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship: boilerplate-wrap the sf0.001 documents table
                    in deterministic HTML, run the full main-content
                    extraction kernel, return per-doc markdown (the
                    roundtrip-equality query; oracle = SELECT doc_id, text).
queries()         — one entry per implemented operator (SURVEY.md §2.9 +
                    training-data ops + extraction routes).
oracle_sql()      — DuckDB equivalents for every SQL-expressible query;
                    extraction-over-synthetic-transcripts entries are
                    rows-only by nature (non-SQL-expressible kernels).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mineru_spark.queries import RELATIONAL_QUERIES, ORACLES
from mineru_spark.sources.docwrap import roundtrip_check, extract_wrapped_documents


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return roundtrip_check(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Extraction queries over synthetic transcripts (rows-only: the kernels are
# not SQL-expressible; their correctness gate is the pytest golden-equality
# suite against the single-process oracle, tests/test_golden_equality.py)
# ---------------------------------------------------------------------------

def _n_convs_for(sf_dir: str) -> int:
    from mineru_spark.datagen.transcripts import n_convs_for_sf
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.001
    return n_convs_for_sf(sf)


def x_transcripts_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mineru_spark.pipeline import synthesize_transcripts, extract
    df = synthesize_transcripts(spark, _n_convs_for(sf_dir))
    return extract(df).select("conv_id", "turn_idx", "route", "md",
                              "blocks_classified", "boilerplate_dropped",
                              "ocr_fallback")


def x_transcripts_route_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mineru_spark.pipeline import synthesize_transcripts, extract
    df = synthesize_transcripts(spark, _n_convs_for(sf_dir))
    return (extract(df).groupBy("route")
            .agg(F.count("*").cast("long").alias("n_turns"),
                 F.sum("blocks_classified").cast("long").alias("blocks"),
                 F.sum("boilerplate_dropped").cast("long").alias("boilerplate"),
                 F.sum("ocr_fallback").cast("long").alias("ocr_fallback")))


def x_docwrap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundtrip_check(spark, sf_dir)


def x_docwrap_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (extract_wrapped_documents(spark, sf_dir)
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_blocks").cast("long").alias("n_blocks"),
                 F.sum("boilerplate_dropped").cast("long")
                 .alias("boilerplate_dropped")))


def x_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed document fingerprints (order-sensitive rolling hashes —
    not SQL-expressible; rows-only check)."""
    from mineru_spark.textops import doc_fingerprints
    return doc_fingerprints(spark, sf_dir).select("doc_id", "n_fp")


def x_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mineru_spark.textops import fingerprint_overlap_pairs
    return fingerprint_overlap_pairs(spark, sf_dir)


def x_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing: synthesize media, extract
    deterministic stub features via mapInPandas (rows-only check)."""
    from mineru_spark.multimodal import synthesize_media, extract_features
    n = max(50, _n_convs_for(sf_dir) // 4)
    return (extract_features(synthesize_media(spark, n))
            .select("media_id", "mime", "decode_ok"))


def x_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k (scale path; brute-force baseline is the
    oracle-checked q_embed_cosine_topk)."""
    from mineru_spark.simsearch import ann_topk
    return ann_topk(spark, sf_dir, k=10, radius=2)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)
    out["x_docwrap_roundtrip"] = x_docwrap_roundtrip
    out["x_docwrap_metrics"] = x_docwrap_metrics
    out["x_transcripts_extract"] = x_transcripts_extract
    out["x_transcripts_route_metrics"] = x_transcripts_route_metrics
    out["x_doc_fingerprints"] = x_doc_fingerprints
    out["x_fingerprint_pairs"] = x_fingerprint_pairs
    out["x_media_features"] = x_media_features
    out["x_ann_topk"] = x_ann_topk
    return out


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
