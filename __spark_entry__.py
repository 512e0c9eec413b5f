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
# Extraction queries over synthetic transcripts.  The kernels are not
# SQL-expressible, so their DuckDB oracle is a MATERIALIZED one
# (mineru_spark/golden.py): the single-process oracle kernel — the same
# contract the pytest golden-equality suite anchors byte-for-byte — written
# to parquet at sf0.01; oracle_sql() reads it via read_parquet.  The driver
# gate thus verifies that the DISTRIBUTED path (Arrow batching, salting,
# conv-grouped finalize, ordering) reproduces the single-process result for
# every route.
# ---------------------------------------------------------------------------

def _n_convs_for(sf_dir: str) -> int:
    from mineru_spark.datagen.transcripts import n_convs_for_sf
    from mineru_spark.golden import sf_of_dir
    return n_convs_for_sf(sf_of_dir(sf_dir))


def _extract_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mineru_spark.pipeline import extract_finalized, synthesize_transcripts
    df = synthesize_transcripts(spark, _n_convs_for(sf_dir))
    return extract_finalized(df)


def x_transcripts_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mineru_spark.golden import ORACLE_SF, ensure_golden_extract
    ensure_golden_extract(ORACLE_SF)
    return _extract_finalized(spark, sf_dir) \
        .select("conv_id", "turn_idx", "route", "md", "md_nlp",
                "content_list", "content_list_v2", "middle",
                "blocks_classified", "boilerplate_dropped",
                "ocr_fallback", "para_merged", "tables_merged",
                "spans_need_ocr")


def x_transcripts_route_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mineru_spark.golden import ORACLE_SF, ensure_golden_extract
    ensure_golden_extract(ORACLE_SF)
    return (_extract_finalized(spark, sf_dir).groupBy("route")
            .agg(F.count("*").cast("long").alias("n_turns"),
                 F.sum("blocks_classified").cast("long").alias("blocks"),
                 F.sum("boilerplate_dropped").cast("long").alias("boilerplate"),
                 F.sum("ocr_fallback").cast("long").alias("ocr_fallback"),
                 F.sum("para_merged").cast("long").alias("para_merged"),
                 F.sum("tables_merged").cast("long").alias("tables_merged"),
                 F.sum("spans_need_ocr").cast("long")
                 .alias("spans_need_ocr")))


def x_docwrap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundtrip_check(spark, sf_dir)


def x_docwrap_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mineru_spark.golden import ensure_golden_docwrap
    ensure_golden_docwrap(_oracle_sf_dir(sf_dir))
    return (extract_wrapped_documents(spark, sf_dir)
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_blocks").cast("long").alias("n_blocks"),
                 F.sum("boilerplate_dropped").cast("long")
                 .alias("boilerplate_dropped")))


def x_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed document fingerprints (order-sensitive rolling hashes —
    not SQL-expressible; oracle = single-process numpy golden)."""
    from mineru_spark.golden import ensure_golden_fingerprints
    from mineru_spark.textops import doc_fingerprints
    ensure_golden_fingerprints(_oracle_sf_dir(sf_dir))
    return doc_fingerprints(spark, sf_dir).select("doc_id", "n_fp")


def x_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair join over winnowed fingerprints; DuckDB INDEPENDENTLY recomputes
    the df-cap + self-join + overlap count from the golden fp arrays."""
    from mineru_spark.golden import ensure_golden_fingerprints
    from mineru_spark.textops import fingerprint_overlap_pairs
    ensure_golden_fingerprints(_oracle_sf_dir(sf_dir))
    return fingerprint_overlap_pairs(spark, sf_dir)


def x_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing: synthesize media, extract
    deterministic stub features via mapInPandas."""
    from mineru_spark.golden import ORACLE_SF, ensure_golden_media
    from mineru_spark.datagen.transcripts import n_convs_for_sf
    from mineru_spark.multimodal import synthesize_media, extract_features
    ensure_golden_media(max(50, n_convs_for_sf(ORACLE_SF) // 4))
    n = max(50, _n_convs_for(sf_dir) // 4)
    return (extract_features(synthesize_media(spark, n))
            .select("media_id", "mime", "decode_ok"))


def x_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-header probe over binary media payloads: REAL byte
    parsing (PNG IHDR / JPEG SOF / WAV RIFF / MP4 mvhd) + metadata
    validation; oracle = single-process run of the same prober
    (golden.ensure_golden_probe)."""
    from mineru_spark.golden import ORACLE_SF, ensure_golden_probe
    from mineru_spark.multimodal import probe_features, synthesize_media
    n = max(50, _n_convs_for(sf_dir) // 4)
    from mineru_spark.datagen.transcripts import n_convs_for_sf
    ensure_golden_probe(max(50, n_convs_for_sf(ORACLE_SF) // 4))
    return probe_features(synthesize_media(spark, n))


def x_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means final assignment (iterative algorithm; oracle =
    independent Python reimplementation with exact-decimal centroid sums,
    golden.ensure_golden_kmeans)."""
    from mineru_spark.golden import ensure_golden_kmeans
    from mineru_spark.simsearch import kmeans_assign
    ensure_golden_kmeans(_oracle_sf_dir(sf_dir))
    return kmeans_assign(spark, sf_dir)


def x_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k (scale path; brute-force baseline is the
    oracle-checked q_embed_cosine_topk).  Oracle = independent numpy
    reimplementation of signature/probe/fold-cosine."""
    from mineru_spark.golden import ensure_golden_ann
    from mineru_spark.simsearch import ann_topk
    ensure_golden_ann(_oracle_sf_dir(sf_dir), k=10, radius=2)
    return ann_topk(spark, sf_dir, k=10, radius=2)


def x_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training (iterative argmax loop; oracle = independent
    plain-Python Sennrich-style trainer, golden.ensure_golden_bpe)."""
    from mineru_spark.golden import ensure_golden_bpe
    from mineru_spark.textops import bpe_train_merges
    ensure_golden_bpe(_oracle_sf_dir(sf_dir))
    return bpe_train_merges(spark, sf_dir)


def _oracle_sf_dir(sf_dir: str) -> str:
    """The directory golden oracles are built from: oracle_sql() strings are
    static and pinned to sf0.01 (the driver's correctness scale), so golden
    inputs must come from the sf0.01 tables when they exist; fall back to
    the requested dir for ad-hoc runs."""
    import os
    pinned = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    return pinned if os.path.isdir(pinned) else sf_dir


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
    out["x_kmeans"] = x_kmeans
    out["x_media_probe"] = x_media_probe
    out["x_bpe_merges"] = x_bpe_merges
    return out


def oracle_sql() -> dict[str, str]:
    import os

    from mineru_spark.datagen.transcripts import n_convs_for_sf
    from mineru_spark.golden import (ORACLE_SF, ensure_golden_ann,
                                     ensure_golden_docwrap,
                                     ensure_golden_extract,
                                     ensure_golden_fingerprints,
                                     ensure_golden_kmeans,
                                     ensure_golden_media, golden_path)
    from mineru_spark.textops import FP_MAX_DF

    out = dict(ORACLES)
    # make sure the goldens exist regardless of whether the driver runs the
    # SQL or the Spark query first (cached by source hash — a no-op after
    # the first build of a given code state)
    sf01 = "/root/testdata/sf0.01"
    try:
        ensure_golden_extract(ORACLE_SF)
        ensure_golden_media(max(50, n_convs_for_sf(ORACLE_SF) // 4))
        if os.path.isdir(sf01):
            ensure_golden_docwrap(sf01)
            ensure_golden_fingerprints(sf01)
            ensure_golden_ann(sf01, k=10, radius=2)
            ensure_golden_kmeans(sf01)
            from mineru_spark.golden import ensure_golden_bpe
            ensure_golden_bpe(sf01)
    except Exception:
        pass  # each query function also ensures its own golden

    out["x_transcripts_extract"] = f"""
        SELECT conv_id, turn_idx, route, md, md_nlp, content_list,
               content_list_v2, middle, blocks_classified,
               boilerplate_dropped, ocr_fallback, para_merged,
               tables_merged, spans_need_ocr
        FROM read_parquet('{golden_path("golden_extract")}')"""
    out["x_transcripts_route_metrics"] = f"""
        SELECT route, CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(SUM(blocks_classified) AS BIGINT) AS blocks,
               CAST(SUM(boilerplate_dropped) AS BIGINT) AS boilerplate,
               CAST(SUM(ocr_fallback) AS BIGINT) AS ocr_fallback,
               CAST(SUM(para_merged) AS BIGINT) AS para_merged,
               CAST(SUM(tables_merged) AS BIGINT) AS tables_merged,
               CAST(SUM(spans_need_ocr) AS BIGINT) AS spans_need_ocr
        FROM read_parquet('{golden_path("golden_extract")}')
        GROUP BY route"""
    out["x_docwrap_metrics"] = f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_blocks) AS BIGINT) AS n_blocks,
               CAST(SUM(boilerplate_dropped) AS BIGINT) AS boilerplate_dropped
        FROM read_parquet('{golden_path("golden_docwrap")}')"""
    out["x_doc_fingerprints"] = f"""
        SELECT doc_id, n_fp
        FROM read_parquet('{golden_path("golden_fingerprints")}')"""
    # the pair query is recomputed RELATIONALLY by DuckDB from the golden
    # per-doc arrays — an independent check of the df-cap + join + count
    out["x_fingerprint_pairs"] = f"""
        WITH w AS (
          SELECT doc_id, unnest(fp) AS f
          FROM read_parquet('{golden_path("golden_fingerprints")}')
        ), rare AS (
          SELECT f FROM w GROUP BY f HAVING COUNT(*) <= {FP_MAX_DF}
        ), wr AS (
          SELECT w.doc_id, w.f FROM w JOIN rare USING (f)
        )
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(COUNT(*) AS BIGINT) AS shared_fp
        FROM wr a JOIN wr b ON a.f = b.f AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= 20"""
    out["x_media_features"] = f"""
        SELECT media_id, mime, decode_ok
        FROM read_parquet('{golden_path("golden_media")}')"""
    out["x_ann_topk"] = f"""
        SELECT vec_id, label, cos
        FROM read_parquet('{golden_path("golden_ann")}')"""
    out["x_kmeans"] = f"""
        SELECT vec_id, cent, dist2
        FROM read_parquet('{golden_path("golden_kmeans")}')"""
    out["x_bpe_merges"] = f"""
        SELECT merge_rank, "left", "right", merged, pair_count
        FROM read_parquet('{golden_path("golden_bpe")}')"""
    out["x_media_probe"] = f"""
        SELECT media_id, mime_sniffed, width, height, duration_ms,
               meta_match
        FROM read_parquet('{golden_path("golden_probe")}')"""
    return out
