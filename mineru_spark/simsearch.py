"""Embedding similarity search (task brief: ANN over array<float>).

Two paths over the ``embeddings`` table:

- brute-force cosine top-k (queries.q_embed_cosine_topk): exact, JVM-side
  higher-order array functions; the correctness baseline, O(N·d) per query.
- LSH-bucketed ANN (here): sign-random-projection bucketing.  Hyperplanes
  are DETERMINISTIC pseudo-vectors seeded by (plane index, dim index) via
  md5 — no RNG state, so every executor derives identical planes and the
  signature is a pure column expression (no shuffle to share planes, no
  broadcast of a model object).  At scale the bucket key becomes the
  partition/bucketing key: candidate generation is an equi-join on
  signature prefix instead of a cartesian pass.

On isotropic data (like the synthetic embeddings: top-10 cosine ≈ 0.3,
i.e. per-plane flip probability ≈ 0.4) SRP-LSH cannot give high absolute
recall at small scan fractions — the honest metric is ENRICHMENT: the
probed buckets must contain true neighbors at a higher rate than a random
sample of equal size.  tests/test_simsearch_multimodal.py asserts
enrichment over many queries; brute force stays the exact baseline.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# Near-dup banding signature: N_PLANES bits split into SRP_BANDS bands of
# SRP_BAND_BITS each (MinHash-style OR-of-ANDs).  Per-(band, value) bucket
# size is ~N / 2^SRP_BAND_BITS, so the near-pair self-join is bounded —
# at larger corpus N, raise N_PLANES and SRP_BANDS together (band width
# stays the knob that bounds bucket size; the round-2 fixed-64-bucket
# signature degenerated to ~N²/64 pairs).
N_PLANES = 16
SRP_BANDS = 2
SRP_BAND_BITS = N_PLANES // SRP_BANDS
# Multi-probe ANN bucket width: 2^ANN_PLANES buckets, sized to the corpus
# (≈ log2(N / target bucket size)); the first ANN_PLANES planes of the
# shared deterministic family.  At production N this rises with log N.
ANN_PLANES = 6
DIM = 64


def _plane(p: int, dim: int = DIM) -> np.ndarray:
    """Deterministic unit hyperplane p: components from md5(p, j)."""
    vals = []
    for j in range(dim):
        h = hashlib.md5(f"plane|{p}|{j}".encode()).digest()
        u = int.from_bytes(h[:8], "big") / 2**64  # [0,1)
        vals.append(u * 2.0 - 1.0)
    v = np.array(vals, dtype=np.float64)
    return v / np.linalg.norm(v)


_PLANES = np.stack([_plane(p) for p in range(N_PLANES)])  # (P, DIM)


def signature_col(emb_col: str = "embedding", n_planes: int = N_PLANES):
    """LSH signature as a pure Column expression: bit p = sign(x·plane_p).
    Stays JVM-side (aggregate over zip_with) — no Python in the bucketing
    path, so bucket assignment is whole-stage-codegen'd at scale."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in _PLANES[p]])
        dot = F.aggregate(
            F.zip_with(F.col(emb_col), plane,
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, v: acc + v)
        sig = sig + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return sig


def band_cols(sig, bands: int = SRP_BANDS, bits: int = SRP_BAND_BITS):
    """(band_idx, band_value) structs for the banded near-dup join; pure
    bit arithmetic on the signature column (JVM-side)."""
    return [F.struct(
        F.lit(i).cast("int").alias("bi"),
        F.shiftright(sig, i * bits)
        .bitwiseAND(F.lit((1 << bits) - 1)).cast("long").alias("bv"))
        for i in range(bands)]


def query_signature(query_vec: list[float],
                    n_planes: int = N_PLANES) -> int:
    dots = _PLANES[:n_planes] @ np.array(query_vec, dtype=np.float64)
    return sum(1 << p for p in range(n_planes) if dots[p] > 0)


def probe_set(qsig: int, radius: int = 1,
              n_planes: int = N_PLANES) -> list[int]:
    """All signatures within hamming distance ≤ radius (multi-probe LSH)."""
    probes = {qsig}
    for r in range(1, radius + 1):
        for combo in itertools.combinations(range(n_planes), r):
            s = qsig
            for b in combo:
                s ^= 1 << b
            probes.add(s)
    return sorted(probes)


def bucketed_candidates(emb: DataFrame, query_vec: list[float],
                        radius: int = 1,
                        n_planes: int = ANN_PLANES) -> DataFrame:
    """Rows whose ANN-width signature lies within hamming ≤ radius of the
    query's bucket.  At scale `lsh_sig` is a precomputed/bucketed column
    and this filter is a partition-pruned scan, not a full pass."""
    probes = probe_set(query_signature(query_vec, n_planes), radius,
                       n_planes)
    with_sig = emb.withColumn("lsh_sig", signature_col(n_planes=n_planes))
    return with_sig.filter(F.col("lsh_sig").isin(probes))


def ann_topk(spark: SparkSession, sf_dir: str, k: int = 10,
             query_vec_id: int = 0, radius: int = 1) -> DataFrame:
    """LSH-bucketed cosine top-k: exact cosine only inside the probed
    buckets (the scale path: candidates ≪ N)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == query_vec_id) \
        .select("embedding").first()
    qvec = [float(v) for v in qrow["embedding"]]
    cand = bucketed_candidates(emb.filter(F.col("vec_id") != query_vec_id),
                               qvec, radius=radius)
    qn = float(np.linalg.norm(np.array(qvec)))
    qcol = F.array(*[F.lit(v) for v in qvec])
    dot = F.aggregate(F.zip_with("embedding", qcol,
                                 lambda x, y: x.cast("double") * y),
                      F.lit(0.0), lambda a, v: a + v)
    norm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v))
    return (cand.select("vec_id", "label",
                        F.round(dot / (norm * F.lit(qn)), 6).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


def brute_topk_ids(spark: SparkSession, sf_dir: str, k: int = 10,
                   query_vec_id: int = 0) -> list[int]:
    """Driver-side exact baseline for recall measurement (test-only)."""
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = mat[pdf.index[pdf["vec_id"] == query_vec_id][0]]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.argsort(-cos, kind="stable")
    ids = [int(pdf["vec_id"].iloc[i]) for i in order
           if int(pdf["vec_id"].iloc[i]) != query_vec_id]
    return ids[:k]
