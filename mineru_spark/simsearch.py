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


# ---------------------------------------------------------------------------
# k-means (Lloyd's iterations) — embedding clustering for corpus curation
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def _kmeans_init(spark, sf_dir: str) -> list[list[float]]:
    """Deterministic init: the vectors of vec_id 1..K (the same
    fixed-sample discipline as the IVF coarse quantizer — both engines
    derive identical seeds from the data itself)."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = (e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= KMEANS_K))
            .orderBy("vec_id").collect())
    return [[float(v) for v in r["embedding"]] for r in rows]


def _kmeans_argmin_col(cents: list[list[float]]):
    """min(struct(d, ci)) over the centroid set as ONE map-only
    expression: array_min over transform(centroid-literal-array) —
    struct ordering is lexicographic, so the min is (smallest distance,
    then smallest centroid id), exactly the old first-match CASE rule.

    r6 restructure (same optimizer-blowup class as q_ivf_assign): the
    old shape projected K per-centroid distance COLUMNS (each a zip_with
    fold over a 64-literal array) feeding a least(K) and a K-branch
    CASE; projection collapse inlined the giant subtrees into every
    branch and the optimizer spent seconds per iteration walking the
    tree (x_kmeans ~6s warm at sf0.01, mostly planning).  Here every
    distance subtree appears exactly ONCE inside a single higher-order
    expression, the plan stays map-only (no join, no shuffle — the
    property test_kmeans_final_assignment_is_map_only pins), and the
    distance itself is the same left-fold rounded to 9 dp."""
    from pyspark.sql import functions as F

    cents_lit = F.array(*[
        F.struct(F.lit(ci).alias("ci"),
                 F.array(*[F.lit(float(v)) for v in c]).alias("c"))
        for ci, c in enumerate(cents)])

    def dist(carr):
        diff2 = F.zip_with("embedding", carr,
                           lambda x, w: (x.cast("double") - w)
                           * (x.cast("double") - w))
        return F.round(F.aggregate(diff2, F.lit(0.0),
                                   lambda acc, v: acc + v), 9)

    return F.array_min(F.transform(
        cents_lit,
        lambda cent: F.struct(dist(cent["c"]).alias("d"),
                              cent["ci"].alias("ci"))))


def kmeans_assign(spark, sf_dir: str):
    """Lloyd's k-means over the embedding table (training-data op:
    cluster-balanced curation / dedup-by-cluster), KMEANS_ITERS update
    rounds from the deterministic init, returning the final
    (vec_id, cent, dist2) assignment.

    Scale shape per iteration: one narrow partial+final aggregation —
    K×DIM decimal sums + a count per centroid (a few KB) — collected to
    the driver; the embeddings are scanned per iteration and nothing fat
    is cached or collected.  Centroid sums use decimal(30,15): decimal
    addition is EXACT, hence associative, so the result is independent
    of partition order — the property that makes the cross-engine hash
    gate possible (float sums differ in the last ulp per fold order).
    The golden (golden.ensure_golden_kmeans) mirrors every fold order
    and rounding rule in plain Python and must match bit-for-bit."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = _kmeans_init(spark, sf_dir)
    q9 = Decimal("1e-9")
    for _ in range(KMEANS_ITERS):
        assigned = e.select("vec_id", "embedding",
                            _kmeans_argmin_col(cents).alias("m")) \
            .select("vec_id", "embedding",
                    F.col("m.ci").cast("long").alias("cent"))
        sums = (assigned.groupBy("cent")
                .agg(F.count("*").alias("n"),
                     *[F.sum(F.col("embedding")[i].cast("double")
                             .cast("decimal(30,15)")).alias(f"s{i}")
                       for i in range(DIM)])
                .collect())
        by_cent = {int(r["cent"]): r for r in sums}
        new_cents = []
        for ci in range(len(cents)):
            r = by_cent.get(ci)
            if r is None or not r["n"]:
                new_cents.append(cents[ci])  # empty cluster keeps its seed
                continue
            n = Decimal(int(r["n"]))
            new_cents.append([
                float((Decimal(r[f"s{i}"]) / n).quantize(q9, ROUND_HALF_UP))
                for i in range(DIM)])
        cents = new_cents
    return (e.select("vec_id", _kmeans_argmin_col(cents).alias("m"))
            .select("vec_id", F.col("m.ci").cast("long").alias("cent"),
                    F.col("m.d").alias("dist2")))
