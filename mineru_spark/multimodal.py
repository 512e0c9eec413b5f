"""Multimodal column plumbing (task brief: image/audio/video as opaque
binary columns with typed metadata).

The decode step is STUBBED — the sandbox has no image/audio codecs — but
everything Spark-side is real and tested: the schema, the mapInPandas
batch shape, the partition-size discipline for large binary rows, and the
deterministic fake feature extractor standing in for the codec call.

At 100 TB the rules that matter:
- binary payloads ride a dedicated column; metadata (mime, width, dur)
  are ordinary pruned/pushed columns so filters never touch the bytes;
- decode/feature-extract runs in mapInPandas with small Arrow batches
  (same knob as the text payloads — see pipeline.get_spark);
- features come back as array<float> columns, joining the embedding
  pipeline (simsearch) without another pass over the bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("decode_ok", T.BooleanType(), True),
])


def synthesize_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    media_id (sha256 stream), metadata plausible per mime."""
    def gen(batches):
        for pdf in batches:
            rows = {"media_id": [], "mime": [], "width": [], "height": [],
                    "duration_ms": [], "payload": []}
            for i in pdf["id"].astype(int):
                h = hashlib.sha256(f"media-{i}".encode()).digest()
                mime = ("image/png", "audio/wav", "video/mp4")[i % 3]
                rows["media_id"].append(i)
                rows["mime"].append(mime)
                rows["width"].append(64 + (i % 8) * 32 if i % 3 == 0 else None)
                rows["height"].append(64 + (i % 5) * 32 if i % 3 == 0 else None)
                rows["duration_ms"].append(
                    1000 + (i % 60) * 500 if i % 3 else None)
                rows["payload"].append(h * (8 + i % 4))
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["duration_ms"] = out["duration_ms"].astype("Int32")
            yield out

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """STUB codec: a real deployment decodes the container here (PIL /
    torchaudio / pyav).  The deterministic stand-in hashes 64-byte windows
    of the payload into FEATURE_DIM floats so the full Spark plumbing —
    batch shape, schema, downstream joins — is exercised end to end."""
    if not payload:
        raise ValueError("empty payload")
    arr = np.frombuffer(
        hashlib.sha256(payload[:4096]).digest(), dtype=np.uint8
    ).astype(np.float32)
    vec = arr[:FEATURE_DIM] / 255.0
    if mime.startswith("video"):
        vec = vec[::-1].copy()  # pretend frame-sampling differs per modality
    return vec


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (vectorized
    batch in, arrow batch out; per-row failures degrade to decode_ok=False,
    never a job failure)."""
    def run(batches):
        for pdf in batches:
            feats, ok = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                try:
                    feats.append([float(v) for v in
                                  decode_media(payload, mime or "")])
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "mime": pdf["mime"],
                                "feature": feats, "decode_ok": ok})

    return (media.select("media_id", "mime", "payload")
            .mapInPandas(run, schema=FEATURE_SCHEMA))
