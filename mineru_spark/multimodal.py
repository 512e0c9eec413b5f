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
    """Deterministic media table via the shared :func:`build_payload`
    (below): payload bodies are a sha256 stream of media_id, wrapped in
    REAL PNG/JPEG/WAV/MP4 containers so the header prober exercises
    genuine parsing; metadata columns carry the container's true values
    (every 23rd row's payload is corrupted — metadata then disagrees
    with the bytes, the validation case)."""
    def gen(batches):
        for pdf in batches:
            rows = {"media_id": [], "mime": [], "width": [], "height": [],
                    "duration_ms": [], "payload": []}
            for i in pdf["id"].astype(int):
                mime, payload, w, h, dur = build_payload(int(i))
                rows["media_id"].append(i)
                rows["mime"].append(mime)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(dur)
                rows["payload"].append(payload)
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


# ---------------------------------------------------------------------------
# Container-header probing (REAL byte parsing — no codecs needed)
# ---------------------------------------------------------------------------
#
# The decode of pixels/samples stays stubbed (no codec libs in the
# sandbox), but the CONTAINER layer is genuine: synthesized payloads
# carry real PNG/JPEG/WAV/MP4 headers, and probe_media parses them with
# pure stdlib byte arithmetic — the media analog of the reference's
# ingest byte-signature sniff (guess_suffix_by_bytes,
# mineru/utils/guess_suffix_or_lang.py:87) extended with the
# dimension/duration fields an ingest pipeline indexes on.

import struct
import zlib


def _png_bytes(width: int, height: int, body: bytes) -> bytes:
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + chunk
           + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF))
    idat = b"IDAT" + body
    png += struct.pack(">I", len(body)) + idat \
        + struct.pack(">I", zlib.crc32(idat) & 0xFFFFFFFF)
    iend = b"IEND"
    png += struct.pack(">I", 0) + iend \
        + struct.pack(">I", zlib.crc32(iend) & 0xFFFFFFFF)
    return png


def _jpeg_bytes(width: int, height: int, body: bytes) -> bytes:
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 3) \
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
            + b"\xff\xda" + struct.pack(">H", 4) + b"\x00\x00"
            + body.replace(b"\xff", b"\xfe")  # no stray markers in scan
            + b"\xff\xd9")


_WAV_RATE = 16000
_WAV_BPS = 2  # 16-bit mono PCM


def _wav_bytes(duration_ms: int, body: bytes) -> bytes:
    byte_rate = _WAV_RATE * _WAV_BPS
    n_data = duration_ms * byte_rate // 1000
    data = (body * (n_data // max(len(body), 1) + 1))[:n_data]
    fmt = struct.pack("<HHIIHH", 1, 1, _WAV_RATE, byte_rate, _WAV_BPS,
                      8 * _WAV_BPS)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


_MP4_TIMESCALE = 1000


def _mp4_bytes(duration_ms: int, body: bytes) -> bytes:
    def box(kind: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + kind + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
    mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, _MP4_TIMESCALE,
                                    duration_ms * _MP4_TIMESCALE // 1000)
               + b"\x00" * 80)
    return ftyp + box(b"moov", mvhd) + box(b"mdat", body)


def build_payload(i: int) -> tuple[str, bytes, int | None, int | None,
                                   int | None]:
    """Single source of truth for the synthetic media row ``i``:
    (mime, payload, width, height, duration_ms).  Payload bodies are the
    deterministic sha256 stream; the CONTAINERS are real, so the header
    prober below exercises genuine parsing.  Every 23rd row is corrupted
    (truncated header) to exercise the degrade path."""
    h = hashlib.sha256(f"media-{i}".encode()).digest()
    body = h * (8 + i % 4)
    mime = ("image/png", "audio/wav", "video/mp4", "image/jpeg")[i % 4]
    if mime == "image/png":
        w, ht, dur = 64 + (i % 8) * 32, 64 + (i % 5) * 32, None
        payload = _png_bytes(w, ht, body)
    elif mime == "image/jpeg":
        w, ht, dur = 32 + (i % 6) * 16, 32 + (i % 7) * 16, None
        payload = _jpeg_bytes(w, ht, body)
    elif mime == "audio/wav":
        w = ht = None
        dur = 1000 + (i % 60) * 500
        payload = _wav_bytes(dur, body)
    else:
        w = ht = None
        dur = 2000 + (i % 120) * 250
        payload = _mp4_bytes(dur, body)
    if i % 23 == 11:
        payload = payload[:7]  # corrupted: magic truncated
    return mime, payload, w, ht, dur


def probe_media(payload) -> dict:
    """Sniff + parse the container header with pure byte arithmetic:
    magic signature → mime, then PNG IHDR / JPEG SOFn scan / WAV RIFF
    fmt+data / MP4 mvhd for dimensions and duration.  Unknown or
    truncated input degrades to mime=None — never raises (job-level
    guarantee for hostile bytes)."""
    out = {"mime": None, "width": None, "height": None, "duration_ms": None}
    try:
        b = bytes(payload or b"")
        if b.startswith(b"\x89PNG\r\n\x1a\n") and len(b) >= 24 \
                and b[12:16] == b"IHDR":
            out["mime"] = "image/png"
            out["width"], out["height"] = struct.unpack(">II", b[16:24])
        elif b.startswith(b"\xff\xd8"):
            out["mime"] = "image/jpeg"
            pos = 2
            while pos + 4 <= len(b) and b[pos] == 0xFF:
                marker, seglen = b[pos + 1], struct.unpack(
                    ">H", b[pos + 2:pos + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                             0xCC):
                    if pos + 9 <= len(b):
                        out["height"], out["width"] = struct.unpack(
                            ">HH", b[pos + 5:pos + 9])
                    break
                if marker == 0xDA:
                    break  # entropy-coded scan: no SOF before it
                pos += 2 + seglen
        elif b.startswith(b"RIFF") and b[8:12] == b"WAVE":
            out["mime"] = "audio/wav"
            pos = 12
            byte_rate = None
            while pos + 8 <= len(b):
                kind = b[pos:pos + 4]
                size = struct.unpack("<I", b[pos + 4:pos + 8])[0]
                if kind == b"fmt " and pos + 24 <= len(b):
                    byte_rate = struct.unpack("<I", b[pos + 16:pos + 20])[0]
                elif kind == b"data" and byte_rate:
                    out["duration_ms"] = size * 1000 // byte_rate
                    break
                pos += 8 + size + (size & 1)
        elif len(b) >= 12 and b[4:8] == b"ftyp":
            out["mime"] = "video/mp4"

            def find_box(lo: int, hi: int, kind: bytes) -> tuple[int, int]:
                pos = lo
                while pos + 8 <= hi:
                    size = struct.unpack(">I", b[pos:pos + 4])[0]
                    if size < 8:
                        break
                    if b[pos + 4:pos + 8] == kind:
                        return pos + 8, min(pos + size, hi)
                    pos += size
                return -1, -1

            mlo, mhi = find_box(0, len(b), b"moov")
            if mlo >= 0:
                hlo, hhi = find_box(mlo, mhi, b"mvhd")
                if hlo >= 0 and hlo + 20 <= len(b):
                    ts, dur = struct.unpack(">II", b[hlo + 12:hlo + 20])
                    if ts:
                        out["duration_ms"] = dur * 1000 // ts
    except Exception:
        pass  # hostile bytes: partial fields stay None
    return out


def probe_features(media: DataFrame) -> DataFrame:
    """mapInPandas header probe over binary payloads: returns the parsed
    (mime_sniffed, width, height, duration_ms) plus meta_match — whether
    the sniffed metadata agrees with the table's metadata columns (the
    validation pass an ingest pipeline runs before trusting upstream
    metadata)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime_sniffed", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("meta_match", T.BooleanType(), True),
    ])

    def run(batches):
        for pdf in batches:
            rows = {k.name: [] for k in schema.fields}
            # column zip, not iterrows — iterrows builds a Series per row
            # (10-100x slower) in the distributed hot path
            for mid, mime, w, h, dur, payload in zip(
                    pdf["media_id"], pdf["mime"], pdf["width"],
                    pdf["height"], pdf["duration_ms"], pdf["payload"]):
                p = probe_media(payload)
                match = (p["mime"] == mime
                         and p["width"] == (None if pd.isna(w) else int(w))
                         and p["height"] == (None if pd.isna(h)
                                             else int(h))
                         and p["duration_ms"] == (None if pd.isna(dur)
                                                  else int(dur)))
                rows["media_id"].append(int(mid))
                rows["mime_sniffed"].append(p["mime"])
                rows["width"].append(p["width"])
                rows["height"].append(p["height"])
                rows["duration_ms"].append(p["duration_ms"])
                rows["meta_match"].append(bool(match))
            out = pd.DataFrame(rows)
            for c in ("width", "height", "duration_ms"):
                out[c] = out[c].astype("Int32")
            yield out

    return (media.select("media_id", "mime", "width", "height",
                         "duration_ms", "payload")
            .mapInPandas(run, schema=schema))
