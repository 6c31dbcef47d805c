"""Multimodal column plumbing (training-pipeline graft).

Images/audio/video are opaque `binary` columns with typed metadata.
The Spark-side plumbing — schema, partition-preserving mapInPandas,
Arrow batch shapes — is real and tested; the actual codec decode is
stubbed behind NotImplementedError (no image/audio libs in this
container) with a deterministic fake used for tests/oracles.

At 100 TB: binary payloads dominate row size, so the decode stage is
mapInPandas (streaming batches, no pivot/shuffle), metadata-only
projections never touch the binary column (Parquet column pruning),
and feature outputs are separate narrow tables keyed by doc_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (here: utf-8 of text — stands in
    for an image/audio blob; byte-exactness is the per-row invariant)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "UTF-8"))


def decode_image(payload: bytes) -> np.ndarray:
    """REAL decode — requires an image codec, not shipped here."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode_meta for the deterministic test double"
    )


def fake_decode_meta(n_bytes: np.ndarray):
    """Deterministic fake decode: metadata derived from byte length
    (pure integer arithmetic, mirrored by the SQL oracle)."""
    n = np.asarray(n_bytes, dtype=np.int64)
    width = 16 + n % 624
    height = 16 + (n * 7) % 464
    n_frames = 1 + n % 24
    return width, height, n_frames


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, width, height, n_frames) via mapInPandas over
    the payload column — the decode/feature-extract stage shape."""
    payloads = with_payload(docs).select("doc_id", "payload")

    def fn(batches):
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).to_numpy(np.int64)
            w, h, fr = fake_decode_meta(n_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": w,
                    "height": h,
                    "n_frames": fr,
                }
            )

    return payloads.mapInPandas(
        fn,
        schema="doc_id long, n_bytes long, width long, height long, n_frames long",
    )


def sql_multimodal_meta() -> str:
    return """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  16 + octet_length(encode(text)) % 624 AS width,
  16 + (octet_length(encode(text)) * 7) % 464 AS height,
  1 + octet_length(encode(text)) % 24 AS n_frames
FROM documents
"""


FRAME_EVERY = 8
RESIZE_TARGET = 224
FRAME_HASH_MOD = 1000003


def sample_frames(
    docs: DataFrame, every: int = FRAME_EVERY, target: int = RESIZE_TARGET
) -> DataFrame:
    """Frame-sampling + resize plumbing (the video/image branch of the
    training pipeline): one blob row explodes to its sampled frames
    (every `every`-th of n_frames), each with aspect-preserving resize
    dims toward `target` and a per-frame fingerprint. The EXPLODE
    SHAPE is the real thing — streaming mapInPandas batches, numpy
    repeat, no shuffle, payload column pruned when not projected; the
    pixel work is the deterministic fake (codecs not shipped),
    mirrored exactly by the SQL oracle."""
    payloads = with_payload(docs).select("doc_id", "payload")
    ev = int(every)
    tgt = float(target)

    def fn(batches):
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).to_numpy(np.int64)
            w, h, fr = fake_decode_meta(n_bytes)
            doc_id = pdf["doc_id"].to_numpy(np.int64)
            n_sampled = (fr + ev - 1) // ev
            d_rep = np.repeat(doc_id, n_sampled)
            w_rep = np.repeat(w, n_sampled)
            h_rep = np.repeat(h, n_sampled)
            starts = np.concatenate([[0], np.cumsum(n_sampled)[:-1]])
            fidx = (
                np.arange(int(n_sampled.sum()), dtype=np.int64)
                - np.repeat(starts, n_sampled)
            ) * ev
            scale = np.minimum(tgt / w_rep, tgt / h_rep)
            out_w = np.maximum(1, np.floor(w_rep * scale)).astype(np.int64)
            out_h = np.maximum(1, np.floor(h_rep * scale)).astype(np.int64)
            fhash = (d_rep * 31 + fidx * 17) % FRAME_HASH_MOD
            yield pd.DataFrame(
                {
                    "doc_id": d_rep,
                    "frame_idx": fidx,
                    "out_w": out_w,
                    "out_h": out_h,
                    "frame_hash": fhash,
                }
            )

    return payloads.mapInPandas(
        fn,
        schema=(
            "doc_id long, frame_idx long, out_w long, out_h long, "
            "frame_hash long"
        ),
    )


def sql_sample_frames(
    every: int = FRAME_EVERY, target: int = RESIZE_TARGET
) -> str:
    nb = "octet_length(encode(text))"
    max_sampled = (24 + every - 1) // every  # n_frames <= 24
    return f"""
WITH meta AS (
  SELECT doc_id,
    16 + {nb} % 624 AS w,
    16 + ({nb} * 7) % 464 AS h,
    1 + {nb} % 24 AS n_frames
  FROM documents
),
fr AS (
  SELECT doc_id, w, h, CAST(r.range AS BIGINT) * {every} AS frame_idx
  FROM meta, range({max_sampled}) r
  WHERE CAST(r.range AS BIGINT) * {every} < n_frames
),
sc AS (
  SELECT *, LEAST(CAST('{float(target)}' AS DOUBLE) / CAST(w AS DOUBLE),
                  CAST('{float(target)}' AS DOUBLE) / CAST(h AS DOUBLE))
            AS scale
  FROM fr
)
SELECT doc_id, frame_idx,
  CAST(GREATEST(1, FLOOR(CAST(w AS DOUBLE) * scale)) AS BIGINT) AS out_w,
  CAST(GREATEST(1, FLOOR(CAST(h AS DOUBLE) * scale)) AS BIGINT) AS out_h,
  (doc_id * 31 + frame_idx * 17) % {FRAME_HASH_MOD} AS frame_hash
FROM sc
"""


# ---------------------------------------------------------------------------
# deterministic binary CONTAINER format — real byte-level plumbing.
# payload = b"GKMM" | u32le width | u32le height | u16le n_frames |
#           u32le sample_rate | body (utf-8 text). The builder derives
# header values from doc_id by closed forms (mirrored in SQL); the
# parser reads them back BYTE-WISE with numpy frombuffer — the real
# shape of a media-container header scan, minus only the codec.

_MAGIC = b"GKMM"
_HEADER_LEN = 4 + 4 + 4 + 2 + 4


def container_header_fields(doc_id: np.ndarray):
    """Closed-form header values (mirrored by the SQL oracle)."""
    d = np.asarray(doc_id, dtype=np.int64)
    width = 16 + (d * 37) % 624
    height = 16 + (d * 91) % 464
    n_frames = 1 + (d * 13) % 24
    sample_rate = 8000 + (d % 5) * 8000
    return width, height, n_frames, sample_rate


def build_container(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): serialize the container for each document —
    vectorized struct packing via numpy byte views, one mapInPandas
    pass (the write half of the multimodal plumbing)."""
    src = docs.select("doc_id", "text")

    def fn(batches):
        for pdf in batches:
            d = pdf["doc_id"].to_numpy(np.int64)
            w, h, fr, sr = container_header_fields(d)
            payloads = []
            for i, t in enumerate(pdf["text"]):
                hdr = np.zeros(1, dtype=[
                    ("magic", "S4"), ("w", "<u4"), ("h", "<u4"),
                    ("fr", "<u2"), ("sr", "<u4"),
                ])
                hdr["magic"] = _MAGIC
                hdr["w"] = w[i]
                hdr["h"] = h[i]
                hdr["fr"] = fr[i]
                hdr["sr"] = sr[i]
                payloads.append(hdr.tobytes() + (t or "").encode("utf-8"))
            yield pd.DataFrame({"doc_id": d, "payload": payloads})

    return src.mapInPandas(fn, schema="doc_id long, payload binary")


def parse_container(payloads: DataFrame) -> DataFrame:
    """(doc_id, width, height, n_frames, sample_rate, body_len):
    BYTE-WISE header parse (magic check + little-endian field reads
    at fixed offsets) — the real container-scan stage. Raises on a
    corrupt magic; body length from the remaining bytes."""
    def fn(batches):
        for pdf in batches:
            rows = {
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "width": [], "height": [], "n_frames": [],
                "sample_rate": [], "body_len": [],
            }
            for buf in pdf["payload"]:
                b = bytes(buf)
                if b[:4] != _MAGIC:
                    raise ValueError("corrupt container magic")
                hdr = np.frombuffer(b[: _HEADER_LEN], dtype=[
                    ("magic", "S4"), ("w", "<u4"), ("h", "<u4"),
                    ("fr", "<u2"), ("sr", "<u4"),
                ])[0]
                rows["width"].append(int(hdr["w"]))
                rows["height"].append(int(hdr["h"]))
                rows["n_frames"].append(int(hdr["fr"]))
                rows["sample_rate"].append(int(hdr["sr"]))
                rows["body_len"].append(len(b) - _HEADER_LEN)
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(
        fn,
        schema=(
            "doc_id long, width long, height long, n_frames long, "
            "sample_rate long, body_len long"
        ),
    )


def container_roundtrip(docs: DataFrame) -> DataFrame:
    """Build + parse + body integrity: the parsed header fields plus
    the md5 of the EXTRACTED body bytes — byte-identical to md5(text)
    iff the binary round-trip is lossless (the per-row invariant)."""
    built = build_container(docs)

    def fn(batches):
        for pdf in batches:
            import hashlib

            rows = {
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "width": [], "height": [], "n_frames": [],
                "sample_rate": [], "body_len": [], "body_md5": [],
            }
            for buf in pdf["payload"]:
                b = bytes(buf)
                if b[:4] != _MAGIC:
                    raise ValueError("corrupt container magic")
                hdr = np.frombuffer(b[: _HEADER_LEN], dtype=[
                    ("magic", "S4"), ("w", "<u4"), ("h", "<u4"),
                    ("fr", "<u2"), ("sr", "<u4"),
                ])[0]
                body = b[_HEADER_LEN:]
                rows["width"].append(int(hdr["w"]))
                rows["height"].append(int(hdr["h"]))
                rows["n_frames"].append(int(hdr["fr"]))
                rows["sample_rate"].append(int(hdr["sr"]))
                rows["body_len"].append(len(body))
                rows["body_md5"].append(hashlib.md5(body).hexdigest())
            yield pd.DataFrame(rows)

    return built.mapInPandas(
        fn,
        schema=(
            "doc_id long, width long, height long, n_frames long, "
            "sample_rate long, body_len long, body_md5 string"
        ),
    )


def sql_container_roundtrip() -> str:
    return """
SELECT doc_id,
  CAST(16 + (doc_id * 37) % 624 AS BIGINT) AS width,
  CAST(16 + (doc_id * 91) % 464 AS BIGINT) AS height,
  CAST(1 + (doc_id * 13) % 24 AS BIGINT) AS n_frames,
  CAST(8000 + (doc_id % 5) * 8000 AS BIGINT) AS sample_rate,
  CAST(octet_length(encode(text)) AS BIGINT) AS body_len,
  md5(text) AS body_md5
FROM documents
"""
