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
