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
