"""Multimodal column handling: opaque binary payloads + typed metadata.

The engine's multimodal model (SURVEY.md §2.B; reference precedent is
URL-typed media columns — `image_url` Spotify_API.py:84, `preview_url`
Spotify_API4.py:386):

- media payloads are `BinaryType` columns (`spark.read.format
  ("binaryFile")` for real assets; here payloads are derived from the
  documents table since the container ships no image/audio data);
- per-asset metadata travels in a typed struct column next to the
  payload (media_type, byte_len, content hash);
- decode / feature-extract runs as Arrow-batched `mapInPandas` — the
  ONLY sanctioned Python hot path. The actual codec call is stubbed
  (no PIL/ffmpeg in the container) behind `decode_image_real`, with a
  deterministic fake (`_fake_decode_dims`) keeping the Spark-side
  plumbing — schema, batch iteration, partitioning — real and tested.

Scale: mapInPandas streams Arrow batches; payload columns are pruned
at the parquet scan unless the decode stage is present, and the decode
stage parallelizes per-partition with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, media_type string, byte_len long, width long, height long, n_frames long"
)


def attach_binary_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a binary payload column + metadata struct from text (the
    container has no real media; the column shapes are the contract)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("media_type"),
            F.length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("content_md5"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decode hook — requires an image codec, not present in this
    container. Wire PIL/libvips here on a real cluster."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_decode_dims(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: dims derived from byte length
    (SQL-expressible on purpose, so the plumbing is oracle-checkable)."""
    n = len(payload)
    if media_type == "image/png":
        return 1 + n % 640, 1 + n % 480, 1
    if media_type == "audio/wav":
        return 0, 0, 1 + n % 1000  # "frames" = samples
    return 1 + n % 1920, 1 + n % 1080, 1 + n % 240


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: Arrow batch in → decoded metadata out."""
    for pdf in batches:
        metas = pdf["meta"]
        payloads = pdf["payload"]
        out = {
            "doc_id": pdf["doc_id"],
            "media_type": [m["media_type"] for m in metas],
            "byte_len": [m["byte_len"] for m in metas],
        }
        dims = [
            _fake_decode_dims(p, m["media_type"]) for p, m in zip(payloads, metas)
        ]
        out["width"] = [d[0] for d in dims]
        out["height"] = [d[1] for d in dims]
        out["n_frames"] = [d[2] for d in dims]
        yield pd.DataFrame(out)


def decode_media(with_payloads: DataFrame) -> DataFrame:
    """Run the (stubbed) decode over every asset: Arrow-batched, no
    shuffle, schema declared up front."""
    from bigdata06_spark.session import ensure_workers_can_import

    ensure_workers_can_import(with_payloads.sparkSession)
    return with_payloads.mapInPandas(decode_batch, schema=DECODED_SCHEMA)
