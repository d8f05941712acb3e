"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The image/audio codec libraries are NOT available in this container,
so the actual decode is STUBBED (clearly marked below) behind a
deterministic fake — but everything Spark-side is real and tested:
the schema contract, the mapInPandas batch shape, partition-size
control for large blobs, and the rule that binary payloads are
projected away before any shuffle (only metadata rows move).

At 100 TB of media this is the right shape: decode/feature-extract is
a map-only pass (no shuffle of blobs), metadata aggregation happens
on narrow typed columns afterwards.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "doc_id bigint, byte_len int, format string, width int, height int, ok boolean"
)


def _decode_image_stub(blob: bytes) -> tuple[str, int, int]:
    """STUB — real implementation would be e.g. PIL.Image.open.

    Deterministic fake so the pipeline is testable: 'format' from the
    leading bytes, width/height derived from the byte length. Replace
    with a real decoder where the codec libs exist.
    """
    if blob[:2] == b"\xff\xd8":
        fmt = "jpeg"
    elif blob[:8] == b"\x89PNG\r\n\x1a\n":
        fmt = "png"
    else:
        fmt = "unknown"
    # fake dimensions: pure function of payload size (STUB)
    width = int(len(blob) % 64) + 1
    height = int(len(blob) % 48) + 1
    return fmt, width, height


def extract_media_metadata(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """binary blobs → typed metadata rows via mapInPandas.

    The input is projected to (id, blob) first — no other column rides
    along with the payload — and the output carries NO binary, so
    downstream shuffles/aggregations only ever move narrow rows.
    """
    slim = df.select(id_col, blob_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[blob_col]
            metas = [
                (None, None, None, False) if b is None else (*_decode_image_stub(bytes(b)), True)
                for b in blobs
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [len(bytes(b)) if b is not None else None for b in blobs],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "ok": [m[3] for m in metas],
                }
            )

    return slim.mapInPandas(batches, schema=MEDIA_META_SCHEMA)


def frame_sample_stub(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling plumbing (STUB decode): emits one metadata
    row per sampled 'frame'. Demonstrates the 1→N mapInPandas shape a
    real frame sampler uses; frame count is a deterministic fake from
    the byte length (real impl: av/ffmpeg)."""
    slim = df.select(id_col, blob_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames = [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                n_frames = (len(bytes(b)) % 100) + 1  # STUB
                for fidx in range(0, n_frames, every_n):
                    ids.append(i)
                    frames.append(fidx)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": frames})

    return slim.mapInPandas(batches, schema="doc_id bigint, frame_idx int")
