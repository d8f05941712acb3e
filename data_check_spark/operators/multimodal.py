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

try:  # real decoder when Pillow is installed (public PyPI package)
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:  # not in this container — stub path stays active
    _PILImage = None
    HAVE_PIL = False


def _decode_image_stub(blob: bytes) -> tuple[str, int | None, int | None]:
    """STUB decoder — deterministic fake so the pipeline is testable
    without codec libs: 'format' from the leading magic bytes,
    width/height derived from the byte length.
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


def _decode_image_pil(blob: bytes) -> tuple[str, int | None, int | None]:
    """Real decoder behind the same contract: PIL reads the header
    only (lazy — no full pixel decode for metadata). Undecodable
    payloads degrade to ('unknown', NULL, NULL) instead of failing
    the task: at web scale a corrupt blob must never kill a stage.

    The Pillow presence check is re-done HERE, on the executor — the
    driver-side check in extract_media_metadata does not prove the
    workers have the library (this module re-imports per worker), and
    a broad except around a None _PILImage would silently turn every
    blob into ('unknown', NULL, NULL). Missing Pillow on a worker must
    surface as a task failure, never as all-unknown metadata."""
    import io

    if _PILImage is None:
        raise ImportError(
            "decoder='pil' requires Pillow on the EXECUTOR's Python "
            "environment (driver check passed but worker import failed)"
        )
    try:
        with _PILImage.open(io.BytesIO(blob)) as im:
            return (im.format or "unknown").lower(), im.width, im.height
    except Exception:  # noqa: BLE001 — any codec error = unreadable blob
        return "unknown", None, None


def extract_media_metadata(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", decoder: str = "stub"
) -> DataFrame:
    """binary blobs → typed metadata rows via mapInPandas.

    The input is projected to (id, blob) first — no other column rides
    along with the payload — and the output carries NO binary, so
    downstream shuffles/aggregations only ever move narrow rows.

    ``decoder``: 'stub' (deterministic fake, always available),
    'pil' (real Pillow header decode — raises ImportError when the
    lib is absent), or 'auto' (pil when available, else stub). The
    Spark plumbing — schema, batch shape, blob projection — is
    identical for all three.
    """
    if decoder not in ("pil", "stub", "auto"):
        # a typo ('PIL', 'pillow') must not silently fall through to
        # the stub and return fabricated metadata labeled ok=True
        raise ValueError(f"decoder must be 'pil', 'stub' or 'auto', got {decoder!r}")
    if decoder == "pil" and not HAVE_PIL:
        raise ImportError("decoder='pil' requires Pillow")
    decode = _decode_image_pil if (decoder == "pil" or (decoder == "auto" and HAVE_PIL)) else _decode_image_stub
    slim = df.select(id_col, blob_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # ONE bytes() materialization per blob (it copies the
            # whole payload — doing it again for byte_len doubled the
            # memcpy of every media payload in the hot pass)
            raw = [None if b is None else bytes(b) for b in pdf[blob_col]]
            metas = [
                (None, None, None, False) if b is None else (*decode(b), True)
                for b in raw
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [len(b) if b is not None else None for b in raw],
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
