"""Multimodal columns: opaque binary payloads + typed metadata, processed
with Arrow-batched ``mapInPandas`` (SURVEY.md §2.9).

The container has no image/audio libraries, so the actual decoders are
STUBS — ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless PIL/soundfile import, and the pipeline ships a deterministic fake
("header parse": derive width/height/duration from the byte payload) so the
Spark-side plumbing — binary schema, Arrow batch shape, partition-parallel
UDF execution — is real and tested end-to-end.

Scale notes: binary payloads ride the scan as parquet BYTE_ARRAY; metadata
extraction is a narrow map (no shuffle); frame-sampling/resize fan-out uses
``mapInPandas`` so one input row may yield N output rows without exploding
through a join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes) -> "object":
    """Real decoder — unavailable in this container (no PIL)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; use fake_image_meta for plumbing tests"
        )
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def fake_image_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a header parse: (width, height, format)
    derived from payload length/first byte. Replace with decode_image(...)
    .size when PIL exists — the Spark plumbing is identical."""
    n = len(payload)
    width = n % 64 + 16
    height = (n // 64) % 64 + 16
    fmt = "png" if (payload[:1] or b"\x00")[0] % 2 == 0 else "jpeg"
    return width, height, fmt


def with_binary_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Make an opaque binary column (fixtures have no real media; encoding
    text gives a deterministic, realistic-size payload)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def extract_image_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas metadata extraction: one Arrow batch in, one out —
    the real decode drop-in point. Output: id, byte_len, width, height, format."""
    schema = f"{id_col} long, byte_len long, width int, height int, format string"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [fake_image_meta(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "byte_len": [len(p) if p is not None else 0 for p in payloads],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema)


def decode_audio(payload: bytes) -> "object":
    """Real audio decoder — unavailable in this container (no soundfile)."""
    try:  # pragma: no cover - not in this container
        import io

        import soundfile

        return soundfile.read(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "audio decode requires soundfile; use fake_audio_meta"
        ) from exc


def fake_audio_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an audio header parse:
    (sample_rate, duration_ms) derived from payload bytes."""
    n = len(payload)
    rate = (8000, 16000, 44100)[n % 3]
    return rate, n * 1000 // 32


def extract_audio_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas audio-metadata extraction (the audio twin of
    extract_image_metadata): one Arrow batch in, one out; ``decode_audio``
    is the real-decoder drop-in point. Output: id, byte_len, sample_rate,
    duration_ms."""
    schema = f"{id_col} long, byte_len long, sample_rate int, duration_ms long"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [p if p is not None else b"" for p in pdf[payload_col]]
            meta = [fake_audio_meta(p) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "byte_len": [len(p) for p in payloads],
                    "sample_rate": [m[0] for m in meta],
                    "duration_ms": [m[1] for m in meta],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema)


def resize_images(
    df: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Image-resize plumbing: mapInPandas 1→1 transform whose output payload
    is a fixed-budget byte grid (a real implementation calls
    ``decode_image(p).resize((w, h))`` and re-encodes — byte-sampling here
    keeps the batch shape, output size, and determinism identical). The
    narrow map keeps payloads scan-local: no shuffle at any scale."""
    schema = f"{id_col} long, resized binary, resized_len long"
    budget = target_w * target_h

    def one(p: bytes | None) -> bytes:
        p = p or b""
        step = max(len(p) // budget, 1)
        return bytes(p[::step][:budget])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # zip over raw columns, not .iterrows() (which builds a Series
            # per row and dominates the batch cost ~10x)
            payloads = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": payloads,
                    "resized_len": [len(p) for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 3,
) -> DataFrame:
    """Frame-sampling fan-out: each payload yields ``n_frames`` chunk rows
    (a video decoder would emit real frames). Demonstrates the 1→N
    mapInPandas shape: output rows ≠ input rows, no join/explode."""
    schema = f"{id_col} long, frame_idx int, frame_bytes binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step : i * step + step]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.select(id_col, payload_col).mapInPandas(sample, schema)
