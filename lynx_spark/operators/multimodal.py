"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata; the
Spark-side machinery — schema, partition-preserving ``mapInPandas``,
Arrow batch shape — is real and tested. The actual decoders need
image/audio libraries that are not in this container, so the decode
step is stubbed two ways:

- ``decode_image`` / ``decode_audio``: try the real library (PIL /
  soundfile); raise NotImplementedError if absent. The call sites are
  the integration points for a real deployment.
- ``fake_decode_dims``: a clearly-marked DETERMINISTIC FAKE (dims
  derived from the payload hash) so the batch plumbing can be exercised
  end-to-end in tests.

Format sniffing (magic bytes) is real — no library needed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width long, height long"
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),  # wav/avi container; refine via bytes 8-12
    (b"ID3", "mp3"),
    (b"\x00\x00\x00\x18ftyp", "mp4"),
    (b"\x00\x00\x00\x20ftyp", "mp4"),
]


def sniff_format(data: bytes) -> str:
    """Magic-byte format detection (real, no decode)."""
    if data is None:
        return "empty"
    for magic, fmt in _MAGIC:
        if data.startswith(magic):
            if fmt == "riff":
                return "wav" if data[8:12] == b"WAVE" else "avi"
            return fmt
    return "unknown"


def decode_image(data: bytes):
    """Real image decode — requires PIL, absent in this container."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(data))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "use fake_decode_dims for plumbing tests"
        ) from e


def fake_decode_dims(data: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE decode: (width, height) derived from the
    payload md5 — stands in for a real decoder so batch shape,
    schema and partitioning can be tested without media libraries."""
    digest = hashlib.md5(data).digest()
    return 16 + digest[0] % 240, 16 + digest[1] % 240


def extract_media_metadata(
    df: DataFrame, id_col: str, bin_col: str
) -> DataFrame:
    """Per-blob metadata via mapInPandas: Arrow-batched, partition
    preserving, constant memory per batch (the pattern that holds for
    100 TB of media: bytes never leave the executor, only small typed
    metadata comes back)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[bin_col]
            dims = [
                fake_decode_dims(b) if b is not None else (0, 0) for b in blobs
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "format": blobs.map(sniff_format),
                    "width": pd.Series([d[0] for d in dims], dtype="int64"),
                    "height": pd.Series([d[1] for d in dims], dtype="int64"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, schema=MEDIA_META_SCHEMA
    )


def binary_length_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Oracle-checkable subset of the media pipeline: byte length +
    sniffed format through the same mapInPandas path. Proves the UDF
    plumbing returns exactly what the declarative twin computes."""
    meta = extract_media_metadata(df, id_col, bin_col)
    return meta.select("doc_id", "n_bytes", "format")
