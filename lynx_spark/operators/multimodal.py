"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata; the
Spark-side machinery — schema, partition-preserving ``mapInPandas``,
Arrow batch shape — is real and tested. Image decoding needs libraries
that are not in this container, so that decode step is stubbed two
ways:

- ``decode_image``: try the real library (PIL); raise
  NotImplementedError if absent. The call site is the integration
  point for a real deployment.
- ``fake_decode_dims``: a clearly-marked DETERMINISTIC FAKE (dims
  derived from the payload hash) so the batch plumbing can be exercised
  end-to-end in tests.

Format sniffing (magic bytes) and WAV audio header decoding
(``parse_wav_header`` / ``decode_audio``: hand-written RIFF chunk walk
— sample rate, channels, bit depth, duration) are REAL — no library
needed. Non-WAV audio falls back to soundfile when available.
"""

from __future__ import annotations

import hashlib
import struct
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


def parse_wav_header(data: bytes) -> dict | None:
    """Decode a WAV (RIFF) header by hand — no audio library.

    Walks the RIFF chunk list for ``fmt `` (PCM parameters) and
    ``data`` (payload size), per the canonical WAVE format spec.
    Returns {sample_rate, channels, bits_per_sample, n_samples,
    duration_ms} or None for anything that is not a well-formed WAV
    (wrong magic, truncated, missing chunks, zero-rate)."""
    if (
        data is None
        or len(data) < 12
        or data[0:4] != b"RIFF"
        or data[8:12] != b"WAVE"
    ):
        return None
    fmt: dict | None = None
    data_size: int | None = None
    pos = 12
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if chunk_id == b"fmt " and body + 16 <= len(data):
            (audio_format,) = struct.unpack_from("<H", data, body)
            channels, sample_rate = struct.unpack_from("<HI", data, body + 2)
            block_align, bits = struct.unpack_from("<HH", data, body + 12)
            # only uncompressed frames make n_samples = data/block_align
            # meaningful: PCM (1), IEEE float (3), or an EXTENSIBLE
            # (0xFFFE) wrapper whose SubFormat GUID's leading tag is
            # one of those. Compressed WAVE (MP3/ADPCM tags, directly
            # or behind the extensible wrapper) would report garbage
            # durations as real metadata — reject instead.
            if audio_format == 0xFFFE:
                if body + 26 > len(data):
                    return None
                (sub_tag,) = struct.unpack_from("<H", data, body + 24)
                if sub_tag not in (1, 3):
                    return None
            elif audio_format not in (1, 3):
                return None
            fmt = {
                "channels": channels,
                "sample_rate": sample_rate,
                "block_align": block_align,
                "bits_per_sample": bits,
            }
        elif chunk_id == b"data":
            # size may overrun a truncated buffer; clamp to reality
            data_size = min(chunk_size, max(0, len(data) - body))
        pos = body + chunk_size + (chunk_size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    if fmt["sample_rate"] <= 0 or fmt["block_align"] <= 0:
        return None
    n_samples = data_size // fmt["block_align"]
    return {
        "sample_rate": fmt["sample_rate"],
        "channels": fmt["channels"],
        "bits_per_sample": fmt["bits_per_sample"],
        "n_samples": n_samples,
        "duration_ms": int(n_samples * 1000 / fmt["sample_rate"]),
    }


def decode_audio(data: bytes) -> dict:
    """Audio metadata decode. WAV is decoded by the hand-written header
    parser (real, library-free); other formats fall back to soundfile
    when installed, else NotImplementedError (the integration point
    for a real deployment)."""
    parsed = parse_wav_header(data)
    if parsed is not None:
        return parsed
    try:
        import io  # noqa: PLC0415

        import soundfile  # noqa: PLC0415

        with soundfile.SoundFile(io.BytesIO(data)) as f:
            return {
                "sample_rate": f.samplerate,
                "channels": f.channels,
                "bits_per_sample": 0,  # not exposed uniformly
                "n_samples": len(f),
                "duration_ms": int(len(f) * 1000 / f.samplerate),
            }
    except ImportError as e:
        raise NotImplementedError(
            "non-WAV audio decoding requires soundfile, which is not "
            "installed; WAV decodes natively via parse_wav_header"
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


AUDIO_META_SCHEMA = (
    "doc_id long, format string, sample_rate long, channels long, "
    "bits_per_sample long, n_samples long, duration_ms long"
)


def extract_audio_metadata(
    df: DataFrame, id_col: str, bin_col: str
) -> DataFrame:
    """Per-blob audio metadata via the same partition-preserving
    mapInPandas pattern as extract_media_metadata; WAV headers decode
    natively, everything else reports nulls for the PCM fields."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[bin_col]
            parsed = [parse_wav_header(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": blobs.map(sniff_format),
                    "sample_rate": pd.array(
                        [p and p["sample_rate"] for p in parsed],
                        dtype="Int64",
                    ),
                    "channels": pd.array(
                        [p and p["channels"] for p in parsed], dtype="Int64"
                    ),
                    "bits_per_sample": pd.array(
                        [p and p["bits_per_sample"] for p in parsed],
                        dtype="Int64",
                    ),
                    "n_samples": pd.array(
                        [p and p["n_samples"] for p in parsed], dtype="Int64"
                    ),
                    "duration_ms": pd.array(
                        [p and p["duration_ms"] for p in parsed],
                        dtype="Int64",
                    ),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, schema=AUDIO_META_SCHEMA
    )


def binary_length_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Oracle-checkable subset of the media pipeline: byte length +
    sniffed format through the same mapInPandas path. Proves the UDF
    plumbing returns exactly what the declarative twin computes."""
    meta = extract_media_metadata(df, id_col, bin_col)
    return meta.select("doc_id", "n_bytes", "format")


# --------------------------------------------- frame sampling / resize

FRAME_META_SCHEMA = (
    "doc_id long, frame_no long, frame_offset long, frame_hash string"
)


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """Real image resize — requires PIL, absent in this container."""
    try:
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415

        src = Image.open(io.BytesIO(data))
        # capture before resize(): PIL only sets .format on opened
        # images, the resized copy would always report None
        fmt = src.format or "PNG"
        out = io.BytesIO()
        src.resize((width, height)).save(out, format=fmt)
        return out.getvalue()
    except ImportError as e:
        raise NotImplementedError(
            "image resizing requires Pillow, which is not installed; "
            "the Spark-side plumbing is exercised via fake_decode_dims"
        ) from e


def sample_video_frames(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    n_frames: int = 4,
) -> DataFrame:
    """Deterministic frame sampling over opaque video blobs: n_frames
    evenly spaced byte offsets per blob, each identified by the md5 of
    a window at that offset. The real decoder (no video lib in this
    container) would replace the hash with decoded frame bytes; the
    Spark-side shape — one input row fanning out to n_frames rows
    through an Arrow-batched mapInPandas, blobs never leaving the
    executor — is the part that must hold at 100 TB and is real and
    tested. Null/short blobs produce no rows (not nulls): a missing
    video has no frames."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            frame_nos: list[int] = []
            offsets: list[int] = []
            hashes: list[str] = []
            for doc_id, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None or len(blob) < n_frames:
                    continue
                blob = bytes(blob)
                step = len(blob) // n_frames
                for fno in range(n_frames):
                    off = fno * step
                    window = blob[off : off + 64]
                    ids.append(int(doc_id))
                    frame_nos.append(fno)
                    offsets.append(off)
                    hashes.append(hashlib.md5(window).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(frame_nos, dtype="int64"),
                    "frame_offset": pd.Series(offsets, dtype="int64"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, schema=FRAME_META_SCHEMA
    )
