"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side design (the part that matters at 100 TB) is REAL and tested:
- binary payloads travel as `binary` columns; features extract via
  Arrow-batched `mapInPandas` with explicit output StructTypes;
- batch shape: one input batch → one output batch (features) or an
  exploded batch (frame sampling emits N rows per input row);
- skew: giant payloads are spread with `with_size_buckets` BEFORE the UDF
  stage (same salted-repartition guard the text pipeline uses,
  pipeline/run.py) and Arrow batch size bounds per-batch bytes.

The DECODE itself is a deterministic header parser over the repo's
synthetic container formats (IMG1/AUD1 below) — the real codec libraries
(PIL, soundfile, av) are not in this container, so `decode_real_image`
raises NotImplementedError behind an import-try; swapping it into
`_image_rows` is the only change needed when PIL is present. This mirrors
the reference's posture: inspectEHR has no binary columns at all — this
module is part of the beyond-reference training-data surface (SURVEY §8).

Synthetic container formats (deterministic, seedable from tests):
  IMG1: b"IMG1" | width:int32be | height:int32be | payload (w*h bytes)
  AUD1: b"AUD1" | sample_rate:int32be | n_samples:int32be | payload
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("mean_byte", DoubleType()),
])

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("format", StringType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("duration_sec", DoubleType()),
])

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_index", IntegerType()),
    StructField("frame_bytes", LongType()),
    StructField("mean_byte", DoubleType()),
])


def encode_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic synthetic IMG1 payload (test fixture generator)."""
    payload = bytes((seed + i) % 256 for i in range(width * height))
    return b"IMG1" + struct.pack(">ii", width, height) + payload


def encode_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    payload = bytes((seed + 7 * i) % 256 for i in range(n_samples))
    return b"AUD1" + struct.pack(">ii", sample_rate, n_samples) + payload


def decode_real_image(data: bytes):  # pragma: no cover - env-gated
    """Real-codec decode slot: same (width, height, n_bytes, mean) contract
    as `_parse_img1`, so it drops into `decode_image_features`' row loop
    unchanged when PIL is present (tests/test_multimodal.py carries the
    contract test — skipped in this container, PIL absent). Mean is over
    the luminance ('L') conversion, the greyscale analog of IMG1's payload
    mean."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode needs PIL; the IMG1 header parser is the "
            "in-container stand-in — swap this function into _image_rows"
        ) from exc
    import io

    with Image.open(io.BytesIO(data)) as im:
        w, h = im.size
        px = list(im.convert("L").getdata())
    mean = (sum(px) / len(px)) if px else 0.0
    return w, h, len(data), mean


def _parse_img1(data: bytes | None):
    if not data or data[:4] != b"IMG1" or len(data) < 12:
        return None
    w, h = struct.unpack(">ii", data[4:12])
    payload = data[12:]
    mean = (sum(payload) / len(payload)) if payload else 0.0
    return w, h, len(data), mean


def decode_image_features(
    df: DataFrame, binary_col: str = "image", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, format, width, height, n_bytes, mean_byte) per image.
    Undecodable rows yield format='invalid' with NULL dims (they are a
    failure-log row upstream, never an exception that kills the stage)."""

    def gen(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                parsed = _parse_img1(data)
                if parsed is None:
                    rows.append((doc_id, "invalid", None, None,
                                 len(data) if data else 0, None))
                else:
                    w, h, n, mean = parsed
                    rows.append((doc_id, "IMG1", w, h, n, mean))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, binary_col).mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def decode_audio_features(
    df: DataFrame, binary_col: str = "audio", id_col: str = "doc_id"
) -> DataFrame:
    def gen(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                if not data or data[:4] != b"AUD1" or len(data) < 12:
                    rows.append((doc_id, "invalid", None, None, None))
                    continue
                rate, n = struct.unpack(">ii", data[4:12])
                rows.append(
                    (doc_id, "AUD1", rate, n, (n / rate) if rate else None)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, binary_col).mapInPandas(gen, AUDIO_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    binary_col: str = "video",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    every_n: int = 2,
) -> DataFrame:
    """Frame sampling: the payload (after the IMG1-style header) is split
    into fixed-size frames; every `every_n`-th frame emits a row — the
    one-in, many-out batch shape video decode needs (mapInPandas output
    is NOT 1:1 with input)."""

    def gen(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                payload = data[12:] if data and len(data) > 12 else b""
                n_frames = len(payload) // frame_bytes
                for i in range(0, n_frames, every_n):
                    fr = payload[i * frame_bytes:(i + 1) * frame_bytes]
                    rows.append((doc_id, i, len(fr), sum(fr) / len(fr)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select(id_col, binary_col).mapInPandas(gen, FRAME_SCHEMA)


def with_size_buckets(
    df: DataFrame, id_col: str, n_partitions: int
) -> DataFrame:
    """Skew guard for the UDF stages above: spread rows uniformly by a
    hash of the row id so a few giant payloads can't pin one task (same
    pattern as the text pipeline's salt_partitions, pipeline/run.py);
    Arrow batch size then bounds per-batch bytes."""
    return df.repartition(
        n_partitions, F.pmod(F.xxhash64(id_col), F.lit(n_partitions))
    )
