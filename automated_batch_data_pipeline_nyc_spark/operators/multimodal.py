"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct —
the lakehouse-native layout: bytes travel inside Parquet/Arrow pages,
metadata stays queryable/prunable without touching payloads.

The decode/feature kernels are Pandas-UDF stages over ``mapInPandas``
(Arrow-batched).  The actual codec calls are STUBBED — image/audio
libraries are not installed in this container — behind
``DeterministicFakeCodec`` (content-hash-derived fake properties, so
tests are reproducible) or ``NotImplementedError`` in strict mode.
The Spark-side contract (schemas, batch iteration, partitioning
advice) is real and tested.

Scale notes:
- ``mapInPandas`` streams Arrow batches: decode memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` x max payload, not
  by partition size.
- Partition by content size before heavy decode (``repartition`` on a
  size bucket) so one 4 GB video doesn't skew a task.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "decode_image_features",
    "resize_images",
    "extract_audio_features",
    "sample_video_frames",
    "DeterministicFakeCodec",
]

#: Metadata struct carried beside every binary payload column.
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
    T.StructField("size_bytes", T.LongType(), False),
    T.StructField("content_md5", T.StringType(), False),
])


class DeterministicFakeCodec:
    """Stand-in for PIL/ffmpeg/librosa: derives plausible media
    properties deterministically from the payload hash.  Clearly a
    FAKE — swap with a real codec (same signatures) when the libs
    exist.  Raises in ``strict`` mode to make the stub impossible to
    mistake for a real decode."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _h(self, payload: bytes) -> int:
        import hashlib

        return int.from_bytes(hashlib.md5(payload).digest()[:8], "big")

    def image_size(self, payload: bytes) -> tuple[int, int]:
        if self.strict:
            raise NotImplementedError("image decode requires PIL (not installed)")
        h = self._h(payload)
        return 64 + h % 1920, 64 + (h >> 16) % 1080

    def video_n_frames(self, payload: bytes) -> int:
        if self.strict:
            raise NotImplementedError("video decode requires ffmpeg (not installed)")
        return 1 + self._h(payload) % 300


def attach_media_meta(
    df: DataFrame, payload_col: str, media_type: str, fmt: str | None = None
) -> DataFrame:
    """Build the metadata struct from the payload — JVM-side only
    (octet length + md5), no decode."""
    p = F.col(payload_col)
    return df.withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.octet_length(p).cast("long").alias("size_bytes"),
            F.md5(p).alias("content_md5"),
        ),
    )


def decode_image_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    codec: DeterministicFakeCodec | None = None,
) -> DataFrame:
    """Arrow-batched image "decode": id -> (width, height, aspect).

    Output schema is fixed; the kernel is the stubbed codec.  The
    ``mapInPandas`` shape (iterator of batches in/out) is exactly what
    a real PIL/torchvision decode would use.
    """
    codec = codec or DeterministicFakeCodec()
    strict = codec.strict
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("aspect", T.DoubleType(), True),
    ])

    # NOTE: the kernel must be closure-pure (stdlib + pandas only, no
    # references to this module's classes) so cloudpickle serializes it
    # by value and Python workers never need the engine on PYTHONPATH.
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def image_size(payload: bytes) -> tuple[int, int]:
            if strict:
                raise NotImplementedError("image decode requires PIL (not installed)")
            h = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
            return 64 + h % 1920, 64 + (h >> 16) % 1080

        for pdf in batches:
            sizes = [image_size(b) for b in pdf[payload_col]]
            out = _pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "width": [w for w, _ in sizes],
                "height": [h for _, h in sizes],
            })
            out["aspect"] = out.width / out.height
            yield out

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def resize_images(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    target: tuple[int, int] = (224, 224),
    codec: DeterministicFakeCodec | None = None,
) -> DataFrame:
    """Binary-in/binary-out resize stage: (id, payload) ->
    (id, payload, width, height).  The real kernel would be
    PIL ``Image.resize`` + re-encode; the stub emits a deterministic
    payload (md5-keyed stream truncated to a plausible thumbnail size)
    so downstream binary plumbing — including writing the resized
    column back to Parquet — is exercised for real.
    """
    codec = codec or DeterministicFakeCodec()
    strict = codec.strict
    tw, th = target
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ])

    # closure-pure kernel (see decode_image_features note)
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def resize(payload: bytes) -> bytes:
            if strict:
                raise NotImplementedError("image resize requires PIL (not installed)")
            seed = hashlib.md5(payload).digest()
            # deterministic fake thumbnail: repeat the digest to ~1KB
            return (seed * 64)[: 16 + len(payload) % 1009]

        for pdf in batches:
            yield _pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "payload": [resize(b) for b in pdf[payload_col]],
                "width": tw,
                "height": th,
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def extract_audio_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    codec: DeterministicFakeCodec | None = None,
) -> DataFrame:
    """Arrow-batched audio feature extraction: id -> (duration_s,
    sample_rate, rms).  Real kernel = librosa/soundfile; stubbed
    deterministically from the payload hash."""
    codec = codec or DeterministicFakeCodec()
    strict = codec.strict
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ])

    # closure-pure kernel (see decode_image_features note)
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def features(payload: bytes) -> tuple[float, int, float]:
            if strict:
                raise NotImplementedError("audio decode requires librosa (not installed)")
            h = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
            return round(0.5 + h % 3000 / 10.0, 1), [8000, 16000, 44100][h % 3], (h >> 8) % 10_000 / 10_000.0

        for pdf in batches:
            feats = [features(b) for b in pdf[payload_col]]
            yield _pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "duration_s": [d for d, _, _ in feats],
                "sample_rate": [s for _, s, _ in feats],
                "rms": [r for _, _, r in feats],
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_nth: int = 30,
    codec: DeterministicFakeCodec | None = None,
) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index.
    Real pipelines emit a binary frame payload per row; the stub emits
    the frame index + a deterministic frame fingerprint."""
    codec = codec or DeterministicFakeCodec()
    strict = codec.strict
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ])

    # closure-pure kernel (see decode_image_features note)
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def n_frames(payload: bytes) -> int:
            if strict:
                raise NotImplementedError("video decode requires ffmpeg (not installed)")
            return 1 + int.from_bytes(hashlib.md5(payload).digest()[:8], "big") % 300

        for pdf in batches:
            ids, idxs, fps = [], [], []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                for i in range(0, n_frames(payload), every_nth):
                    ids.append(int(_id))
                    idxs.append(i)
                    fps.append(hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest())
            yield _pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_md5": fps})

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
