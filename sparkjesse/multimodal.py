"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched pandas functions via
``mapInPandas`` — never per-row Python.

The sandbox has no image/audio codecs (PIL/ffmpeg absent), so the
*decode* step is stubbed: ``strict=True`` raises ``NotImplementedError``
(the production path would plug a real codec into the same batch
signature); the default is a deterministic fake decoder that parses the
synthetic header written by ``synth_media``. Everything Spark-side —
schema, partitioning, UDF signatures, Arrow batch shapes — is real and
tested; swapping in a real codec changes only the inner function body.

Scale notes: binary payloads ride Arrow record batches driver-free;
``mapInPandas`` streams batches (``spark.sql.execution.arrow.
maxRecordsPerBatch``) so executor memory is bounded by batch size, not
partition size. Feature extraction emits fixed-width ``array<float>``
columns that feed ``similarity.py`` directly.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"SJM1"  # synthetic media header: magic, kind, w, h, dur_ms

MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("media_kind", StringType()),
    StructField("content", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("mime", StringType()),
    ])),
])

DECODED_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", IntegerType()),
    StructField("checksum", StringType()),
])


def synth_media(spark: SparkSession, n: int, *, seed: int = 42,
                payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (driver-free generation via
    ``spark.range`` + expressions; payload = repeated md5 bytes behind a
    small struct-packed header)."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/fake", "audio": "audio/fake",
             "video": "video/fake"}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                h = hashlib.md5(f"{seed}:{i}".encode()).digest()
                kind = kinds[i % 3]
                w, h_px = 16 + (i % 64), 16 + ((i * 7) % 64)
                dur = 1000 + (i % 60) * 1000
                header = _MAGIC + struct.pack(
                    "<BHHI", kinds.index(kind), w, h_px, dur)
                body = (h * (payload_bytes // len(h) + 1))[:payload_bytes]
                out.append({
                    "media_ref": f"m{i}",
                    "media_kind": kind,
                    "content": header + body,
                    "meta": {"width": int(w), "height": int(h_px),
                             "duration_ms": int(dur),
                             "mime": mimes[kind]},
                })
            yield pd.DataFrame(out)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(df: DataFrame, *, strict: bool = False,
                 codec: Optional[Callable[[bytes], tuple]] = None
                 ) -> DataFrame:
    """Decode the binary column into (media_ref, width, height, n_bytes,
    checksum).

    ``codec`` is the production seam: any ``bytes -> (width, height)``
    callable (``PIL.Image.open(...).size``, a libav probe, ...) runs
    INSIDE the same Arrow ``mapInPandas`` batch path — schema,
    partitioning, and batch shape are identical whether the decoder is
    the built-in synthetic-header parser or a real library, so swapping
    one in changes zero plan structure (seam is test-pinned by
    ``test_decode_media_custom_codec_seam``). ``strict=True`` with no
    ``codec`` raises: this sandbox ships no image/audio libs, and
    strict mode refuses to silently fall back to the header parser."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict and codec is None:
            raise NotImplementedError(
                "no image/audio codec in this environment — plug a real "
                "decoder into decode_media(codec=...)")
        for pdf in batches:
            rows = []
            for ref, blob in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(blob)
                if codec is not None:
                    w, h = codec(b)
                elif b[:4] == _MAGIC:
                    _, w, h, _dur = struct.unpack("<BHHI", b[4:13])
                else:  # unknown container — metadata only
                    w = h = -1
                # checksum over the LOWERCASE HEX of the payload: a
                # byte-order-faithful digest of every byte that any
                # engine with a string md5 reproduces bit-for-bit (the
                # DuckDB conformance twin's md5 is VARCHAR-only)
                rows.append({
                    "media_ref": ref, "width": int(w), "height": int(h),
                    "n_bytes": len(b),
                    "checksum": hashlib.md5(b.hex().encode()).hexdigest(),
                })
            yield pd.DataFrame(rows)

    return df.select("media_ref", "content").mapInPandas(
        decode, DECODED_SCHEMA)


def extract_features(df: DataFrame, *, dim: int = 16,
                     content_col: str = "content",
                     id_col: str = "media_ref") -> DataFrame:
    """Binary → fixed-width ``array<float>`` feature vector (the stub
    derives it from the content digest — deterministic; a real model
    would run here with the identical Arrow batch signature). Output
    feeds similarity search / embedding dedup directly."""

    @F.pandas_udf(ArrayType(FloatType()))
    def featurize(content: pd.Series) -> pd.Series:
        out = []
        for blob in content:
            # digest of the hex encoding (not raw bytes) so the
            # cross-engine oracle can reproduce it — see decode_media
            d = hashlib.sha256(bytes(blob).hex().encode()).digest()
            raw = (d * (dim * 4 // len(d) + 1))[:dim * 4]
            v = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
            out.append(((v / 2**32) * 2.0 - 1.0).astype(np.float32))
        return pd.Series(out)

    return df.select(F.col(id_col),
                     featurize(F.col(content_col)).alias("features"))


def frame_sample_plan(df: DataFrame, *, fps: float = 1.0,
                      meta_col: str = "meta",
                      id_col: str = "media_ref") -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled frame
    offset (ms), computed as pure expressions (sequence + explode) —
    the decode of each frame would then run through ``decode_media``'s
    batch path. No Python in this step.

    Zero- or negative-duration videos contribute no frames: the
    ``duration_ms > 0`` guard is load-bearing, not tidy —
    ``sequence(0, dur-1, step)`` THROWS on ``dur = 0`` ("illegal
    sequence boundaries: 0 to -1"), it does not return an empty
    array. NULL durations already drop at the explode."""
    dur = F.col(f"{meta_col}.duration_ms")
    step = F.lit(int(1000 / fps))
    offs = F.sequence(F.lit(0), dur - 1, step)
    return (df.where((F.col("media_kind") == "video") & (dur > 0))
              .select(F.col(id_col), F.posexplode(offs)
                      .alias("frame_idx", "offset_ms")))
