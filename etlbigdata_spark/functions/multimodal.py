"""Multimodal (image/audio/video) columns (SURVEY §2 B26).

Design: media is an opaque ``binary`` column + a typed metadata struct,
ingested via ``binaryFile`` (sources/readers.read_binary_files) or built
from any bytes column.  Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, batch shape, partition
sizing) is real; the actual codec calls are STUBBED because image/audio
libraries are not in this container: ``decode_fn`` defaults to a
deterministic fake, and passing ``strict=True`` raises NotImplementedError
at the stub boundary.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_media_meta(
    df: DataFrame, bytes_col: str, uri_col: str | None = None, media_type: str = "application/octet-stream"
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct (uri, type,
    size, md5) — all JVM-side expressions."""
    b = F.col(bytes_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            (F.col(uri_col) if uri_col else F.lit(None).cast("string")).alias("uri"),
            F.lit(media_type).alias("media_type"),
            F.octet_length(b).cast("long").alias("n_bytes"),
            F.md5(b).alias("checksum"),
        ),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(key: str, blob: bytes) -> dict:
    """Deterministic stand-in for a real image/audio decoder (STUB — the
    container ships no PIL/ffmpeg). Derives stable pseudo-features from
    the bytes so tests can assert the plumbing end-to-end."""
    n = len(blob or b"")
    head = sum(blob[:16]) if blob else 0
    return {
        "key": key,
        "width": (head % 64) + 1,
        "height": (n % 64) + 1,
        "n_frames": 1,
        "feature": [float((head + i) % 7) for i in range(8)],
    }


def extract_media_features(
    df: DataFrame,
    key_col: str,
    bytes_col: str,
    decode_fn: Callable[[str, bytes], dict] | None = None,
    strict: bool = False,
    batch_partitions: int | None = None,
) -> DataFrame:
    """B26 — decode/featurize media via ``mapInPandas`` (Arrow batches of
    rows in, feature rows out). Swap ``decode_fn`` for a real codec when
    the libs exist; ``strict=True`` exposes the stub honestly."""
    if strict:
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present in this "
            "container; pass decode_fn= with your codec"
        )
    fn = decode_fn or _fake_decode
    src = df.select(F.col(key_col).cast("string").alias("key"), F.col(bytes_col).alias("blob"))
    if batch_partitions:
        # media blobs are large: bound rows-per-partition so an Arrow batch
        # of blobs fits executor memory
        src = src.repartition(batch_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [fn(k, b) for k, b in zip(pdf["key"], pdf["blob"])]
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return src.mapInPandas(run, schema=FEATURE_SCHEMA)
