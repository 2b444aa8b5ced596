"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas. The media libraries are not in this
container, so the decode kernels are STUBBED (deterministic fakes or
NotImplementedError), but the Spark-side plumbing — schema, batch
iteration, partition sizing, UDF signatures — is real and tested.

At 100 TB: binary payloads dominate partition size, so the operators
take a target rows-per-batch and repartition by byte budget
(`spark.sql.files.maxPartitionBytes` handles the scan side; an explicit
repartition on ceil(total_bytes / target) handles the shuffle side).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
            T.StructField("codec", T.StringType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = repeated LCG bytes.
    Stands in for a real image/audio column; sizes vary by row."""
    df = spark.range(n)
    size = (F.pmod(F.col("id") * 2654435761 % (2**31) + seed, F.lit(4096)) + 64).cast("int")
    payload = F.encode(
        F.concat(F.lit("blob:"), F.col("id").cast("string"), F.repeat(F.lit("x"), size)), "utf-8"
    )
    return df.select(
        F.col("id").alias("media_id"),
        payload.alias("payload"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("media_type"),
        F.struct(
            (F.pmod(F.col("id") * 7 + 13, F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("id") * 11 + 17, F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(F.col("id") * 13 + 19, F.lit(60000)) + 1).cast("int").alias("duration_ms"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """STUB decode kernel. A real deployment wires PIL/torchaudio/ffmpeg
    here; this container has none of them, so features are a
    deterministic 8-dim byte histogram — the Spark plumbing around it
    (Arrow batches, schema, ordering) is identical to the real thing.
    """
    if payload is None:
        return []
    counts = [0] * 8
    for b in payload[:1024]:
        counts[b & 7] += 1
    total = max(1, sum(counts))
    return [c / total for c in counts]


def extract_features(
    media: DataFrame, batch_rows: int | None = None, n_rows: int | None = None
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches).

    ``batch_rows`` sizes the Python-worker fan-out: the input is
    coalesced to ceil(n / batch_rows) partitions so a 200-row input does
    not pay 32 Python-worker cold starts; coalesce() merges partitions
    locally without a shuffle, so no payload byte moves. The default
    (None) keeps the upstream partitioning — the right call when the
    scan was already sized by ``spark.sql.files.maxPartitionBytes``,
    and it never re-executes the source. When sizing IS wanted, pass
    ``n_rows`` if the caller knows the count (a synthetic range, a
    table with footer stats) — otherwise a column-pruned count() runs,
    which executes the upstream plan once more (fine for a parquet
    scan, expensive for a computed source)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "feature": [
                        _decode_stub(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )
            yield out

    src = media.select("media_id", "payload", "media_type")
    if batch_rows:
        n = n_rows if n_rows is not None else src.count()
        target = max(1, -(-n // batch_rows))
        if target < src.rdd.getNumPartitions():
            src = src.coalesce(target)
    return src.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: filters to images, validates metadata JVM-side,
    and passes batches through the (stubbed) kernel which raises — the
    documented not-in-this-container path."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode libraries are not available in this container; "
            "wire PIL/opencv here in a real deployment"
        )
        yield  # pragma: no cover

    imgs = media.filter(F.col("media_type") == "image")
    return imgs.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan: computes the frame timestamps JVM-side
    (pure column math on metadata — real), leaving only the pixel
    decode stubbed."""
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
