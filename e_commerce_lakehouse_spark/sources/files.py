"""File-based sources beyond parquet/CSV: ORC, Avro (gated), and
binary-file media ingest.

The reference loads CSV batches and Kafka streams only
(bronze_batch_load.py, streaming_flow.py); a lakehouse ingest tier
additionally meets columnar archives (ORC), schema-registry dumps
(Avro), and raw media directories (the multimodal pipeline's real
input shape — files on object storage, not pre-packed parquet).

Spark's ``binaryFile`` source reads each file as ONE row (path,
modificationTime, length, content) with the file list parallelized
across executors — at 100 TB of media the scan distributes by file,
and ``pathGlobFilter`` prunes non-media files at listing time, before
any byte is read. :func:`read_media_dir` adapts that row shape to the
(media_id, kind, payload) contract of
:func:`~e_commerce_lakehouse_spark.operators.multimodal.media_manifest`
— ingest-to-manifest is two operators with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension -> media kind for the decode dispatch (the sniffer
#: re-checks magic bytes; this only labels the row).
_EXT_KIND = {
    "png": "image",
    "jpg": "image",
    "jpeg": "image",
    "wav": "audio",
    "avi": "video",
}


def read_orc(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """ORC scan (built into Spark — same pushdown/pruning machinery as
    parquet; ``.explain`` shows PushedFilters against the ORC reader).
    ``schema`` pins types schema-first like the CSV source."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — the ``spark-avro`` external module is not bundled
    with a plain pyspark install; raise actionably instead of letting
    the raw 'Failed to find data source' surface."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        msg = str(exc)
        if "Failed to find data source" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            raise RuntimeError(
                "Avro needs the external spark-avro module on the "
                "classpath (--packages org.apache.spark:spark-avro_2.13); "
                "it is not bundled with pyspark"
            ) from exc
        raise  # module present: surface the real error (path, decode, ...)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw file ingest: one row per file — (path, length,
    modificationTime, content). ``glob`` maps to ``pathGlobFilter``
    (listing-time pruning; non-matching files are never opened)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Media-directory ingest shaped for the multimodal tier:
    (media_id, kind, payload, path, length) where ``media_id`` is the
    xxhash64 of the file path (stable across re-lists; collisions at
    2^-64), ``kind`` derives from the extension (the manifest kernel
    re-sniffs magic bytes anyway), and ``payload`` is the raw bytes.
    Feed straight into ``multimodal.media_manifest`` — two operators,
    zero shuffles, distributed by file."""
    ext = F.lower(
        F.element_at(F.split(F.col("path"), r"\."), -1)
    )
    kind_expr = F.lit("unknown")
    for e, k in _EXT_KIND.items():
        kind_expr = F.when(ext == e, F.lit(k)).otherwise(kind_expr)
    return read_binary_files(spark, path, glob).select(
        F.xxhash64("path").alias("media_id"),
        kind_expr.alias("kind"),
        F.col("content").alias("payload"),
        "path",
        "length",
    )


def ingest_media_manifest(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Directory of media files -> decoded manifest in one line (the
    :func:`read_media_dir` + ``media_manifest`` composition)."""
    from ..operators.multimodal import media_manifest

    return media_manifest(read_media_dir(spark, path, glob))


__all__ = [
    "read_orc",
    "write_orc",
    "read_avro",
    "read_binary_files",
    "read_media_dir",
    "ingest_media_manifest",
]
