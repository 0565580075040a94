"""Structured Streaming ingestion: continuously extract pages as new
crawl files land.

The reference has no streaming (SURVEY.md §2.8) and the north_rule
job is batch; this module exists because a production crawl TABLE is
append-only — the same mapInArrow kernel runs unchanged as a stateless
streaming transform, with exactly-once file-sink semantics via the
checkpoint directory.  Late/duplicate handling: the sink is keyed by
url downstream (idempotent MERGE in Iceberg); here we demonstrate the
file sink + availableNow trigger used by incremental backfills.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from ..kernel.extract import PARITY, ExtractionProfile
from ..operators.extraction import extract_documents

CRAWL_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    profile: ExtractionProfile = PARITY,
    available_now: bool = True,
):
    """readStream(parquet) → mapInArrow extraction → parquet sink.
    Returns the StreamingQuery (caller awaits termination)."""
    stream = (
        spark.readStream.schema(CRAWL_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )
    extracted = extract_documents(stream, profile=profile)
    writer = (
        extracted.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
