"""Streaming sources for the events feed.

File-based streaming (parquet directory) is the scale-appropriate
source here: on a real cluster the events land as files in object
storage and Structured Streaming's file source gives exactly-once
ingestion with checkpointed file tracking.  A Kafka source would slot
in with the same downstream plan (the window builders are
source-agnostic DataFrame functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_schema() -> T.StructType:
    """Explicit schema — streaming file sources must not infer (schema
    inference would re-list and sample files per restart)."""
    return EVENTS_SCHEMA


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a parquet directory of event files.

    ``maxFilesPerTrigger`` bounds per-micro-batch work — at 100 TB the
    backlog must be admitted incrementally, not as one giant batch.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)
