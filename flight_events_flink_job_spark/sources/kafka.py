"""S1/S2: Kafka source and sink adapters (KafkaUtils.java:15-38).

The reference consumes topic ``flight-events`` as value-only strings
(KU:22, KU:25) and produces notification JSON to
``flight-delay-notifications`` (KU:34). These builders are the Spark
twins; the rest of the engine is source-agnostic — every transformation
takes a DataFrame with a string ``value`` column, so the file-stream
twin in streaming/job.py and these Kafka adapters feed the identical
pipeline.

Deliberate semantic upgrades over the reference, documented not hidden:

- KU:17/:23-24 uses a fresh consumer group per run + latest offsets +
  auto-commit → at-most-once, no replay. We default to
  ``startingOffsets=latest`` for parity but checkpointed Structured
  Streaming tracks offsets itself (exactly-once per sink epoch for file
  sinks) — strictly better delivery.
- The sandbox has no Kafka broker and no spark-sql-kafka connector jar,
  so ``.load()``/``.start()`` here are exercised in tests only up to
  option plumbing; wire-level behavior is the connector's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader, DataStreamWriter

DEFAULT_BOOTSTRAP = "kafka:9092"  # KU:13
SOURCE_TOPIC = "flight-events"  # KU:22
NOTIFICATION_TOPIC = "flight-delay-notifications"  # KU:34


def kafka_source_options(
    bootstrap: str = DEFAULT_BOOTSTRAP,
    topic: str = SOURCE_TOPIC,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """The EXACT option map handed to the Kafka source — factored out
    of the reader builder so a broker-less contract test can pin every
    string against KafkaUtils.java:15-28 (a typo in a connector option
    silently falls back to defaults at runtime; the test is the only
    guard this sandbox can have)."""
    return {
        "kafka.bootstrap.servers": bootstrap,  # KU:13/:21
        "subscribe": topic,  # KU:22 setTopics
        "startingOffsets": starting_offsets,  # KU:17/:24 latest
    }


def kafka_sink_options(
    checkpoint_dir: str,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    topic: str = NOTIFICATION_TOPIC,
) -> dict[str, str]:
    """The EXACT option map handed to the Kafka sink (KU:30-38)."""
    return {
        "kafka.bootstrap.servers": bootstrap,  # KU:32
        "topic": topic,  # KU:34
        "checkpointLocation": checkpoint_dir,  # Spark-side exactly-once ledger
    }


def kafka_source_reader(
    spark: SparkSession,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    topic: str = SOURCE_TOPIC,
    starting_offsets: str = "latest",
) -> DataStreamReader:
    """Configured (unloaded) streaming reader for the flight-events topic."""
    return spark.readStream.format("kafka").options(
        **kafka_source_options(bootstrap, topic, starting_offsets)
    )


def kafka_events(
    spark: SparkSession,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    topic: str = SOURCE_TOPIC,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Unbounded DataFrame of raw JSON payloads, shaped exactly like the
    file-stream twin: one string column ``value`` (KU:25's
    SimpleStringSchema = value-only deserialization)."""
    return (
        kafka_source_reader(spark, bootstrap, topic, starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_notification_writer(
    notifications: DataFrame,
    checkpoint_dir: str,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    topic: str = NOTIFICATION_TOPIC,
) -> DataStreamWriter:
    """Configured (unstarted) writer producing notification JSON strings
    to the notification topic (KU:30-38; payload built by
    operators/notifications.py, byte-exact per quirk Q7).

    Expects a DataFrame with a ``notification`` string column; emits it
    as the Kafka record value (the reference sends value-only records,
    KU:33-36).
    """
    return (
        notifications.select(F.col("notification").alias("value"))
        .writeStream.format("kafka")
        .options(**kafka_sink_options(checkpoint_dir, bootstrap, topic))
    )
