"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference stream job ``flight-events-flink-job``.

The reference (see SURVEY.md) is a Flink DataStream job that parses JSON
flight events from Kafka, enriches them (delay flag normalization +
derived ``delay_minutes``), and fans out into delay notifications plus
three tumbling-window aggregations served from ClickHouse tables.

This engine re-expresses that surface Spark-first:

- the relational core is pure ``DataFrame -> DataFrame`` functions
  (``operators/``) that Catalyst plans and optimizes;
- streaming is Structured Streaming over the *same* transformation
  functions (``streaming/``), with event-time windows + watermarks;
- the ClickHouse serving layer becomes Parquet tables written via
  ``foreachBatch`` (``streaming/sinks.py``);
- beyond reference parity, large-scale training-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing) are
  first-class (``operators/dedup.py`` etc.).
"""

__version__ = "0.1.0"
