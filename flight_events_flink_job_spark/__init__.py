"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference stream job ``flight-events-flink-job``.

The reference (see SURVEY.md) is a Flink DataStream job that parses JSON
flight events from Kafka, enriches them (delay flag normalization +
derived ``delay_minutes``), and fans out into delay notifications plus
three tumbling-window aggregations served from ClickHouse tables.

This engine re-expresses that surface Spark-first:

- the relational core is pure ``DataFrame -> DataFrame`` functions
  (``operators/``) that Catalyst plans and optimizes;
- sources/sinks adapt the driver fixtures and the Kafka-shaped payload
  contract (``sources/``);
- the driver contract surface (queries + DuckDB oracles) lives in
  ``plans/registry.py``.

See SURVEY.md §7 for the build plan; modules land in that order.
"""

__version__ = "0.1.0"
