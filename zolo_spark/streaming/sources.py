"""Streaming source factories: Kafka (production transport) and the
rate source (load/latency rehearsal without external infra).

The engine's streaming pipelines (:mod:`zolo_spark.streaming.intraday`)
take any DataFrame with the events schema, so transports are swappable:
file source for tests, rate source for throughput rehearsal, Kafka in
deployment. The Kafka factory is import-gated — the connector jar
(``spark-sql-kafka-0-10``) is not baked into this container, so the
factory raises a clear error locally while remaining the documented
production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .intraday import EVENTS_SCHEMA


def parse_kafka_wire(raw: DataFrame) -> DataFrame:
    """Kafka wire rows (binary ``value`` holding a JSON-encoded events
    record, per the connector's fixed output schema) → typed events
    rows. Factored out of :func:`kafka_events_stream` so everything
    downstream of the socket — binary decode, JSON parse, schema
    projection, then any window/sink — is exercised END TO END by
    pytest through a file-source stream carrying the identical wire
    schema (this container has no Kafka connector jar and no network
    to fetch one; see COVERAGE.md). A malformed value parses to a NULL
    struct → an all-NULL row, Kafka-connector-standard permissive
    behavior the e2e pins."""
    return (
        raw.select(F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA)
                   .alias("e"))
        .select("e.*")
    )


def kafka_events_stream(spark: SparkSession, bootstrap_servers: str,
                        topic: str, starting_offsets: str = "latest") -> DataFrame:
    """Kafka transport for the events stream: value is a JSON-encoded
    events row; parsed into the shared schema so downstream windows
    are transport-agnostic.

    Requires the ``spark-sql-kafka-0-10`` connector package on the
    cluster (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
    Raises RuntimeError with that hint when the connector is absent.
    """
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # connector jar missing in this image
        raise RuntimeError(
            "Kafka connector unavailable — add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
        ) from e
    return parse_kafka_wire(raw)


def rate_events_stream(spark: SparkSession, rows_per_second: int = 1000,
                       n_event_types: int = 4) -> DataFrame:
    """Synthetic events stream from Spark's built-in rate source —
    deterministic shape (value-derived fields), arbitrary volume.
    Used to rehearse watermark/state sizing: crank ``rows_per_second``
    and watch state-store metrics, no Kafka needed."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value (monotonic long)
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 997).alias("user_id"),
        F.concat(F.lit("type_"), (F.col("value") % n_event_types))
        .alias("event_type"),
        F.round((F.col("value") % 10000) / 100.0, 2).alias("value"),
        F.to_json(F.struct((F.col("value") % 10).alias("k"))).alias("props"),
    )
