"""Kafka ingest variant of the file-source WAL tail.

The reference ingests over gRPC/TCP (server/grpc_server.go:125 Put,
server/tcp2_server.go PUSH frames); at cluster scale the equivalent front
door is a Kafka topic. This module is the code-compatible swap for
``stream_ingest``: same downstream contract (a streaming long-format
points frame feeding ``NexusEngine.ingest_frame`` via foreachBatch), only
the source differs.

Wire format: ONE MESSAGE = ONE POINT, as JSON with explicitly typed
fields — the JSON rendering of the reference's binary FieldValues
encoding (core/fields.go:63-99 writes a per-field type tag + typed
payload; here vtype + one typed column):

    {"metric": "cpu.usage", "tags": {"host": "a"},
     "ts": 1672531200000000000,
     "fields": [{"name": "v", "vtype": "float", "f_double": 99.9},
                {"name": "status", "vtype": "int", "f_long": 200}]}

One-point-per-message matters operationally: all long rows of a point
stay in one micro-batch, so ``ingest_frame``'s same-seq-per-point
contract holds across batch boundaries.

The parse path (``parse_kafka_points``) is pure DataFrame code and fully
tested here; the reader (``kafka_source``) needs the spark-sql-kafka
connector on the classpath, which this container doesn't ship — it is a
thin, untested-by-necessity builder kept separate so everything else
stays covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, LongType, MapType, StringType,
    StructField, StructType,
)

# JSON schema of one point on the wire (typed fields array)
POINT_WIRE_SCHEMA = StructType([
    StructField("metric", StringType(), False),
    StructField("tags", MapType(StringType(), StringType()), True),
    StructField("ts", LongType(), False),
    StructField("fields", ArrayType(StructType([
        StructField("name", StringType(), False),
        StructField("vtype", StringType(), False),
        StructField("f_double", DoubleType(), True),
        StructField("f_long", LongType(), True),
        StructField("f_string", StringType(), True),
        StructField("f_bool", BooleanType(), True),
    ])), False),
])


def parse_kafka_points(df: DataFrame) -> DataFrame:
    """Kafka-shaped frame (binary ``value``) -> long-format points frame
    (metric, tags, ts, field, vtype, f_*) ready for ``ingest_frame``.

    Malformed messages parse to null and are dropped (the validate-on-
    write rejection path, engine2/adapter.go:452-454 — a poison message
    must not wedge the stream). Works identically on batch and streaming
    frames; all JVM-side (from_json + explode, no Python in the loop).
    """
    parsed = df.select(
        F.from_json(F.col("value").cast("string"), POINT_WIRE_SCHEMA).alias("p"))
    return (
        parsed.filter(F.col("p").isNotNull() & F.col("p.metric").isNotNull())
        .select("p.metric", "p.tags", "p.ts", F.explode("p.fields").alias("f"))
        .select(
            "metric", "tags", "ts",
            F.col("f.name").alias("field"),
            F.col("f.vtype").alias("vtype"),
            F.col("f.f_double").alias("f_double"),
            F.col("f.f_long").alias("f_long"),
            F.col("f.f_string").alias("f_string"),
            F.col("f.f_bool").alias("f_bool"),
        )
    )


def kafka_source(spark: SparkSession, bootstrap_servers: str, topic: str,
                 starting_offsets: str = "latest",
                 max_offsets_per_trigger: int | None = None) -> DataFrame:
    """Raw Kafka reader (requires the spark-sql-kafka connector jar).
    ``max_offsets_per_trigger`` bounds micro-batch size — the group-commit
    batching knob (wal/wal.go:191-195) translated to stream backpressure."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_stream_ingest(spark: SparkSession, bootstrap_servers: str,
                        topic: str, **source_opts) -> DataFrame:
    """The Kafka twin of ``stream_ingest``: source + parse, returning the
    long-format streaming frame the engine sink consumes."""
    return parse_kafka_points(
        kafka_source(spark, bootstrap_servers, topic, **source_opts))


def encode_point_json(metric: str, tags: dict[str, str],
                      fields: dict[str, object], ts: int) -> str:
    """Producer-side helper: one point -> one wire message (the client
    encoder, for tests and for python producers)."""
    import json
    from nexusbase_spark.engine import _typed
    fs = []
    for name, val in fields.items():
        vtype, fd, fl, fstr, fb = _typed(val)
        fs.append({"name": name, "vtype": vtype, "f_double": fd,
                   "f_long": fl, "f_string": fstr, "f_bool": fb})
    return json.dumps({"metric": metric, "tags": tags, "ts": ts, "fields": fs})
