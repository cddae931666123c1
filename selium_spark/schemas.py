"""Reference-derived stream schemas as Spark StructTypes.

Each StructType corresponds 1:1 to a selium ``.fbs`` wire schema or an
example pipeline's record type (see SURVEY.md §1.2 and FIXTURES.md §B).
Flatbuffers tables map to StructType, ``[T]`` vectors to ArrayType,
``timestamp_ms:ulong`` to TimestampType (event time), payload ``[ubyte]``
to BinaryType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# LogRecord — system/userland/schemas/logging.fbs (fields/spans vectors,
# level enum rendered as string for readability per SURVEY §1.2).
FIELD = T.StructType(
    [T.StructField("key", T.StringType()), T.StructField("value", T.StringType())]
)
SPAN = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("fields", T.ArrayType(FIELD)),
    ]
)
LOG_RECORD = T.StructType(
    [
        T.StructField("log_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),  # timestamp_ms:ulong
        T.StructField("level", T.StringType()),  # enum LogLevel : byte
        T.StructField("target", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("fields", T.ArrayType(FIELD)),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("source_id", T.IntegerType()),  # frame writer_id attribution
    ]
)

# HTTP request metadata — net-hyper ingress (examples/waf, rest-api).
HTTP_REQUEST = T.StructType(
    [
        T.StructField("request_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("method", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("client_ip", T.StringType()),
    ]
)

# WAF verdict — examples/waf/src/lib.rs:101-110 (decision + reason).
VERDICT = T.StructType(
    [
        T.StructField("request_id", T.LongType()),
        T.StructField("decision", T.StringType()),
        T.StructField("reason", T.StringType()),
    ]
)

# FlatResult envelope — system/userland/schemas/result.fbs
# (request_id, payload:[ubyte], error:string).
FLAT_RESULT = T.StructType(
    [
        T.StructField("request_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)

# Orchestrator config/work — examples/orchestrator/schemas/orchestrator.fbs.
CONFIG_UPDATE = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("multiplier", T.IntegerType()),
        T.StructField("note", T.StringType()),
    ]
)
WORK_ITEM = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)

# Multimodal: opaque binary payload + typed metadata (north-star columns).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("bytes", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)
