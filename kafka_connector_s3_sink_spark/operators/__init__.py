from kafka_connector_s3_sink_spark.operators import (
    dedup,
    grouping,
    multimodal,
    projection,
    relational,
    similarity,
    skew,
    text,
)

__all__ = [
    "dedup",
    "grouping",
    "multimodal",
    "projection",
    "relational",
    "similarity",
    "skew",
    "text",
]
