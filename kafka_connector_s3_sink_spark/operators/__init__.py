from kafka_connector_s3_sink_spark.operators import (
    dedup,
    grouping,
    incremental,
    multimodal,
    packing,
    projection,
    relational,
    sampling,
    similarity,
    skew,
    text,
)

__all__ = [
    "dedup",
    "grouping",
    "incremental",
    "multimodal",
    "packing",
    "projection",
    "relational",
    "sampling",
    "similarity",
    "skew",
    "text",
]
