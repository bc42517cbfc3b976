from kafka_connector_s3_sink_spark.streaming.pipeline import (
    kafka_source,
    normalize_kafka_stream,
    start_pipeline,
)

__all__ = ["kafka_source", "normalize_kafka_stream", "start_pipeline"]
