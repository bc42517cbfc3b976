from kafka_connector_s3_sink_spark.sources.objects import (
    read_sink_objects,
    sink_object_lines,
)

__all__ = ["read_sink_objects", "sink_object_lines"]
