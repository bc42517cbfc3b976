from kafka_connector_s3_sink_spark.sources.audit import (
    audit_sink_output,
    read_manifest,
    repair_sink_output,
)
from kafka_connector_s3_sink_spark.sources.datasource import (
    SinkObjectsDataSource,
)
from kafka_connector_s3_sink_spark.sources.objects import (
    read_sink_objects,
    sink_object_lines,
    stream_sink_objects,
)

__all__ = [
    "SinkObjectsDataSource",
    "audit_sink_output",
    "read_manifest",
    "repair_sink_output",
    "read_sink_objects",
    "sink_object_lines",
    "stream_sink_objects",
]
