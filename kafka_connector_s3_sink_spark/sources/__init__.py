from kafka_connector_s3_sink_spark.sources.audit import (
    audit_sink_output,
    read_manifest,
    repair_sink_output,
)
from kafka_connector_s3_sink_spark.sources.datasource import (
    SinkObjectsDataSource,
)
from kafka_connector_s3_sink_spark.sources.warc import (
    WarcDataSource,
    enrich_crawl_documents,
    read_warc,
    warc_documents,
    write_warc,
    write_wet,
)
from kafka_connector_s3_sink_spark.sources.objects import (
    read_sink_objects,
    sink_object_lines,
    stream_sink_objects,
)

__all__ = [
    "SinkObjectsDataSource",
    "WarcDataSource",
    "enrich_crawl_documents",
    "read_warc",
    "warc_documents",
    "write_warc",
    "write_wet",
    "audit_sink_output",
    "read_manifest",
    "repair_sink_output",
    "read_sink_objects",
    "sink_object_lines",
    "stream_sink_objects",
]
