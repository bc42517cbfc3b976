from kafka_connector_s3_sink_spark.formats.render import record_line_column
from kafka_connector_s3_sink_spark.formats.compression import open_compressed, read_compressed

__all__ = ["record_line_column", "open_compressed", "read_compressed"]
