from kafka_connector_s3_sink_spark.streaming.ingest import (
    IngestConfig,
    documents_from_records,
    process_crawl_batch,
    read_ingest_packs,
    start_ingest_pipeline,
)
from kafka_connector_s3_sink_spark.streaming.pipeline import (
    kafka_source,
    normalize_kafka_stream,
    split_dead_letters,
    start_pipeline,
)

__all__ = [
    "IngestConfig",
    "documents_from_records",
    "kafka_source",
    "normalize_kafka_stream",
    "process_crawl_batch",
    "read_ingest_packs",
    "split_dead_letters",
    "start_ingest_pipeline",
    "start_pipeline",
]
