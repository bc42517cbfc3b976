"""PySpark-native streaming ETL engine with the data-processing surface of the
Aiven S3 sink connector for Apache Kafka (reference: 777Egor777/kafka-connector-s3-sink,
studied read-only in SURVEY.md), plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Everything here is idiomatic DataFrame/SQL: the logical plan is declared with
``pyspark.sql`` expressions and Catalyst/Tungsten pick the physical strategy; Python
touches data only in the object-writer sink (I/O-bound) and in clearly-marked
Pandas-UDF paths.
"""

from kafka_connector_s3_sink_spark.config import CompressionType, EngineConfig, FormatType, OutputField
from kafka_connector_s3_sink_spark.template import FilenameTemplate, GrouperType

__all__ = [
    "CompressionType",
    "EngineConfig",
    "FilenameTemplate",
    "FormatType",
    "GrouperType",
    "OutputField",
]

__version__ = "0.1.0"
