"""Config validation rules pinned to the reference's S3SinkConfig semantics
(S3SinkConfig.java:687-738, 729-737, 257-295; AwsStsRole.java:27-64)."""

import pytest

from kafka_connector_s3_sink_spark.config import (
    AwsStaticCredentials,
    AwsStsRole,
    CompressionType,
    ConfigValidationError,
    EngineConfig,
    FormatType,
    OutputField,
)


def test_defaults_match_reference():
    c = EngineConfig()
    assert c.format_type is FormatType.CSV
    assert c.file_compression is CompressionType.GZIP  # S3SinkConfig.java:802-813
    assert c.output_fields == (OutputField.VALUE,)
    assert c.file_name_template == "{{topic}}-{{partition}}-{{start_offset}}"
    assert c.file_max_records == 0
    assert c.envelope is True


def test_key_template_limits_max_records():
    EngineConfig(file_name_template="{{key}}", file_max_records=1)
    with pytest.raises(ConfigValidationError, match="file.max.records must be either 1"):
        EngineConfig(file_name_template="{{key}}", file_max_records=2)


def test_part_size_bounds():
    with pytest.raises(ConfigValidationError):
        EngineConfig(part_size_bytes=0)
    with pytest.raises(ConfigValidationError):
        EngineConfig(part_size_bytes=2_000_000_001)
    EngineConfig(part_size_bytes=2_000_000_000)


def test_credentials_xor_role():
    creds = AwsStaticCredentials("id", "secret")
    role = AwsStsRole(role_arn="arn:aws:iam::1:role/r", role_session_name="s")
    with pytest.raises(ConfigValidationError, match="not both"):
        EngineConfig(aws_credentials=creds, aws_sts_role=role)
    EngineConfig(aws_credentials=creds)
    EngineConfig(aws_sts_role=role)


def test_sts_session_duration_bounds():
    with pytest.raises(ConfigValidationError):
        AwsStsRole(role_arn="a", role_session_name="s", session_duration_s=899)
    with pytest.raises(ConfigValidationError):
        AwsStsRole(role_arn="a", role_session_name="s", session_duration_s=43201)


def test_bad_timezone_rejected():
    with pytest.raises(ConfigValidationError, match="timezone"):
        EngineConfig(timestamp_timezone="Mars/Olympus")
    EngineConfig(timestamp_timezone="Europe/Berlin")


def test_negative_max_records_rejected():
    with pytest.raises(ConfigValidationError, match="non-negative"):
        EngineConfig(file_max_records=-1)


def test_duplicate_output_fields_rejected():
    with pytest.raises(ConfigValidationError, match="repeat"):
        EngineConfig(output_fields=(OutputField.VALUE, OutputField.VALUE))


def test_compression_extensions():
    assert CompressionType.GZIP.extension == ".gz"
    assert CompressionType.SNAPPY.extension == ".snappy"
    assert CompressionType.ZSTD.extension == ".zst"
    assert CompressionType.NONE.extension == ""


def test_hadoop_conf_mapping():
    c = EngineConfig(
        aws_credentials=AwsStaticCredentials("AK", "SK"),
        s3_endpoint="http://localhost:9000",
        part_size_bytes=5 * 1024 * 1024,
    )
    conf = c.spark_hadoop_conf()
    assert conf["fs.s3a.multipart.size"] == str(5 * 1024 * 1024)
    assert conf["fs.s3a.access.key"] == "AK"
    assert conf["fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["fs.s3a.path.style.access"] == "true"


# -- properties-map entry point (reference: new S3SinkConfig(Map<String,String>)) --


def test_from_properties_defaults():
    cfg = EngineConfig.from_properties({})
    assert cfg.format_type is FormatType.CSV
    assert cfg.file_compression is CompressionType.GZIP
    assert cfg.output_fields == (OutputField.VALUE,)
    assert cfg.file_name_template == "{{topic}}-{{partition}}-{{start_offset}}"


def test_from_properties_new_name_wins_over_old():
    cfg = EngineConfig.from_properties(
        {
            "file.compression.type": "zstd",
            "output_compression": "gzip",
            "format.output.fields": "key,value",
            "output_fields": "value",
        }
    )
    assert cfg.file_compression is CompressionType.ZSTD
    assert cfg.output_fields == (OutputField.KEY, OutputField.VALUE)


def test_from_properties_old_names_accepted():
    cfg = EngineConfig.from_properties(
        {"output_compression": "none", "output_fields": "value,key,timestamp"}
    )
    assert cfg.file_compression is CompressionType.NONE
    assert cfg.output_fields == (
        OutputField.VALUE,
        OutputField.KEY,
        OutputField.TIMESTAMP,
    )


def test_from_properties_rewrites_deprecated_yyyy_in_prefix():
    cfg = EngineConfig.from_properties(
        {"aws.s3.prefix": "logs-{{timestamp:unit=YYYY}}/"}
    )
    assert cfg.prefix == "logs-{{timestamp:unit=yyyy}}/"


def test_from_properties_credentials_must_pair():
    with pytest.raises(ConfigValidationError):
        EngineConfig.from_properties({"aws.access.key.id": "AK"})


def test_from_properties_static_xor_sts():
    with pytest.raises(ConfigValidationError):
        EngineConfig.from_properties(
            {
                "aws.access.key.id": "AK",
                "aws.secret.access.key": "SK",
                "aws.sts.role.arn": "arn:aws:iam::1:role/r",
                "aws.sts.role.session.name": "s",
            }
        )


def test_from_properties_key_template_enforces_max_records():
    with pytest.raises(ConfigValidationError):
        EngineConfig.from_properties(
            {"file.name.template": "{{key}}", "file.max.records": "5"}
        )
