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


# -- exact validation-message parity (S3SinkConfigTest.java:214-934 pins every
# rule's error string; these assert the same strings byte-for-byte) --


def _message(excinfo):
    return str(excinfo.value)


def test_part_size_messages_match_reference():
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig(part_size_bytes=0)
    assert _message(e) == (
        "Invalid value 0 for configuration aws.s3.part.size.bytes: "
        "Part size must be greater than 0"
    )
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig(part_size_bytes=2_000_000_001)
    assert _message(e) == (
        "Invalid value 2000000001 for configuration aws.s3.part.size.bytes: "
        "Part size must be no more: 2000000000 bytes (2GB)"
    )


def test_backoff_bound_messages_match_reference():
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig(backoff_delay_ms=0)
    assert _message(e) == (
        "Invalid value 0 for configuration aws.s3.backoff.delay.ms: "
        "Value must be at least 1"
    )
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig(backoff_max_delay_ms=0)
    assert _message(e) == (
        "Invalid value 0 for configuration aws.s3.backoff.max.delay.ms: "
        "Value must be at least 1"
    )
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig(backoff_max_retries=0)
    assert _message(e) == (
        "Invalid value 0 for configuration aws.s3.backoff.max.retries: "
        "Value must be at least 1"
    )
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig(backoff_max_retries=35)
    assert _message(e) == (
        "Invalid value 35 for configuration aws.s3.backoff.max.retries: "
        "Value must be no more than 30"
    )


def test_sts_duration_messages_match_reference():
    with pytest.raises(ConfigValidationError) as e:
        AwsStsRole(role_arn="a", role_session_name="s", session_duration_s=30)
    assert _message(e) == (
        "Invalid value 30 for configuration aws.sts.role.session.duration: "
        "Value must be at least 900"
    )
    with pytest.raises(ConfigValidationError) as e:
        AwsStsRole(role_arn="a", role_session_name="s", session_duration_s=50000)
    assert _message(e) == (
        "Invalid value 50000 for configuration aws.sts.role.session.duration: "
        "Value must be no more than 43200"
    )


def test_empty_credentials_rejected_with_reference_message():
    # blank credentials must be an error, never silently "no credentials"
    for name in ("aws.access.key.id", "aws_access_key_id"):
        with pytest.raises(ConfigValidationError) as e:
            EngineConfig.from_properties({name: "", "aws.secret.access.key": "SK"})
        assert _message(e) == (
            f"Invalid value [hidden] for configuration {name}: "
            "Password must be non-empty"
        )
    for name in ("aws.secret.access.key", "aws_secret_access_key"):
        with pytest.raises(ConfigValidationError) as e:
            EngineConfig.from_properties({"aws.access.key.id": "AK", name: ""})
        assert _message(e) == (
            f"Invalid value [hidden] for configuration {name}: "
            "Password must be non-empty"
        )


def test_empty_string_props_rejected_with_reference_message():
    for name in ("aws.s3.bucket.name", "aws_s3_bucket", "aws.s3.prefix",
                 "aws_s3_prefix", "aws.s3.endpoint", "aws_s3_endpoint"):
        with pytest.raises(ConfigValidationError) as e:
            EngineConfig.from_properties({name: ""})
        assert _message(e) == (
            f"Invalid value  for configuration {name}: String must be non-empty"
        )


def test_invalid_endpoint_url_message():
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig.from_properties({"aws.s3.endpoint": "ffff://asdsadas"})
    assert _message(e) == (
        "Invalid value ffff://asdsadas for configuration aws.s3.endpoint: "
        "should be valid URL"
    )


def test_output_fields_messages_match_reference():
    for name in ("format.output.fields", "output_fields"):
        with pytest.raises(ConfigValidationError) as e:
            EngineConfig.from_properties({name: ""})
        assert _message(e) == (
            f"Invalid value [] for configuration {name}: cannot be empty"
        )
        with pytest.raises(ConfigValidationError) as e:
            EngineConfig.from_properties(
                {name: "key,value,offset,timestamp,unsupported"}
            )
        assert _message(e) == (
            "Invalid value [key, value, offset, timestamp, unsupported] "
            f"for configuration {name}: "
            "supported values are: 'key', 'value', 'offset', 'timestamp', 'headers'"
        )


def test_compression_and_format_messages_match_reference():
    for name in ("file.compression.type", "output_compression"):
        with pytest.raises(ConfigValidationError) as e:
            EngineConfig.from_properties({name: "unsupported"})
        assert _message(e) == (
            f"Invalid value unsupported for configuration {name}: "
            "supported values are: 'none', 'gzip', 'snappy', 'zstd'"
        )
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig.from_properties({"format.output.type": "unknown"})
    assert _message(e) == (
        "Invalid value unknown for configuration format.output.type: "
        "supported values are: 'csv', 'json', 'jsonl', 'parquet'"
    )


def test_yyyy_template_message_matches_reference():
    tpl = "{{topic}}-{{timestamp:unit=YYYY}}-{{partition}}-{{start_offset:padding=true}}.gz"
    with pytest.raises(ConfigValidationError) as e:
        EngineConfig(file_name_template=tpl)
    assert _message(e) == (
        f"Invalid value {tpl} for configuration file.name.template: "
        "unsupported set of template variables parameters, supported sets are: "
        "partition:padding=true|false,start_offset:padding=true|false,"
        "timestamp:unit=yyyy|MM|dd|HH"
    )


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
