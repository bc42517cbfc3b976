"""Schema Registry client against a real local HTTP server: schema-by-id
with memoization, latest-by-subject, retry/backoff on 5xx, permanent 4xx,
and the full wire path — discover ids in framed payloads, resolve them over
HTTP once, decode with the evolution-merged struct."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.formats import avro, registry

SCHEMA_V1 = json.dumps(
    {
        "type": "record",
        "name": "User",
        "fields": [{"name": "name", "type": "string"}],
    }
)
SCHEMA_V2 = json.dumps(
    {
        "type": "record",
        "name": "User",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "blocked", "type": "boolean", "default": False},
        ],
    }
)


class _Registry(BaseHTTPRequestHandler):
    schemas = {7: SCHEMA_V1, 9: SCHEMA_V2}
    subjects = {"users-value": (9, SCHEMA_V2)}
    requests_seen: list = []
    fail_next = 0  # serve this many 500s before succeeding
    require_auth: str | None = None  # expected Authorization header value

    def do_GET(self):  # noqa: N802 (stdlib naming)
        _Registry.requests_seen.append(self.path)
        if _Registry.require_auth is not None and (
            self.headers.get("Authorization") != _Registry.require_auth
        ):
            self.send_response(401)
            self.end_headers()
            return
        if _Registry.fail_next > 0:
            _Registry.fail_next -= 1
            self.send_response(500)
            self.end_headers()
            return
        if self.path.startswith("/schemas/ids/"):
            sid = int(self.path.rsplit("/", 1)[-1])
            if sid in self.schemas:
                body = json.dumps({"schema": self.schemas[sid]})
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body.encode())
            else:
                self.send_response(404)
                self.end_headers()
        elif self.path.startswith("/subjects/") and self.path.endswith(
            "/versions/latest"
        ):
            subject = self.path.split("/")[2]
            sid, schema = self.subjects[subject]
            body = json.dumps({"id": sid, "version": 1, "schema": schema})
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body.encode())
        else:
            self.send_response(404)
            self.end_headers()

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def registry_url():
    server = HTTPServer(("127.0.0.1", 0), _Registry)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _client(registry_url, **kw):
    kw.setdefault("backoff_s", 0.01)
    return registry.SchemaRegistryClient(registry_url, **kw)


def test_get_schema_and_memoization(registry_url):
    c = _client(registry_url)
    _Registry.requests_seen.clear()
    assert json.loads(c.get_schema(7)) == json.loads(SCHEMA_V1)
    assert json.loads(c.get_schema(7)) == json.loads(SCHEMA_V1)
    assert _Registry.requests_seen == ["/schemas/ids/7"]  # second hit cached


def test_unknown_id_is_permanent_error(registry_url):
    c = _client(registry_url)
    _Registry.requests_seen.clear()
    with pytest.raises(registry.SchemaRegistryError, match="404"):
        c.get_schema(12345)
    assert len(_Registry.requests_seen) == 1  # 4xx did not retry


def test_retry_then_success(registry_url):
    c = _client(registry_url, retries=3)
    _Registry.requests_seen.clear()
    _Registry.fail_next = 2
    assert json.loads(c.get_schema(9)) == json.loads(SCHEMA_V2)
    assert len(_Registry.requests_seen) == 3  # two 500s, then 200


def test_exhausted_retries_raise(registry_url):
    c = _client(registry_url, retries=1)
    c._cache.clear()
    _Registry.fail_next = 5
    with pytest.raises(registry.SchemaRegistryError, match="unreachable"):
        c.get_schema(7)
    _Registry.fail_next = 0


def test_latest_by_subject(registry_url):
    c = _client(registry_url)
    sid, schema = c.latest("users-value")
    assert sid == 9 and json.loads(schema) == json.loads(SCHEMA_V2)
    _Registry.requests_seen.clear()
    assert c.get_schema(9)  # latest() primed the id cache
    assert _Registry.requests_seen == []


def test_basic_auth_header_sent_and_required(registry_url):
    """An auth-requiring registry: anonymous requests 401 (a permanent 4xx,
    no retry hammering); a client constructed with auth=(user, pass) sends
    the standard basic header and succeeds."""
    import base64

    expected = "Basic " + base64.b64encode(b"svc-user:s3cr3t").decode()
    _Registry.require_auth = expected
    try:
        anon = _client(registry_url)
        _Registry.requests_seen.clear()
        with pytest.raises(registry.SchemaRegistryError, match="401"):
            anon.get_schema(7)
        assert len(_Registry.requests_seen) == 1  # 401 did not retry

        authed = _client(registry_url, auth=("svc-user", "s3cr3t"))
        assert json.loads(authed.get_schema(7)) == json.loads(SCHEMA_V1)
    finally:
        _Registry.require_auth = None


def test_client_from_connect_properties(registry_url):
    """The reference's converter config keys build a working client: url +
    USER_INFO basic auth; bad credential sources and malformed user info
    raise instead of degrading to anonymous."""
    import base64

    expected = "Basic " + base64.b64encode(b"cc-user:pw").decode()
    _Registry.require_auth = expected
    try:
        c = registry.client_from_properties(
            {
                "value.converter.schema.registry.url": registry_url,
                "value.converter.basic.auth.credentials.source": "USER_INFO",
                "value.converter.basic.auth.user.info": "cc-user:pw",
            }
        )
        assert json.loads(c.get_schema(7)) == json.loads(SCHEMA_V1)
    finally:
        _Registry.require_auth = None

    with pytest.raises(ValueError, match="schema.registry.url"):
        registry.client_from_properties({})
    with pytest.raises(ValueError, match="only USER_INFO"):
        registry.client_from_properties(
            {
                "value.converter.schema.registry.url": registry_url,
                "value.converter.basic.auth.credentials.source": "SASL_INHERIT",
            }
        )
    with pytest.raises(ValueError, match="user:password"):
        registry.client_from_properties(
            {
                "value.converter.schema.registry.url": registry_url,
                "value.converter.basic.auth.credentials.source": "USER_INFO",
                "value.converter.basic.auth.user.info": "no-colon",
            }
        )


def test_collect_schema_ids_skips_unframed_and_truncated(spark):
    """Framing validation: rows without the Confluent magic byte or shorter
    than the 5-byte frame must not contribute bogus ids (which would 404 at
    the registry or resolve to a wrong schema)."""
    framed = avro.encode(
        {"name": "zoe"}, avro.parse_schema(SCHEMA_V1), confluent_schema_id=7
    )
    rows = [
        (1, framed),
        (2, b"raw-json-not-avro"),  # no magic byte → huge bogus id if read
        (3, framed[:3]),  # truncated below the 5-byte frame
        (4, b""),  # empty payload
        (5, None),  # null payload
    ]
    df = spark.createDataFrame(rows, "offset long, value binary")
    assert registry.collect_schema_ids(df, "value") == [7]


def test_decode_with_registry_one_call(spark, registry_url):
    """decode_with_registry = discover + resolve + decode in one call, from
    a bare URL."""
    df = spark.createDataFrame(
        [
            (
                1,
                avro.encode(
                    {"name": "zoe"}, avro.parse_schema(SCHEMA_V1), confluent_schema_id=7
                ),
            )
        ],
        "offset long, value binary",
    )
    out = registry.decode_with_registry(df, "value", registry_url)
    assert out.collect()[0]["decoded"]["name"] == "zoe"


def test_end_to_end_decode_via_registry(spark, registry_url):
    """The reference's AvroConverter flow (AvroIntegrationTest.java:135-137):
    framed payloads → discover distinct ids JVM-side → resolve each id once
    over HTTP → per-record decode with the evolution-merged struct."""
    payloads = [
        (
            1,
            avro.encode(
                {"name": "ann"}, avro.parse_schema(SCHEMA_V1), confluent_schema_id=7
            ),
        ),
        (
            2,
            avro.encode(
                {"name": "bob", "blocked": True},
                avro.parse_schema(SCHEMA_V2),
                confluent_schema_id=9,
            ),
        ),
    ]
    df = spark.createDataFrame(payloads, "offset long, value binary")

    ids = registry.collect_schema_ids(df, "value")
    assert ids == [7, 9]

    c = _client(registry_url)
    _Registry.requests_seen.clear()
    schema_map = c.schema_map(ids)
    assert len(_Registry.requests_seen) == len(ids)  # one fetch per id, total

    out = avro.decode_avro_column(
        df,
        "value",
        schema_map,
        confluent_framing=True,
        schema_id_column="sid",
    )
    rows = {r["offset"]: r for r in out.collect()}
    assert rows[1]["sid"] == 7
    assert rows[1]["decoded"]["name"] == "ann"
    assert rows[1]["decoded"]["blocked"] is None  # v1 payload, merged struct
    assert rows[2]["sid"] == 9
    assert rows[2]["decoded"]["blocked"] is True
