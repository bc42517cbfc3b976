"""Confluent Schema Registry client (HTTP) for the Avro converter.

The reference wires `AvroConverter` to a Schema Registry over HTTP
(`AvroIntegrationTest.java:135-137`, `SchemaRegistryContainer.java` runs one
in its integration harness); payloads carry a 4-byte schema id and the
converter fetches the writer schema by id. This module is that client, built
on stdlib ``urllib`` only (public Confluent REST API shapes:
``GET /schemas/ids/{id}`` → ``{"schema": "<avro json>"}``,
``GET /subjects/{subject}/versions/latest`` → ``{"id": N, "schema": …}``).

Spark shape: the registry is a DRIVER-side concern. ``collect_schema_ids``
discovers the distinct ids a payload column actually carries (one JVM-side
distinct over a 4-byte slice — no Python, no registry calls per row), the
client resolves each id ONCE (memoized), and the resulting id→schema map is
baked into ``decode_avro_column``'s broadcastable closure. Executors never
open a connection — at 1000 executors the registry sees one resolver, not a
thundering herd.
"""

from __future__ import annotations

import base64
import json
import ssl
import time
import urllib.error
import urllib.request

from kafka_connector_s3_sink_spark.formats.avro import AvroError


class SchemaRegistryError(AvroError):
    """Registry lookup failed (unknown id, unreachable server, bad payload)."""


class SchemaRegistryClient:
    """Minimal Confluent-REST client: schema-by-id and latest-by-subject,
    with memoization (ids are immutable in the registry — a cached schema is
    cached forever) and bounded retry with exponential backoff for transient
    5xx/connection failures. 4xx errors do not retry — an unknown id stays
    unknown.

    Production knobs a hosted Confluent registry needs on day one:
    ``auth=(user, password)`` sends HTTP basic auth (the
    ``basic.auth.user.info`` config of the reference's converter stack);
    ``ca_file`` pins a private CA bundle for TLS endpoints (corporate
    registries are rarely on public trust roots). Both are optional and
    default to the reference's anonymous-plaintext test posture
    (`AvroIntegrationTest.java:135-137`)."""

    def __init__(
        self,
        base_url: str,
        timeout: float = 10.0,
        retries: int = 3,
        backoff_s: float = 0.2,
        auth: tuple[str, str] | None = None,
        ca_file: str | None = None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.retries = retries
        self.backoff_s = backoff_s
        self._cache: dict[int, str] = {}
        self._auth_header: str | None = None
        if auth is not None:
            user, password = auth
            token = base64.b64encode(f"{user}:{password}".encode()).decode()
            self._auth_header = f"Basic {token}"
        self._ssl_context = (
            ssl.create_default_context(cafile=ca_file) if ca_file else None
        )

    # -- HTTP plumbing ----------------------------------------------------

    def _get_json(self, path: str) -> dict:
        url = f"{self.base_url}{path}"
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                req = urllib.request.Request(url)
                if self._auth_header is not None:
                    req.add_header("Authorization", self._auth_header)
                with urllib.request.urlopen(
                    req, timeout=self.timeout, context=self._ssl_context
                ) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code < 500:  # 4xx: permanent — don't hammer the registry
                    raise SchemaRegistryError(
                        f"registry returned {e.code} for {url}"
                    ) from e
                last = e
            except (urllib.error.URLError, TimeoutError, json.JSONDecodeError) as e:
                last = e
            if attempt < self.retries:
                time.sleep(self.backoff_s * (2**attempt))
        raise SchemaRegistryError(
            f"registry unreachable after {self.retries + 1} attempts: {url}"
        ) from last

    # -- public API -------------------------------------------------------

    def get_schema(self, schema_id: int) -> str:
        """Writer schema JSON for a Confluent schema id (memoized)."""
        if schema_id not in self._cache:
            body = self._get_json(f"/schemas/ids/{int(schema_id)}")
            if "schema" not in body:
                raise SchemaRegistryError(
                    f"registry response for id {schema_id} has no 'schema' key"
                )
            self._cache[schema_id] = body["schema"]
        return self._cache[schema_id]

    def schema_map(self, schema_ids) -> dict[int, str]:
        """id→schema-JSON map for ``decode_avro_column(schema_json=...)``."""
        return {int(i): self.get_schema(int(i)) for i in schema_ids}

    def latest(self, subject: str) -> tuple[int, str]:
        """(schema_id, schema JSON) of a subject's latest version — the
        producer-side lookup (`encode(value, schema, confluent_schema_id=id)`)."""
        body = self._get_json(f"/subjects/{subject}/versions/latest")
        try:
            sid, schema = int(body["id"]), body["schema"]
        except KeyError as e:
            raise SchemaRegistryError(
                f"registry response for subject {subject!r} missing {e}"
            ) from e
        self._cache[sid] = schema
        return sid, schema


def client_from_properties(
    props: dict, prefix: str = "value.converter."
) -> SchemaRegistryClient:
    """Build a client from the reference's Kafka-Connect converter keys
    (the worker config a Confluent AvroConverter user already has —
    ``value.converter.schema.registry.url``,
    ``…basic.auth.credentials.source=USER_INFO`` +
    ``…basic.auth.user.info=user:pass``; `AvroIntegrationTest.java:135-137`
    configures the url form). Unknown credential sources raise — silently
    ignoring an auth setting would turn a misconfiguration into anonymous
    requests against a production registry."""
    url = props.get(f"{prefix}schema.registry.url")
    if not url:
        raise ValueError(f"missing {prefix}schema.registry.url")
    auth = None
    source = props.get(f"{prefix}basic.auth.credentials.source")
    if source is not None:
        if source != "USER_INFO":
            raise ValueError(
                f"unsupported {prefix}basic.auth.credentials.source={source!r}; "
                "only USER_INFO is implemented"
            )
        info = props.get(f"{prefix}basic.auth.user.info", "")
        user, sep, password = info.partition(":")
        if not sep:
            raise ValueError(
                f"{prefix}basic.auth.user.info must be 'user:password'"
            )
        auth = (user, password)
    return SchemaRegistryClient(url, auth=auth)


def decode_with_registry(
    df,
    column: str,
    client_or_url,
    output_column: str = "decoded",
    schema_id_column: str | None = None,
):
    """The reference's AvroConverter flow in one call: discover the distinct
    schema ids the payload column carries (JVM-side), resolve each once
    through the registry (driver-side, memoized), and decode against the
    evolution-merged struct. Accepts a ``SchemaRegistryClient`` or a base
    URL. The id discovery is one extra scan of a 4-byte slice — for a
    micro-batch that is the right trade against shipping a registry client
    to every executor."""
    from kafka_connector_s3_sink_spark.formats.avro import decode_avro_column

    client = (
        client_or_url
        if isinstance(client_or_url, SchemaRegistryClient)
        else SchemaRegistryClient(client_or_url)
    )
    ids = collect_schema_ids(df, column)
    if not ids:
        raise SchemaRegistryError(
            f"no Confluent-framed schema ids found in column {column!r}"
        )
    return decode_avro_column(
        df,
        column,
        client.schema_map(ids),
        output_column=output_column,
        confluent_framing=True,
        schema_id_column=schema_id_column,
    )


def collect_schema_ids(df, column: str) -> list[int]:
    """Distinct Confluent schema ids present in a framed BinaryType column:
    byte 0 is the magic (0), bytes 1-4 the big-endian id. One JVM-side
    distinct over a 4-byte slice — O(distinct ids) result, no Python, no
    per-row registry traffic. Run it on a batch (or one micro-batch) to know
    which schemas to resolve before decoding.

    Only rows that actually LOOK framed contribute (length ≥ 5 and magic
    byte 0 — the same validation ``formats.avro.decode`` applies): a bare or
    truncated payload must not yield a bogus id that 404s at the registry
    (or worse, resolves to a real but wrong schema) and aborts the whole
    decode."""
    from pyspark.sql import functions as F

    col = F.col(column)
    rows = (
        df.filter(
            (F.length(col) >= 5) & (F.substring(col, 1, 1) == F.lit(b"\x00"))
        )
        .select(
            F.conv(F.hex(F.substring(col, 2, 4)), 16, 10)
            .cast("long")
            .alias("sid")
        )
        .filter(F.col("sid").isNotNull())
        .distinct()
        .collect()
    )
    return sorted(int(r["sid"]) for r in rows)
