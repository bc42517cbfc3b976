"""Property-based tests (hypothesis) for the filename-template engine:
arbitrary literal text round-trips through parse+render, variable values land
verbatim, padding is fixed-width, and unparsable/unsupported templates always
raise TemplateError rather than mis-render."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connector_s3_sink_spark.template import (
    FilenameTemplate,
    GrouperType,
    TemplateError,
)

# literal fragments that contain no template syntax
literal = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="{}", categories=("L", "N", "P", "S")
    ),
    max_size=12,
).filter(lambda s: "{{" not in s and "}}" not in s)

topics = st.text(
    alphabet=st.characters(codec="ascii", categories=("L", "N")), min_size=1, max_size=10
)


@given(pre=literal, mid=literal, post=literal, topic=topics,
       partition=st.integers(0, 10_000), offset=st.integers(0, 2**62))
@settings(max_examples=200, deadline=None)
def test_literals_and_values_round_trip(pre, mid, post, topic, partition, offset):
    tpl = FilenameTemplate(
        pre + "{{topic}}" + mid + "{{partition}}-{{start_offset}}" + post
    )
    assert tpl.grouper_type is GrouperType.TOPIC_PARTITION
    out = tpl.render(topic=topic, partition=partition, start_offset=offset)
    assert out == f"{pre}{topic}{mid}{partition}-{offset}{post}"


@given(offset=st.integers(0, 2**62), partition=st.integers(0, 10_000))
@settings(max_examples=100, deadline=None)
def test_padding_is_fixed_width(offset, partition):
    tpl = FilenameTemplate(
        "{{topic}}-{{partition:padding=true}}-{{start_offset:padding=true}}"
    )
    out = tpl.render(topic="t", partition=partition, start_offset=offset)
    m = re.fullmatch(r"t-(\d{10})-(\d{20})", out)
    assert m, out
    assert int(m.group(1)) == partition and int(m.group(2)) == offset


@given(var=st.text(alphabet=st.characters(codec="ascii", categories=("L",)),
                   min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_unknown_variables_always_raise(var):
    if var in ("topic", "partition", "key", "timestamp") or var in (
        "utc_date", "local_date",
    ):
        return
    with pytest.raises(TemplateError):
        FilenameTemplate("{{topic}}-{{partition}}-{{start_offset}}-{{%s}}" % var)


@given(subset=st.sets(st.sampled_from(["topic", "partition", "start_offset"]),
                      max_size=2))
@settings(max_examples=30, deadline=None)
def test_incomplete_variable_sets_raise(subset):
    """Any proper subset of {topic, partition, start_offset} (without key) is an
    unsupported grouping combo (S3SinkConfigTest.java:801-806)."""
    template = "-".join("{{%s}}" % v for v in sorted(subset)) or "static-name"
    with pytest.raises(TemplateError):
        FilenameTemplate(template)


def test_deprecated_yyyy_unit_rewrite_applies_only_to_prefix():
    # file.name.template rejects uppercase YYYY (S3SinkConfigTest.java:786-807);
    # the rewrite happens only in the prefix property (from_properties).
    with pytest.raises(TemplateError, match="unsupported parameter"):
        FilenameTemplate(
            "{{topic}}-{{partition}}-{{start_offset}}-{{timestamp:unit=YYYY}}"
        )
    from kafka_connector_s3_sink_spark.config import EngineConfig

    cfg = EngineConfig.from_properties(
        {"aws.s3.prefix": "p-{{timestamp:unit=YYYY}}/"}
    )
    assert cfg.prefix == "p-{{timestamp:unit=yyyy}}/"


# Kafka-legal topic fragments that do NOT end in "-<digits>" — names like
# "a-12-3" are inherently ambiguous between (topic "a", partition 12) and
# (topic "a-1", partition 2); the inverse documents greedy-longest-topic for
# those, and the property holds everywhere else. Padded templates have
# fixed-width numeric groups and are NEVER ambiguous (second property).
unambiguous_topics = st.text(
    alphabet=st.characters(codec="ascii", categories=("L", "N")).map(str),
    min_size=1, max_size=12,
).flatmap(
    lambda base: st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz._-", min_size=0, max_size=4
    ).map(lambda tail: (base + tail).strip("-") or base)
).filter(lambda t: t and not __import__("re").search(r"-\d+$", t))


@given(topic=unambiguous_topics, partition=st.integers(0, 10_000),
       offset=st.integers(0, 2**62))
@settings(max_examples=200, deadline=None)
def test_parse_pattern_inverts_render(topic, partition, offset):
    import re

    tpl = FilenameTemplate("{{topic}}-{{partition}}-{{start_offset}}")
    name = tpl.render(topic=topic, partition=partition, start_offset=offset,
                      extension=".gz")
    pattern, groups = tpl.parse_pattern(extension=".gz")
    m = re.match(pattern, name)
    assert m is not None
    assert m.group(groups["topic"]) == topic
    assert int(m.group(groups["partition"])) == partition
    assert int(m.group(groups["start_offset"])) == offset


@given(topic=st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-",
                     min_size=1, max_size=16).filter(lambda t: t.strip()),
       partition=st.integers(0, 10_000), offset=st.integers(0, 2**62))
@settings(max_examples=200, deadline=None)
def test_padded_parse_pattern_unambiguous_for_any_topic(topic, partition, offset):
    """Fixed-width padded groups remove the digit-suffix ambiguity entirely:
    ANY Kafka-legal topic (including ones ending in '-123') round-trips."""
    import re

    tpl = FilenameTemplate(
        "{{topic}}-{{partition:padding=true}}-{{start_offset:padding=true}}"
    )
    name = tpl.render(topic=topic, partition=partition, start_offset=offset)
    pattern, groups = tpl.parse_pattern()
    m = re.match(pattern, name)
    assert m is not None
    assert m.group(groups["topic"]) == topic
    assert int(m.group(groups["partition"])) == partition
    assert int(m.group(groups["start_offset"])) == offset
