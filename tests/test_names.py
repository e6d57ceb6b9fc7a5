"""Adversarial round-trip tests for the field-name codec (reference:
hail_scripts/shared/elasticsearch_utils_tests.py:8-36)."""

from __future__ import annotations

import string

from hypothesis import given
from hypothesis import strategies as st

from hail_elasticsearch_pipelines_spark.functions.names import (
    decode_field_name,
    encode_field_name,
)

NASTY = [
    "simple",
    "with.dot",
    "with-dash",
    "with_underscore",
    "with space",
    "trailing.",
    ".leading",
    "many...dots...here",
    "unicode-é-ü-日本語",
    "#hash$dollar%pct",
    "",
    "_x0041_looks-like-escape",
    "a/b\\c",
    "paren(the)sis[and]braces{too}",
    "new\nline\ttab",
    "emoji🎉name",
    "num.123.456",
    "UPPER.Case.Mixed",
]


def test_nasty_roundtrip():
    for name in NASTY:
        enc = encode_field_name(name)
        assert decode_field_name(enc) == name, name
        # encoded output is sink-safe: alnum + underscore only
        assert all(c in string.ascii_letters + string.digits + "_" for c in enc), name


@given(st.text(max_size=40))
def test_property_roundtrip(name):
    assert decode_field_name(encode_field_name(name)) == name
