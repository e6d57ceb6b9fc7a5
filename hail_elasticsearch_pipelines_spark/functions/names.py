"""Reversible field-name codec for sink-safe column names.

Reference behavior parity (NOT a code copy): the reference escapes
field names before export so arbitrary Hail field names survive the
Elasticsearch mapping, with a decode inverse and adversarial round-trip
tests (hail_scripts/shared/elasticsearch_utils.py:21-85,
elasticsearch_utils_tests.py:8-36).  Our index manifest needs the same
property for parquet/Iceberg column names.

Scheme (fresh design): characters outside ``[A-Za-z0-9]`` are escaped
as ``_xHHHH_`` (4-hex-digit codepoint for BMP, ``_XHHHHHHHH_`` beyond);
a literal underscore is escaped too, making decode unambiguous: every
``_x``/``_X`` in encoded output starts an escape.
"""

from __future__ import annotations

import re

_SAFE_RE = re.compile(r"[A-Za-z0-9]")
_DECODE_RE = re.compile(r"_x([0-9a-fA-F]{4})_|_X([0-9a-fA-F]{8})_")


def encode_field_name(name: str) -> str:
    out = []
    for ch in name:
        if _SAFE_RE.match(ch):
            out.append(ch)
        else:
            cp = ord(ch)
            out.append(f"_x{cp:04x}_" if cp <= 0xFFFF else f"_X{cp:08x}_")
    return "".join(out)


def decode_field_name(name: str) -> str:
    def _sub(m: re.Match) -> str:
        h = m.group(1) or m.group(2)
        return chr(int(h, 16))

    return _DECODE_RE.sub(_sub, name)
