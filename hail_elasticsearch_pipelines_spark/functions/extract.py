"""Deterministic HTML -> text extraction (the graft's "external annotator").

Reference analog: ``hl.vep(mt, block_size=1000)`` — the one computation
not expressible as column expressions, run batched over rows
(hail_scripts/v02/utils/hail_utils.py:103-129), with a deterministic
dummy runner used in tests (luigi_pipeline/lib/hail_vep_runners.py:21).

Here the annotator is HTML->text extraction.  The contract from
BASELINE.json input_hint: *byte-identical extracted text per url*, via
vectorized Arrow UDFs (no per-row Python in the Spark plan — the Python
below runs inside a pandas_udf over Arrow batches).

Pinned extraction rules (no external libs, no locale):
  1. decode bytes as UTF-8 (errors='replace')
  2. drop <script>/<style>/<!-- --> blocks including their content
  3. replace every remaining tag with a single space
  4. decode the 6 HTML entities the corpus generator can emit
     (&amp; &lt; &gt; &quot; &#39; &nbsp;)
  5. NFC-normalize, collapse whitespace runs to one space, strip
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_STYLE_RE = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last so "&amp;lt;" decodes to "&lt;" not "<"
]


def py_extract_text(html: bytes | str | None) -> str:
    """Pure extraction function — the single source of truth.

    Used by (a) the Arrow UDF below, (b) the pytest oracle that asserts
    byte-identical output per url (FIXTURES.md F5).
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    html = _SCRIPT_STYLE_RE.sub(" ", html)
    html = _TAG_RE.sub(" ", html)
    for ent, ch in _ENTITIES:
        html = html.replace(ent, ch)
    html = unicodedata.normalize("NFC", html)
    return _WS_RE.sub(" ", html).strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-vectorized extraction over binary `html` columns.

    Iterator form so one Python worker streams many Arrow batches
    (the analog of VEP's block_size=1000 batching)."""
    for ser in batches:
        yield ser.map(py_extract_text)


def extracted_text_col(text_col: Column | str, html_col: Column | str) -> Column:
    """`text` if present, else extract from `html` (FIXTURES.md F1: ~3%
    of rows have null text and must fall back to html extraction).

    The UDF input is nulled out when `text` exists: Catalyst pulls
    Python UDFs into an ArrowEvalPython node that runs for EVERY row, so
    without the `when` guard the full html bytes of all rows would cross
    the Arrow boundary just to be discarded by coalesce."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    h = F.col(html_col) if isinstance(html_col, str) else html_col
    guarded = F.when(t.isNull(), h)
    return F.coalesce(t, extract_text_udf(guarded))
