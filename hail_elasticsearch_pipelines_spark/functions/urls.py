"""URL canonicalization — the Common-Crawl-pipeline staple that runs
before any url-keyed dedupe: the same page is crawled as
``HTTP://Site.com/a?utm_source=x&b=1#frag`` and ``http://site.com/a?b=1``
and must key identically.

Rules (the common conservative subset):
  * strip the fragment
  * lowercase scheme and host
  * drop default ports (``:80`` for http, ``:443`` for https)
  * drop tracking params (``utm_*``, ``gclid``, ``fbclid``)
  * sort the remaining query params (order never changes semantics)
  * collapse trailing slashes on the path (except the bare root)

Implemented twice, kept in lockstep by tests:
  * :func:`canonicalize_url_col` — pure Spark ``Column`` expressions
    (regexp + array higher-order functions, whole-stage codegen; no
    Python crosses the boundary — this runs over 10^12 rows before the
    dedupe shuffle, so it must stay JVM-side), used by
    ``dedup_exact(..., key=canonicalize_url_col("url"))``-style flows.
  * :func:`py_canonicalize_url` — the reference implementation for
    tests and driver-side use.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING_RE = r"^(utm_[^=&]*|gclid|fbclid)(=|$)"


def canonicalize_url_col(col: Column) -> Column:
    u = F.regexp_replace(col, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    # no scheme → not a normalizable absolute url; pass through trimmed
    return F.when(scheme == "", F.trim(col)).otherwise(canon)


def py_canonicalize_url(url: str) -> str:
    """Reference twin of :func:`canonicalize_url_col`."""
    u = re.sub(r"#.*$", "", url)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    if not m:
        return url.strip()
    scheme = m.group(1).lower()
    rest = u[m.end():]
    hp_match = re.match(r"^([^/?]*)", rest)
    hostport = hp_match.group(1).lower()
    if scheme == "http":
        hostport = re.sub(r":80$", "", hostport)
    elif scheme == "https":
        hostport = re.sub(r":443$", "", hostport)
    pathq = rest[hp_match.end():]
    path = re.match(r"^([^?]*)", pathq).group(1)
    path = re.sub(r"/+$", "", path) or "/"
    qm = re.search(r"\?(.*)$", pathq)
    params = [
        p
        for p in (qm.group(1).split("&") if qm else [])
        if p and not re.match(_TRACKING_RE, p)
    ]
    qs = "&".join(sorted(params))
    return f"{scheme}://{hostport}{path}" + (f"?{qs}" if qs else "")
