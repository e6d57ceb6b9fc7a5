"""Snippet assembly — the user-facing half of the ES highlighter.

``match_char_spans`` (operators/bm25.py) yields raw (token_pos, start,
end) offsets; this module composes them into highlighted fragments:
the best window of ``window_chars`` characters (the one containing the
most whole match spans; ties break earliest — deterministic), matched
terms wrapped in pre/post tags, ellipses marking truncation.  The
reference gets this from the ES ``highlight`` API on its exported
index; here it is native and shared verbatim by the distributed
searcher (Arrow batches) and the serving tier (plain calls), so both
produce byte-identical fragments.

Offsets index into ``NFC(text).lower()`` — the tokenizer's input.  The
snippet is sliced from ``NFC(text)`` (original casing) when lowering
preserved length (always true for the ASCII+Latin-1 range the corpus
emits), else from the lowered text, so offsets always align.
"""

from __future__ import annotations

import re
import unicodedata

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def match_spans(text: str, terms: set[str]) -> list[tuple[int, int, str]]:
    """Every query-term occurrence as (start, end, term), ascending —
    the same scan as IndexSearcher.match_char_spans (token_pos order ==
    start order)."""
    ltext = unicodedata.normalize("NFC", text).lower()
    return [
        (m.start(), m.end(), m.group(0))
        for m in _TOKEN_RE.finditer(ltext)
        if m.group(0) in terms
    ]


def best_window(
    spans: list[tuple[int, int, str]], window_chars: int
) -> tuple[int, int]:
    """Index range [i, j) of the spans maximizing how many WHOLE match
    spans fit inside one ``window_chars``-wide character window; ties
    break on the earliest window.  Two-pointer over the sorted spans —
    O(n)."""
    best = (0, 0)
    j = 0
    for i in range(len(spans)):
        if j < i:
            j = i
        while j < len(spans) and spans[j][1] - spans[i][0] <= window_chars:
            j += 1
        if j - i > best[1] - best[0]:
            best = (i, j)
    return best


def py_highlight(
    text: str | None,
    terms: set[str] | list[str],
    window_chars: int = 120,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    ellipsis: str = "…",
) -> tuple[str | None, int]:
    """(snippet, n_matches_in_window) for one document; (None, 0) when
    no query term occurs.  The snippet is the best window, widened to
    ``window_chars`` around its spans, every matched term wrapped in
    the tags, ellipses marking cut text on either side."""
    if text is None:
        return None, 0
    terms = set(terms)
    ntext = unicodedata.normalize("NFC", text)
    ltext = ntext.lower()
    display = ntext if len(ntext) == len(ltext) else ltext
    spans = match_spans(text, terms)
    if not spans:
        return None, 0
    i, j = best_window(spans, window_chars)
    win = spans[i:j]
    first_s, last_e = win[0][0], win[-1][1]
    # widen symmetrically to window_chars, clamped to the text
    slack = max(0, window_chars - (last_e - first_s))
    lo = max(0, first_s - slack // 2)
    hi = min(len(display), lo + max(window_chars, last_e - first_s))
    lo = max(0, min(lo, hi - window_chars)) if hi - lo < window_chars else lo
    # avoid splitting a token at the cut: advance to a boundary
    while lo > 0 and lo < len(display) and display[lo - 1].isalnum() and display[lo].isalnum():
        lo += 1
    while hi < len(display) and hi > 0 and display[hi - 1].isalnum() and display[hi].isalnum():
        hi -= 1
    frag = display[lo:hi]
    # splice tags back-to-front so earlier offsets stay valid
    for s, e, _t in reversed(win):
        if s < lo or e > hi:
            continue
        frag = (
            frag[: s - lo] + pre_tag + frag[s - lo : e - lo] + post_tag
            + frag[e - lo :]
        )
    if lo > 0:
        frag = ellipsis + frag
    if hi < len(display):
        frag = frag + ellipsis
    return frag, j - i
