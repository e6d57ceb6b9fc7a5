"""Phrase suggestion assembly — the ES phrase suggester's candidate
generation + ranking, shared by both engines.

ES's phrase suggester (the did-you-mean over multi-term input the
reference's users get from the ES API) generates per-position
candidate corrections from the terms index, scores whole corrections
with a word language model, and optionally collates (verifies the
corrected phrase actually matches).  The analog here:

  * per-position candidates come from the termdict fuzzy expansion
    (edit distance ≤ max_edits, df-ranked — the direct generator);
  * the language model is a smoothed UNIGRAM over document frequency:
    lp(df) = ln((df + 0.5) / (n_docs + 1)) — the index stores no
    bigram shingles, so stupid-backoff degenerates to its unigram
    floor; smoothing keeps unindexed tokens finite (they just score
    terribly, which is exactly what makes corrections win);
  * corrections change at most ``max_errors`` positions (beam search,
    exact for the default beam width vs candidate counts);
  * ``confidence``-style gate: only corrections scoring STRICTLY
    above the input phrase are suggested, and the identity correction
    never is.

Everything here is pure Python over (term, df) pairs — both searchers
resolve candidates from their termdict and hand them in, so the
distributed and serving paths are identical by construction, and the
DuckDB oracle can reproduce the same arithmetic in SQL.
"""

from __future__ import annotations

import heapq
import math


def unigram_logprob(df: int, n_docs: int) -> float:
    """Smoothed unigram log-probability of a term with document
    frequency ``df`` in an ``n_docs`` corpus."""
    return math.log((df + 0.5) / (n_docs + 1.0))


def assemble_phrase_suggestions(
    tokens: "list[str]",
    candidates: "list[list[tuple[str, int]]]",
    n_docs: int,
    size: int = 5,
    max_errors: int = 1,
    beam: int = 64,
) -> "list[tuple[str, float]]":
    """Ranked corrections of ``tokens``: [(suggestion, score)] by
    (score desc, suggestion asc), at most ``size`` rows.

    ``candidates[i]`` lists position i's candidate terms with their
    global df — it must CONTAIN the original token (with its df,
    possibly 0) so "keep this position" is always a choice.  At most
    ``max_errors`` positions may differ from the input.  Scores are
    position-ordered float64 sums of :func:`unigram_logprob` (the
    deterministic-summation contract everywhere else).  The identity
    correction is excluded; survivors must score strictly above it."""
    if not tokens or len(candidates) != len(tokens):
        raise ValueError("candidates must align 1:1 with tokens")
    dfs = [dict(c) for c in candidates]
    for i, t in enumerate(tokens):
        if t not in dfs[i]:
            raise ValueError(
                f"candidates[{i}] must include the original token {t!r}"
            )
    input_score = 0.0
    for i, t in enumerate(tokens):
        input_score += unigram_logprob(dfs[i][t], n_docs)
    # beam over positions: states (score, n_changed, terms)
    states: "list[tuple[float, int, tuple[str, ...]]]" = [(0.0, 0, ())]
    for i in range(len(tokens)):
        nxt: "list[tuple[float, int, tuple[str, ...]]]" = []
        for score, changed, terms in states:
            for cand, df in candidates[i]:
                c = changed + (cand != tokens[i])
                if c > max_errors:
                    continue
                nxt.append(
                    (score + unigram_logprob(df, n_docs), c, terms + (cand,))
                )
        # keep the best `beam` states (score desc, suggestion asc)
        states = heapq.nsmallest(beam, nxt, key=lambda s: (-s[0], s[2]))
        if not states:
            return []
    out = [
        (" ".join(terms), score)
        for score, _changed, terms in states
        if list(terms) != tokens and score > input_score
    ]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[: int(size)]
