"""ES phrase suggester: beam-assembled multi-term corrections ranked
by a smoothed unigram LM over termdict dfs, with collation.

Reference analog: the ES suggest API over the exported index (the
reference delegates all query handling to ES)."""

from __future__ import annotations

import math

import pytest

from hail_elasticsearch_pipelines_spark.functions.suggest import (
    assemble_phrase_suggestions,
    unigram_logprob,
)


class TestKernel:
    N = 1000

    def lp(self, df):
        return unigram_logprob(df, self.N)

    def test_single_error_ranking_and_gates(self):
        tokens = ["teh", "cat"]
        cands = [
            [("the", 900), ("ten", 50), ("teh", 0)],
            [("cat", 120), ("car", 80)],
        ]
        out = assemble_phrase_suggestions(tokens, cands, self.N, size=10)
        texts = [s for s, _ in out]
        # best correction first; identity absent; scores exact sums
        assert texts[0] == "the cat"
        assert "teh cat" not in texts
        got = dict(out)
        assert got["the cat"] == pytest.approx(
            self.lp(900) + self.lp(120), abs=0
        )
        # every suggestion beats the input score strictly
        inp = self.lp(0) + self.lp(120)
        assert all(sc > inp for sc in got.values())
        # max_errors=1: "ten car" (two changes) must not appear
        assert "ten car" not in texts

    def test_max_errors_two_allows_double_corrections(self):
        tokens = ["teh", "caz"]
        cands = [
            [("the", 900), ("teh", 0)],
            [("cat", 120), ("caz", 0)],
        ]
        one = assemble_phrase_suggestions(
            tokens, cands, self.N, size=10, max_errors=1
        )
        two = assemble_phrase_suggestions(
            tokens, cands, self.N, size=10, max_errors=2
        )
        assert "the cat" not in [s for s, _ in one]
        assert [s for s, _ in two][0] == "the cat"

    def test_requires_original_token(self):
        with pytest.raises(ValueError, match="original token"):
            assemble_phrase_suggestions(
                ["a"], [[("b", 3)]], self.N
            )

    def test_score_is_position_ordered_sum(self):
        tokens = ["x", "y", "z"]
        cands = [
            [("x", 10), ("q", 500)],
            [("y", 20)],
            [("z", 30)],
        ]
        out = assemble_phrase_suggestions(tokens, cands, self.N, size=5)
        want = self.lp(500) + self.lp(20) + self.lp(30)
        assert out[0] == ("q y z", want)
        assert math.isfinite(want)


class TestEngines:
    def test_parity_and_collation(self, spark, small_index):
        from hail_elasticsearch_pipelines_spark.operators.bm25 import (
            IndexSearcher,
        )
        from hail_elasticsearch_pipelines_spark.operators.serve import (
            LocalSearcher,
        )

        index_dir, _ = small_index
        s, L = IndexSearcher(spark, index_dir), LocalSearcher(index_dir)
        for text in ("thw term0042", "of thw", "term9999"):
            d = [tuple(r) for r in s.suggest_phrase(text, size=5).collect()]
            loc = L.suggest_phrase(text, size=5)
            assert d == loc, text
        # a real misspelling corrects to the real term
        out = L.suggest_phrase("thw term0042", size=5)
        assert out and out[0][0].startswith("the ")
        # collation keeps only corrections that actually match as AND
        col = L.suggest_phrase("thw term0042", size=5, collate=True)
        assert col
        for sugg, _sc in col:
            assert L.search_count(sorted(set(sugg.split())), "AND") > 0
        assert set(col) <= set(out)
        dcol = [
            tuple(r)
            for r in s.suggest_phrase(
                "thw term0042", size=5, collate=True
            ).collect()
        ]
        assert dcol == col
