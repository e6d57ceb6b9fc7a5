"""Round-trip + merge tests for posting-list codecs.

Reference test-strategy analog: adversarial round-trip tests of the
field-name codec (hail_scripts/shared/elasticsearch_utils_tests.py:8-36)
extended with randomized arrays per SURVEY §5.5."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.functions import codecs


@pytest.mark.parametrize("codec", ["pfor", "varint"])
@pytest.mark.parametrize("seed", range(8))
def test_roundtrip_random(codec, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3000))
    gap_scale = int(rng.choice([1, 2, 100, 10_000, 10_000_000]))
    docs = np.cumsum(rng.integers(1, gap_scale + 1, n))
    tfs = rng.integers(1, int(rng.choice([2, 10, 1000])), n).clip(1)
    dls = rng.integers(0, 2001, n)
    blob, blast, bmaxtf, boff = codecs.encode_postings(docs, tfs, dls=dls, codec=codec)
    d, t, dl = codecs.decode_postings(blob)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(dl, dls)
    # block metadata consistent
    assert len(blast) == len(boff) == len(bmaxtf) == (n + 127) // 128
    for bi in range(len(boff)):
        db, tb, dlb, _ = codecs.decode_block(blob, int(boff[bi]))
        lo, hi = bi * 128, min((bi + 1) * 128, n)
        np.testing.assert_array_equal(db, docs[lo:hi])
        np.testing.assert_array_equal(tb, tfs[lo:hi])
        np.testing.assert_array_equal(dlb, dls[lo:hi])
        assert blast[bi] == docs[hi - 1]
        assert bmaxtf[bi] == tfs[lo:hi].max()


def test_empty_and_singleton():
    e = np.array([], dtype=np.int64)
    blob, bl, bm, bo = codecs.encode_postings(e, e)
    d, t, dl = codecs.decode_postings(blob)
    assert d.size == 0 and t.size == 0
    blob, *_ = codecs.encode_postings(np.array([7]), np.array([3]), dls=np.array([15]))
    d, t, dl = codecs.decode_postings(blob)
    assert list(d) == [7] and list(t) == [3] and list(dl) == [15]


def test_rejects_unsorted_and_zero_tf():
    with pytest.raises(ValueError):
        codecs.encode_postings(np.array([5, 3]), np.array([1, 1]))
    with pytest.raises(ValueError):
        codecs.encode_postings(np.array([3, 5]), np.array([1, 0]))


def test_merge_disjoint_ranges():
    rng = np.random.default_rng(42)
    parts, all_docs, all_tfs, all_dls = [], [], [], []
    base = 0
    for _ in range(5):
        n = int(rng.integers(1, 400))
        docs = base + np.cumsum(rng.integers(1, 50, n))
        base = int(docs[-1]) + int(rng.integers(1, 1000))
        tfs = rng.integers(1, 20, n)
        dls = rng.integers(1, 500, n)
        parts.append(codecs.encode_postings(docs, tfs, dls=dls))
        all_docs.append(docs)
        all_tfs.append(tfs)
        all_dls.append(dls)
    blob, blast, bmaxtf, boff = codecs.merge_encoded(parts)
    d, t, dl = codecs.decode_postings(blob)
    np.testing.assert_array_equal(d, np.concatenate(all_docs))
    np.testing.assert_array_equal(t, np.concatenate(all_tfs))
    np.testing.assert_array_equal(dl, np.concatenate(all_dls))
    # random access still works post-merge
    for bi in range(len(boff)):
        db, *_ = codecs.decode_block(blob, int(boff[bi]))
        assert db[-1] == blast[bi]


def test_merge_rejects_overlap():
    a = codecs.encode_postings(np.array([1, 10]), np.array([1, 1]))
    b = codecs.encode_postings(np.array([5, 20]), np.array([1, 1]))
    with pytest.raises(ValueError):
        codecs.merge_encoded([a, b])


def test_pfor_beats_varint_on_dense_lists():
    rng = np.random.default_rng(1)
    docs = np.cumsum(rng.integers(1, 4, 50_000))
    tfs = rng.integers(1, 4, 50_000)
    pfor, *_ = codecs.encode_postings(docs, tfs, codec="pfor")
    vint, *_ = codecs.encode_postings(docs, tfs, codec="varint")
    assert len(pfor) < len(vint)
    assert len(pfor) / 50_000 < 1.5  # ~sub-1.5 bytes/posting on dense lists
