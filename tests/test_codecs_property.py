"""Property-based codec tests (SURVEY §5.5: extend the reference's
adversarial round-trip discipline with randomized arrays).

Hypothesis generates doc-id/tf/dl/position shapes the hand-written
cases may miss: huge gaps, single-element lists, block-boundary sizes,
max-width values."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hail_elasticsearch_pipelines_spark.functions import codecs
from hail_elasticsearch_pipelines_spark.functions.names import (
    decode_field_name,
    encode_field_name,
)


@st.composite
def postings(draw):
    n = draw(st.integers(1, 400))
    gaps = draw(
        st.lists(st.integers(1, 1 << 40), min_size=n, max_size=n)
    )
    docs = np.cumsum(np.asarray(gaps, dtype=np.int64)) - 1
    tfs = np.asarray(draw(st.lists(st.integers(1, 1 << 20), min_size=n, max_size=n)), dtype=np.int64)
    dls = np.asarray(draw(st.lists(st.integers(1, 1 << 20), min_size=n, max_size=n)), dtype=np.int64)
    return docs, tfs, dls


@settings(max_examples=60, deadline=None)
@given(postings(), st.sampled_from(["pfor", "varint"]))
def test_postings_roundtrip(p, codec):
    docs, tfs, dls = p
    blob, blast, bmaxtf, boff = codecs.encode_postings(docs, tfs, dls=dls, codec=codec)
    d, t, dl = codecs.decode_postings(blob)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(dl, dls)
    # block metadata consistency
    starts = np.arange(0, len(docs), codecs.BLOCK_SIZE)
    last_idx = np.minimum(starts + codecs.BLOCK_SIZE, len(docs)) - 1
    np.testing.assert_array_equal(blast, docs[last_idx])
    np.testing.assert_array_equal(bmaxtf, np.maximum.reduceat(tfs, starts))


@settings(max_examples=40, deadline=None)
@given(postings(), st.integers(1, 5))
def test_merge_roundtrip_any_split(p, n_splits):
    """Splitting postings at arbitrary points and concat-merging the
    encoded pieces must reproduce the whole-encode byte-exactly."""
    docs, tfs, dls = p
    whole = codecs.encode_postings(docs, tfs, dls=dls)
    cuts = np.linspace(0, len(docs), n_splits + 1).astype(int)
    parts = []
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        if lo == hi:
            continue
        parts.append(codecs.encode_postings(docs[lo:hi], tfs[lo:hi], dls=dls[lo:hi]))
    merged = codecs.merge_encoded(parts)
    d, t, dl = codecs.decode_postings(merged[0])
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(dl, dls)
    # NOTE: merged bytes differ from whole-encode only in block layout
    # when splits aren't block-aligned; content equality is the contract
    if all((c % codecs.BLOCK_SIZE) == 0 for c in cuts[:-1]):
        assert merged[0] == whole[0]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 1 << 30), min_size=1, max_size=30, unique=True),
        min_size=1,
        max_size=40,
    )
)
def test_positions_roundtrip(pos_lists):
    pos = np.concatenate([np.sort(np.asarray(p, dtype=np.int64)) for p in pos_lists])
    tfs = np.asarray([len(p) for p in pos_lists], dtype=np.int64)
    blob = codecs.encode_position_lists(pos, tfs)
    got, offs = codecs.decode_position_lists(blob, tfs)
    np.testing.assert_array_equal(got, pos)
    np.testing.assert_array_equal(offs, np.concatenate(([0], np.cumsum(tfs))))


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_field_name_codec_roundtrip(name):
    assert decode_field_name(encode_field_name(name)) == name
