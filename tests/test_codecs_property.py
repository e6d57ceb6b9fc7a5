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


@given(
    st.lists(
        st.tuples(
            st.integers(1, 60),            # postings per term
            st.integers(1, 2**40),         # gap scale
        ),
        min_size=1,
        max_size=12,
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_batch_encoders_byte_identical_to_scalar(specs, rnd):
    """encode_postings_batch / encode_position_lists_batch must produce
    the exact bytes of the scalar encoders for any input shape."""
    import numpy as np

    from hail_elasticsearch_pipelines_spark.functions import codecs

    rng = np.random.default_rng(rnd.randint(0, 2**31))
    docs, tfs, dls, poss, offs, po = [], [], [], [], [0], [0]
    for n, scale in specs:
        gaps = rng.integers(1, scale + 1, n)
        docs.append(np.cumsum(gaps))
        tf = rng.integers(1, 6, n)
        tfs.append(tf)
        dls.append(rng.integers(1, 5000, n))
        p = [np.sort(rng.choice(10000, t, replace=False)) for t in tf]
        poss.append(np.concatenate(p))
        offs.append(offs[-1] + n)
        po.append(po[-1] + int(tf.sum()))
    D, TF, DL = (np.concatenate(x) for x in (docs, tfs, dls))
    P, O, PO = np.concatenate(poss), np.array(offs), np.array(po)
    batch = codecs.encode_postings_batch(D, TF, DL, O)
    pbatch = codecs.encode_position_lists_batch(P, TF, PO, O)
    for t in range(len(O) - 1):
        lo, hi = O[t], O[t + 1]
        blob, bl, bm, bo = codecs.encode_postings(D[lo:hi], TF[lo:hi], dls=DL[lo:hi])
        b2, l2, m2, o2, mind2 = batch[t]
        assert blob == b2
        assert np.array_equal(bl, l2) and np.array_equal(bm, m2) and np.array_equal(bo, o2)
        starts = np.arange(0, hi - lo, codecs.BLOCK_SIZE)
        assert np.array_equal(np.minimum.reduceat(DL[lo:hi], starts), mind2)
        assert codecs.encode_position_lists(P[PO[t]:PO[t+1]], TF[lo:hi]) == pbatch[t]


def test_batch_encode_trailing_hapax_after_wide_gap_term():
    """Regression: a trailing term whose final block has exactly one doc
    (n % BLOCK_SIZE == 1, here a hapax) creates an EMPTY trailing
    segment in the flat gap stream.  The old _segment_reduceat clipped
    that segment's out-of-range start back into the previous segment,
    truncating the previous term's max/n_exc reduction — when that
    term ended in a large (exception-width) gap, the written n_exc
    header disagreed with the emitted exception bytes and the blob
    failed to decode ('buffer is smaller than requested size')."""
    rng = np.random.default_rng(7)
    dA = np.sort(rng.choice(1000, 19, replace=False)).astype(np.int64)
    dA = np.concatenate([dA, [10_000_000]])  # huge final gap → exception
    tA = rng.integers(1, 5, 20).astype(np.int64)
    lA = rng.integers(10, 50, 20).astype(np.int64)
    dB = np.array([42_000_000], dtype=np.int64)
    tB = np.array([3], dtype=np.int64)
    lB = np.array([17], dtype=np.int64)
    flat_d = np.concatenate([dA, dB])
    flat_t = np.concatenate([tA, tB])
    flat_l = np.concatenate([lA, lB])
    off = np.array([0, 20, 21], dtype=np.int64)
    batch = codecs.encode_postings_batch(flat_d, flat_t, flat_l, off)
    assert batch[0][0] == codecs.encode_postings(dA, tA, dls=lA)[0]
    assert batch[1][0] == codecs.encode_postings(dB, tB, dls=lB)[0]
    d, t, dl = codecs.decode_postings(batch[0][0])
    np.testing.assert_array_equal(d, dA)

    # multi-block variant: last term has 128*k + 1 postings so its FINAL
    # block is the 1-doc one (ADVICE's n % 128 == 1 shape).
    nB2 = codecs.BLOCK_SIZE + 1
    dB2 = np.cumsum(rng.integers(1, 50, nB2)).astype(np.int64)
    tB2 = rng.integers(1, 5, nB2).astype(np.int64)
    lB2 = rng.integers(10, 50, nB2).astype(np.int64)
    flat_d = np.concatenate([dA, dB2])
    flat_t = np.concatenate([tA, tB2])
    flat_l = np.concatenate([lA, lB2])
    off = np.array([0, 20, 20 + nB2], dtype=np.int64)
    batch = codecs.encode_postings_batch(flat_d, flat_t, flat_l, off)
    assert batch[0][0] == codecs.encode_postings(dA, tA, dls=lA)[0]
    assert batch[1][0] == codecs.encode_postings(dB2, tB2, dls=lB2)[0]
