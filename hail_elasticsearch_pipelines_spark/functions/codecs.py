"""Posting-list compression codecs (pure Python/numpy, Arrow-UDF-friendly).

Reference analog: the reference delegates posting lists entirely to
Elasticsearch and only tunes its codec knob (`codec=best_compression`,
hail_scripts/shared/elasticsearch_client_v7.py:87-93).  We build the
postings natively, so the codecs live here.  Its closest structural
analog in the reference is the reversible field-name codec with
round-trip tests (hail_scripts/shared/elasticsearch_utils.py:21-85) —
we keep the same test discipline (randomized round-trips).

Two codecs over strictly-ascending doc-id arrays + aligned tf arrays:

* ``VARINT``   — delta + LEB128 varint (simple, the baseline)
* ``PFOR``     — block-wise (128 docs) patched frame-of-reference:
                 per block choose a bit width covering ~90% of values,
                 bit-pack the low bits, store outliers as (pos, high)
                 varint exception pairs.  Block header carries the
                 absolute first doc id so blocks are independently
                 decodable → WAND can skip blocks without decoding.

Block-max metadata (per block: last doc id, max tf, byte offset) is
returned at encode time and stored as plain parquet arrays next to the
blob — the skip index for block-max WAND.

Everything is numpy-vectorized: these functions run inside
mapInPandas/applyInPandas over thousands of terms per partition.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_VERSION_PFOR = 1
_VERSION_VARINT = 2
_ALLOWED_WIDTHS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64)


# ---------------------------------------------------------------- varint

def _varint1(v: int) -> bytes:
    """Scalar LEB128 — fast path for headers/counters (the vectorized
    path has ~80µs fixed overhead, brutal when called per term)."""
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    if vals.size <= 16:  # scalar path beats numpy setup below this size
        return b"".join(_varint1(int(v)) for v in vals)
    # bit length via shift halving (float log2 is lossy past 2**53)
    tmp = vals.copy()
    bl = np.ones(vals.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = tmp >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        tmp[big] >>= np.uint64(shift)
    nbytes = (bl + 6) // 7  # ceil(bitlength / 7) bytes per value
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    work = vals.copy()
    max_b = int(nbytes.max())
    for i in range(max_b):
        mask = nbytes > i
        pos = offsets[:-1][mask] + i
        byte = (work[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > i).astype(np.uint8) << 7
        out[pos] = byte | cont
        work[mask] >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes, count: int, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode `count` varints from buf starting at offset."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(count, dtype=np.uint64)
    pos = offset
    for i in range(count):
        val = 0
        shift = 0
        while True:
            b = arr[pos]
            pos += 1
            val |= (int(b) & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        out[i] = val
    return out, pos


# ------------------------------------------------------------ bit packing

def _pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack vals (< 2**width) into a little-endian bitstream."""
    if width == 0 or vals.size == 0:
        return b""
    v = np.asarray(vals, dtype=np.uint64)
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _gather_packed(
    arr_pad: np.ndarray, vbit: np.ndarray, width: int
) -> np.ndarray:
    """Read ``len(vbit)`` little-endian ``width``-bit values whose bit
    positions are ``vbit``, from a zero-padded uint8 buffer, via an
    8-byte sliding-window gather + shift — ~8 B of index per VALUE
    where the unpackbits path cost ~9 B per BIT.  Valid for width <=
    56 (value + 7 shift bits fit one u64 window) and width == 64
    (byte-aligned, shift 0)."""
    sw = np.lib.stride_tricks.sliding_window_view(arr_pad, 8)
    g = sw[vbit >> 3]
    u = np.ascontiguousarray(g).view("<u8").ravel()
    u >>= (vbit & 7).astype(np.uint64)
    if width < 64:
        u &= (np.uint64(1) << np.uint64(width)) - np.uint64(1)
    return u


def _unpack_bits(buf: bytes, count: int, width: int, offset: int = 0) -> tuple[np.ndarray, int]:
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64), offset
    nbytes = (count * width + 7) // 8
    if width <= 56 or width == 64:
        raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=offset)
        arr_pad = np.empty(nbytes + 8, dtype=np.uint8)
        arr_pad[:nbytes] = raw
        arr_pad[nbytes:] = 0
        vbit = np.arange(count, dtype=np.int64) * width
        return _gather_packed(arr_pad, vbit, width), offset + nbytes
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=offset)
    bits = np.unpackbits(raw, bitorder="little")[: count * width].reshape(count, width)
    powers = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return (bits.astype(np.uint64) * powers).sum(axis=1, dtype=np.uint64), offset + nbytes


def _choose_width(vals: np.ndarray) -> int:
    """Bit width covering the ~90th percentile (NewPFD-style).
    Percentile via np.partition (np.quantile costs ~165µs/call and
    dominated the per-term encode loop)."""
    if vals.size == 0:
        return 0
    cap = int(vals.max()).bit_length()
    if vals.size <= 8:
        return next(w for w in _ALLOWED_WIDTHS if w >= cap)
    k = int(0.90 * (vals.size - 1))
    q = int(np.partition(vals, k)[k])
    need = q.bit_length()
    for w in _ALLOWED_WIDTHS:
        if w >= need:
            # don't bother with exceptions if full width is nearly as small
            full = next(x for x in _ALLOWED_WIDTHS if x >= cap)
            return full if full <= w + 2 else w
    return 64


def _encode_pfor_chunk(vals: np.ndarray) -> bytes:
    """width byte + n_exceptions varint + packed low bits + exceptions.
    Widths go up to 64 (doc-id GAPS exceed 2^32 at 10^12-doc sparsity —
    a 32-bit cap would silently truncate; caught by the Hypothesis
    round-trip property in tests/test_codecs_property.py)."""
    vals = np.asarray(vals, dtype=np.uint64)
    w = _choose_width(vals)
    if w >= 64:
        exc_idx = np.array([], dtype=np.int64)  # nothing exceeds 64 bits
        lows = vals
    elif w:
        exc_idx = np.nonzero(vals >> np.uint64(w))[0]
        lows = vals & ((np.uint64(1) << np.uint64(w)) - np.uint64(1))
    else:
        exc_idx = np.nonzero(vals)[0]
        lows = np.zeros_like(vals)
    parts = [bytes([w]), varint_encode(np.array([len(exc_idx)], dtype=np.uint64))]
    parts.append(_pack_bits(lows, w))
    if len(exc_idx):
        highs = vals[exc_idx] >> np.uint64(w)
        inter = np.empty(2 * len(exc_idx), dtype=np.uint64)
        inter[0::2] = exc_idx.astype(np.uint64)
        inter[1::2] = highs
        parts.append(varint_encode(inter))
    return b"".join(parts)


def _decode_pfor_chunk(buf: bytes, count: int, offset: int) -> tuple[np.ndarray, int]:
    w = buf[offset]
    offset += 1
    (n_exc,), offset = varint_decode(buf, 1, offset)
    vals, offset = _unpack_bits(buf, count, w, offset)
    if n_exc:
        inter, offset = varint_decode(buf, int(n_exc) * 2, offset)
        idx = inter[0::2].astype(np.int64)
        highs = inter[1::2]
        vals[idx] |= highs << np.uint64(w)
    return vals, offset


# --------------------------------------------------------- posting codec

_FLAG_DLS = 0x04  # version byte bit: blocks carry a doc-length stream


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
    codec: str = "pfor",
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """Encode one term's postings (optionally with aligned doc lengths —
    the Lucene-norms analog, stored exactly so BM25 needs no doclens
    join at query time).

    Returns (blob, block_last_doc[int64], block_max_tf[int32],
    block_offsets[int32]) — the latter three are the block-max skip
    index, stored as parquet arrays beside the blob.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    assert tfs.size == n
    if dls is not None:
        dls = np.asarray(dls, dtype=np.int64)
        assert dls.size == n
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly ascending")
    if n and tfs.min() < 1:
        raise ValueError("tfs must be >= 1")
    version = _VERSION_PFOR if codec == "pfor" else _VERSION_VARINT
    if dls is not None:
        version |= _FLAG_DLS
    n_blocks = (n + block_size - 1) // block_size if n else 0
    head = (
        bytes([version])
        + varint_encode(np.array([n], dtype=np.uint64))
        + varint_encode(np.array([n_blocks], dtype=np.uint64))
    )
    body: list[bytes] = []
    block_last, block_maxtf, block_off = [], [], []
    pos = len(head)
    base_codec = version & 0x03
    for bi in range(n_blocks):
        lo, hi = bi * block_size, min((bi + 1) * block_size, n)
        d = doc_ids[lo:hi]
        t = tfs[lo:hi]
        gaps = (np.diff(d) - 1).astype(np.uint64)
        streams = [gaps, (t - 1).astype(np.uint64)]
        if dls is not None:
            streams.append(dls[lo:hi].astype(np.uint64))
        chunk = [varint_encode(np.array([hi - lo, d[0]], dtype=np.uint64))]
        for s in streams:
            if base_codec == _VERSION_PFOR:
                chunk.append(_encode_pfor_chunk(s))
            else:
                chunk.append(varint_encode(np.array([s.size], dtype=np.uint64)) + varint_encode(s))
        cb = b"".join(chunk)
        block_off.append(pos)
        block_last.append(int(d[-1]))
        block_maxtf.append(int(t.max()))
        body.append(cb)
        pos += len(cb)
    blob = head + b"".join(body)
    return (
        blob,
        np.asarray(block_last, dtype=np.int64),
        np.asarray(block_maxtf, dtype=np.int32),
        np.asarray(block_off, dtype=np.int32),
    )


_AW = np.array(_ALLOWED_WIDTHS, dtype=np.int64)


def _bitlen_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized bit length (0 → 0)."""
    tmp = v.astype(np.uint64, copy=True)
    bl = np.zeros(v.shape, dtype=np.int64)
    nz = tmp > 0
    bl[nz] = 1
    for shift in (32, 16, 8, 4, 2, 1):
        big = tmp >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        tmp[big] >>= np.uint64(shift)
    return bl


def _varint_len_vec(v: np.ndarray) -> np.ndarray:
    """Byte length of each value's LEB128 encoding."""
    return (np.maximum(_bitlen_vec(v), 1) + 6) // 7


def _segment_reduceat(ufunc, x: np.ndarray, starts: np.ndarray, sizes: np.ndarray, fill):
    """Per-segment ufunc reduce over a flat stream; empty segments → fill.

    Runs reduceat only over the starts of NON-EMPTY segments: segments
    tile x contiguously, so consecutive non-empty starts bound each
    segment exactly and the last non-empty segment runs to x's end.
    (Clipping an out-of-range trailing empty start back to x.size-1 —
    the old approach — silently truncated the PREVIOUS segment's range,
    corrupting its reduction whenever the stream ended with an empty
    segment, e.g. a final 1-doc block in the gap stream.)"""
    sizes = np.asarray(sizes)
    res = np.full(len(sizes), fill, dtype=x.dtype)
    ne = sizes > 0
    if x.size == 0 or not ne.any():
        return res
    res[ne] = ufunc.reduceat(x, np.asarray(starts)[ne])
    return res


def _pfor_batch(V: np.ndarray, seg_off: np.ndarray):
    """Batched _encode_pfor_chunk over many segments of one flat stream.

    Byte-identical to calling _encode_pfor_chunk per segment (tested),
    but all width selection, exception detection, and bit packing run
    as whole-array numpy ops — the per-term Python encode loop was the
    dominant cost of the partial-index build.

    Returns (widths uint8[S], n_exc int64[S], packed uint8[·],
    packed_off int64[S], packed_len int64[S], exc {seg: bytes})."""
    seg_off = np.asarray(seg_off, dtype=np.int64)
    sizes = np.diff(seg_off)
    S = len(sizes)
    V = np.asarray(V, dtype=np.uint64)
    N = V.size
    starts = seg_off[:-1]

    maxv = _segment_reduceat(np.maximum, V, starts, sizes, np.uint64(0))
    cap = _bitlen_vec(maxv)
    w_full = _AW[np.searchsorted(_AW, cap, side="left")]
    widths = w_full.copy()
    large = np.flatnonzero(sizes > 8)
    if large.size:
        # percentile needs a within-segment sort.  Segments are blocks
        # (<= BLOCK_SIZE values), so pad the large ones into an
        # (L, max_size) matrix and row-sort — one vectorized np.sort
        # instead of a per-segment partition loop or a global lexsort.
        lsizes = sizes[large]
        msz = int(lsizes.max())
        mat = np.full((large.size, msz), np.uint64(0xFFFFFFFFFFFFFFFF))
        rows = np.repeat(np.arange(large.size), lsizes)
        cols = np.arange(int(lsizes.sum())) - np.repeat(
            np.cumsum(lsizes) - lsizes, lsizes
        )
        src = np.repeat(starts[large], lsizes) + cols
        mat[rows, cols] = V[src]
        mat.sort(axis=1)
        k = (0.90 * (lsizes - 1)).astype(np.int64)
        q = mat[np.arange(large.size), k]  # k < size → sentinel unreachable
        w0 = _AW[np.searchsorted(_AW, _bitlen_vec(q), side="left")]
        widths[large] = np.where(
            w_full[large] <= w0 + 2, w_full[large], w0
        )
    widths = widths.astype(np.int64)

    w_e = np.repeat(widths, sizes)
    w_e_u = w_e.astype(np.uint64)
    shift = np.minimum(w_e_u, np.uint64(63))
    hi = np.where(w_e >= 64, np.uint64(0), V >> shift)
    exc_mask = hi != 0
    lows = np.where(
        w_e >= 64, V, V & ((np.uint64(1) << shift) - np.uint64(1))
    )
    n_exc = _segment_reduceat(
        np.add, exc_mask.astype(np.int64), starts, sizes, 0
    )

    plen = (sizes * widths + 7) // 8
    packed_off = np.concatenate(([0], np.cumsum(plen)))[:-1]
    total_pb = int(plen.sum())
    packed = np.zeros(total_pb, dtype=np.uint8)
    if N:
        # pack PER DISTINCT WIDTH: within a width group the bit stream
        # is contiguous per element, so the only shuffling needed is the
        # per-segment byte-alignment padding (one vectorized
        # redistribution), then one packbits per group — no global
        # per-bit fancy scatter (which dominated the first cut).
        for w in np.unique(widths):
            w = int(w)
            if w == 0:
                continue
            segs_w = np.flatnonzero(widths == w)
            sz = sizes[segs_w]
            if not sz.sum():
                continue
            within = np.arange(int(sz.sum())) - np.repeat(
                np.cumsum(sz) - sz, sz
            )
            vals = lows[np.repeat(starts[segs_w], sz) + within]
            js = np.arange(w, dtype=np.uint64)
            bits_flat = (
                ((vals[:, None] >> js) & np.uint64(1)).astype(np.uint8).ravel()
            )
            plen_w = (sz * w + 7) // 8
            gbits = np.zeros(int(plen_w.sum()) * 8, dtype=np.uint8)
            _scatter_bytes(
                gbits,
                (np.cumsum(plen_w) - plen_w) * 8,
                sz * w,
                bits_flat,
                np.cumsum(sz * w) - sz * w,
            )
            gpacked = np.packbits(gbits, bitorder="little")
            _scatter_bytes(
                packed, packed_off[segs_w], plen_w, gpacked,
                np.cumsum(plen_w) - plen_w,
            )

    exc: dict[int, bytes] = {}
    if exc_mask.any():
        exc_elems = np.flatnonzero(exc_mask)
        seg_of_exc = (
            np.searchsorted(seg_off, exc_elems, side="right") - 1
        )
        for s in np.unique(seg_of_exc):
            sel = exc_elems[seg_of_exc == s]
            inter = np.empty(2 * len(sel), dtype=np.uint64)
            inter[0::2] = (sel - starts[s]).astype(np.uint64)
            inter[1::2] = hi[sel]
            exc[int(s)] = varint_encode(inter)
    return widths, n_exc, packed, packed_off, plen, exc


def _scatter_bytes(out, dst_starts, lengths, src, src_starts) -> None:
    """out[dst:dst+L] = src[s:s+L] for many pieces, one fancy gather."""
    lengths = np.asarray(lengths, dtype=np.int64)
    keep = lengths > 0
    dst_starts, lengths, src_starts = (
        np.asarray(dst_starts, np.int64)[keep],
        lengths[keep],
        np.asarray(src_starts, np.int64)[keep],
    )
    total = int(lengths.sum())
    if not total:
        return
    within = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths, lengths)
    out[np.repeat(dst_starts, lengths) + within] = src[
        np.repeat(src_starts, lengths) + within
    ]


def encode_postings_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_offsets: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[tuple[bytes, np.ndarray, np.ndarray, np.ndarray]]:
    """Batched encode_postings over many terms at once: flat postings
    arrays (concatenated per term, ascending doc ids within each term)
    plus term_offsets (len T+1).  Returns per term
    (blob, block_last, block_max_tf, block_off) — BYTE-IDENTICAL to the
    scalar encode_postings (property-tested), just without the per-term
    Python loop that dominated the partial-build profile."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs64 = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    TO = np.asarray(term_offsets, dtype=np.int64)
    n_t = np.diff(TO)
    T = len(n_t)
    version = _VERSION_PFOR | _FLAG_DLS
    N = doc_ids.size

    # ---- global block table (blocks tile the flat arrays contiguously)
    nb_t = (n_t + block_size - 1) // block_size
    B = int(nb_t.sum())
    term_of_block = np.repeat(np.arange(T), nb_t)
    blk_in_term = np.arange(B) - np.repeat(np.cumsum(nb_t) - nb_t, nb_t)
    bs = TO[term_of_block] + blk_in_term * block_size
    be = np.minimum(bs + block_size, TO[term_of_block + 1])
    cnt = be - bs
    first_doc = doc_ids[bs] if B else np.zeros(0, np.int64)
    last_doc = doc_ids[be - 1] if B else np.zeros(0, np.int64)
    maxtf_b = _segment_reduceat(np.maximum, tfs64, bs, cnt, 0) if B else np.zeros(0, np.int64)

    # ---- the three per-block streams
    if N > 1:
        d1 = (doc_ids[1:] - doc_ids[:-1] - 1).astype(np.int64)
        keep = np.ones(N - 1, dtype=bool)
        keep[bs[1:] - 1] = False  # drop pairs straddling block starts
        gaps_flat = d1[keep].astype(np.uint64)
    else:
        gaps_flat = np.zeros(0, np.uint64)
    g_off = np.concatenate(([0], np.cumsum(cnt - 1)))
    t_off = np.concatenate(([0], np.cumsum(cnt)))  # == bs tiling, rebased

    wg, neg, pg, pog, plg, excg = _pfor_batch(gaps_flat, g_off)
    wt, net, pt, pot, plt_, exct = _pfor_batch((tfs64 - 1).astype(np.uint64), t_off)
    wd, ned, pd_, pod, pld, excd = _pfor_batch(dls.astype(np.uint64), t_off)

    # ---- layout: per term head, then per block hdr + 3 chunks
    vl = _varint_len_vec
    L_nt = vl(n_t.astype(np.uint64))
    L_nb = vl(nb_t.astype(np.uint64))
    L_cnt = vl(cnt.astype(np.uint64))
    L_first = vl(first_doc.astype(np.uint64))
    L_ne_g, L_ne_t, L_ne_d = (
        vl(neg.astype(np.uint64)),
        vl(net.astype(np.uint64)),
        vl(ned.astype(np.uint64)),
    )
    le_g = np.array([len(excg.get(i, b"")) for i in range(B)], dtype=np.int64)
    le_t = np.array([len(exct.get(i, b"")) for i in range(B)], dtype=np.int64)
    le_d = np.array([len(excd.get(i, b"")) for i in range(B)], dtype=np.int64)
    L_chunk_g = 1 + L_ne_g + plg + le_g
    L_chunk_t = 1 + L_ne_t + plt_ + le_t
    L_chunk_d = 1 + L_ne_d + pld + le_d
    L_block = L_cnt + L_first + L_chunk_g + L_chunk_t + L_chunk_d
    blk_term_off = np.concatenate(([0], np.cumsum(nb_t)))
    L_blocks_per_term = (
        _segment_reduceat(np.add, L_block, blk_term_off[:-1], nb_t, 0)
        if B else np.zeros(T, np.int64)
    )
    L_term = 1 + L_nt + L_nb + L_blocks_per_term
    term_start = np.concatenate(([0], np.cumsum(L_term)))
    total = int(term_start[-1])
    out = np.zeros(total, dtype=np.uint8)

    # destination offsets: per-block cumulative length within its term
    csum_block = np.cumsum(L_block) - L_block if B else np.zeros(0, np.int64)
    base_per_term = csum_block[blk_term_off[:-1]] if B else np.zeros(T, np.int64)
    base_per_term = np.where(nb_t > 0, base_per_term, 0)
    within_term = csum_block - np.repeat(base_per_term, nb_t)
    hdr_dst = (
        term_start[term_of_block] + 1 + L_nt[term_of_block] + L_nb[term_of_block] + within_term
    )
    cg_dst = hdr_dst + L_cnt + L_first
    ct_dst = cg_dst + L_chunk_g
    cd_dst = ct_dst + L_chunk_t

    # 1. version bytes
    out[term_start[:-1]] = version

    # 2. all varints in one encode + one scatter.  Order: term heads
    # (n, nb), block hdrs (cnt, first), chunk n_excs (g, t, d).
    va = np.concatenate(
        [
            np.stack([n_t, nb_t], axis=1).ravel() if T else np.zeros(0, np.int64),
            np.stack([cnt, first_doc], axis=1).ravel() if B else np.zeros(0, np.int64),
            neg, net, ned,
        ]
    ).astype(np.uint64)
    va_len = np.concatenate(
        [
            np.stack([L_nt, L_nb], axis=1).ravel() if T else np.zeros(0, np.int64),
            np.stack([L_cnt, L_first], axis=1).ravel() if B else np.zeros(0, np.int64),
            L_ne_g, L_ne_t, L_ne_d,
        ]
    )
    va_dst = np.concatenate(
        [
            np.stack([term_start[:-1] + 1, term_start[:-1] + 1 + L_nt], axis=1).ravel()
            if T else np.zeros(0, np.int64),
            np.stack([hdr_dst, hdr_dst + L_cnt], axis=1).ravel()
            if B else np.zeros(0, np.int64),
            cg_dst + 1, ct_dst + 1, cd_dst + 1,
        ]
    )
    enc = np.frombuffer(varint_encode(va), dtype=np.uint8) if va.size else np.zeros(0, np.uint8)
    va_src = np.cumsum(va_len) - va_len
    _scatter_bytes(out, va_dst, va_len, enc, va_src)

    # 3. width bytes
    if B:
        out[cg_dst] = wg.astype(np.uint8)
        out[ct_dst] = wt.astype(np.uint8)
        out[cd_dst] = wd.astype(np.uint8)

    # 4. packed sections
    _scatter_bytes(out, cg_dst + 1 + L_ne_g, plg, pg, pog)
    _scatter_bytes(out, ct_dst + 1 + L_ne_t, plt_, pt, pot)
    _scatter_bytes(out, cd_dst + 1 + L_ne_d, pld, pd_, pod)

    # 5. exception sections (rare; scalar copies)
    for excmap, dsts, lne, pl in (
        (excg, cg_dst, L_ne_g, plg),
        (exct, ct_dst, L_ne_t, plt_),
        (excd, cd_dst, L_ne_d, pld),
    ):
        for s, eb in excmap.items():
            d = int(dsts[s] + 1 + lne[s] + pl[s])
            out[d : d + len(eb)] = np.frombuffer(eb, dtype=np.uint8)

    # ---- slice per term
    mindl_b = _segment_reduceat(np.minimum, dls, bs, cnt, 0) if B else np.zeros(0, np.int64)
    results = []
    outb = out.tobytes()
    for t in range(T):
        lo, hi_ = int(blk_term_off[t]), int(blk_term_off[t + 1])
        results.append(
            (
                outb[int(term_start[t]) : int(term_start[t + 1])],
                last_doc[lo:hi_].copy(),
                maxtf_b[lo:hi_].astype(np.int32),
                (hdr_dst[lo:hi_] - term_start[t]).astype(np.int32),
                mindl_b[lo:hi_].copy(),
            )
        )
    return results


def encode_position_lists_batch(
    positions: np.ndarray,
    tfs: np.ndarray,
    pos_term_offsets: np.ndarray,
    tf_term_offsets: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[bytes]:
    """Batched encode_position_lists over many terms: flat positions
    (concatenated per term, per-doc-ascending), flat tfs, and the two
    offset arrays (len T+1) delimiting each term's slice of each.
    Byte-identical to the scalar encode_position_lists per term."""
    positions = np.asarray(positions, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    PO = np.asarray(pos_term_offsets, dtype=np.int64)
    n_p = np.diff(PO)
    T = len(n_p)
    N = positions.size

    # deltas with absolute restart at every doc's first position (term
    # starts are doc starts, so the global computation equals per-term)
    if N:
        deltas = np.empty_like(positions)
        deltas[0] = positions[0]
        deltas[1:] = positions[1:] - positions[:-1]
        doc_starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
        deltas[doc_starts] = positions[doc_starts]
        V = deltas.astype(np.uint64)
    else:
        V = np.zeros(0, np.uint64)

    # chunk table (tile each term's positions in 128s)
    nc_t = (n_p + block_size - 1) // block_size
    C = int(nc_t.sum())
    term_of_chunk = np.repeat(np.arange(T), nc_t)
    chk_in_term = np.arange(C) - np.repeat(np.cumsum(nc_t) - nc_t, nc_t)
    cs = PO[term_of_chunk] + chk_in_term * block_size
    ce = np.minimum(cs + block_size, PO[term_of_chunk + 1])
    ccnt = ce - cs
    c_off = np.concatenate(([0], np.cumsum(ccnt)))

    w, ne, packed, poff, plen, exc = _pfor_batch(V, c_off)

    vl = _varint_len_vec
    L_np = vl(n_p.astype(np.uint64))
    L_ccnt = vl(ccnt.astype(np.uint64)) if C else np.zeros(0, np.int64)
    L_ne = vl(ne.astype(np.uint64)) if C else np.zeros(0, np.int64)
    le = np.array([len(exc.get(i, b"")) for i in range(C)], dtype=np.int64)
    L_chunk = L_ccnt + 1 + L_ne + plen + le
    chk_term_off = np.concatenate(([0], np.cumsum(nc_t)))
    L_chunks_per_term = (
        _segment_reduceat(np.add, L_chunk, chk_term_off[:-1], nc_t, 0)
        if C else np.zeros(T, np.int64)
    )
    L_term = L_np + L_chunks_per_term
    term_start = np.concatenate(([0], np.cumsum(L_term)))
    out = np.zeros(int(term_start[-1]), dtype=np.uint8)

    csum_chunk = np.cumsum(L_chunk) - L_chunk if C else np.zeros(0, np.int64)
    base_per_term = np.where(
        nc_t > 0,
        csum_chunk[chk_term_off[:-1]] if C else np.zeros(T, np.int64),
        0,
    )
    within_term = csum_chunk - np.repeat(base_per_term, nc_t)
    chd = term_start[term_of_chunk] + L_np[term_of_chunk] + within_term
    wpos = chd + L_ccnt  # width byte position

    va = np.concatenate([n_p, ccnt, ne]).astype(np.uint64)
    va_len = np.concatenate([L_np, L_ccnt, L_ne])
    va_dst = np.concatenate([term_start[:-1], chd, wpos + 1])
    enc = np.frombuffer(varint_encode(va), dtype=np.uint8) if va.size else np.zeros(0, np.uint8)
    _scatter_bytes(out, va_dst, va_len, enc, np.cumsum(va_len) - va_len)
    if C:
        out[wpos] = w.astype(np.uint8)
    _scatter_bytes(out, wpos + 1 + L_ne, plen, packed, poff)
    for s, eb in exc.items():
        d = int(wpos[s] + 1 + L_ne[s] + plen[s])
        out[d : d + len(eb)] = np.frombuffer(eb, dtype=np.uint8)

    outb = out.tobytes()
    return [
        outb[int(term_start[t]) : int(term_start[t + 1])] for t in range(T)
    ]


def decode_block(blob: bytes, offset: int) -> tuple[np.ndarray, np.ndarray, np.ndarray | None, int]:
    """Decode one block at byte `offset` →
    (doc_ids, tfs, dls_or_None, next_offset)."""
    version = blob[0]
    base_codec = version & 0x03
    has_dls = bool(version & _FLAG_DLS)
    hdr, offset = varint_decode(blob, 2, offset)
    count, first_doc = int(hdr[0]), int(hdr[1])

    def _read(cnt: int, off: int) -> tuple[np.ndarray, int]:
        if base_codec == _VERSION_PFOR:
            return _decode_pfor_chunk(blob, cnt, off)
        (k,), off = varint_decode(blob, 1, off)
        return varint_decode(blob, int(k), off)

    gaps, offset = _read(count - 1, offset)
    tfs1, offset = _read(count, offset)
    dls = None
    if has_dls:
        dls_u, offset = _read(count, offset)
        dls = dls_u.astype(np.int64)
    docs = np.empty(count, dtype=np.int64)
    docs[0] = first_doc
    if count > 1:
        docs[1:] = first_doc + np.cumsum(gaps.astype(np.int64) + 1)
    return docs, (tfs1.astype(np.int64) + 1), dls, offset


def _decode_postings_blocks(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Block-at-a-time full decode (legacy varint codec path, and the
    reference implementation the batched decoder is tested against)."""
    empty = np.array([], dtype=np.int64)
    (n,), off = varint_decode(blob, 1, 1)
    (n_blocks,), off = varint_decode(blob, 1, off)
    docs_parts, tf_parts, dl_parts = [], [], []
    for _ in range(int(n_blocks)):
        d, t, dl, off = decode_block(blob, off)
        docs_parts.append(d)
        tf_parts.append(t)
        if dl is not None:
            dl_parts.append(dl)
    if not docs_parts:
        return empty, empty, None
    return (
        np.concatenate(docs_parts),
        np.concatenate(tf_parts),
        np.concatenate(dl_parts) if dl_parts else None,
    )


def _read_varint(arr: np.ndarray, pos: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        b = int(arr[pos])
        pos += 1
        val |= (b & 0x7F) << shift
        if b < 0x80:
            return val, pos
        shift += 7


def _seg_index(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat fancy index covering [starts[j], starts[j]+lens[j])."""
    total = int(lens.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    return np.repeat(starts, lens) + within


def _unpack_chunks_batched(
    arr: np.ndarray,
    ch_cnt: np.ndarray,
    ch_w: np.ndarray,
    ch_off: np.ndarray,
    exc: "dict[int, tuple[np.ndarray, np.ndarray]]",
) -> tuple[np.ndarray, np.ndarray]:
    """Unpack many PFor chunks in O(distinct widths) vectorized passes
    (shared by decode_postings and decode_stream).  Returns
    (val_start offsets, flat uint64 values in chunk order)."""
    n_chunks = len(ch_cnt)
    val_start = np.zeros(n_chunks + 1, dtype=np.int64)
    np.cumsum(ch_cnt, out=val_start[1:])
    out_vals = np.zeros(int(val_start[-1]), dtype=np.uint64)
    arr_pad = np.empty(len(arr) + 8, dtype=np.uint8)
    arr_pad[:len(arr)] = arr
    arr_pad[len(arr):] = 0
    for w in np.unique(ch_w):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero((ch_w == w) & (ch_cnt > 0))
        if not sel.size:
            continue
        cnts = ch_cnt[sel]
        # per-value bit positions: chunk start (byte-aligned) + j*w
        within = _seg_index(np.zeros(len(sel), dtype=np.int64), cnts)
        vbit = np.repeat(8 * ch_off[sel], cnts) + within * w
        out_vals[_seg_index(val_start[sel], cnts)] = _gather_packed(
            arr_pad, vbit, w
        )
    for k, (idx, highs) in exc.items():
        seg = out_vals[val_start[k]:val_start[k + 1]]
        seg[idx] |= highs << np.uint64(ch_w[k])
    return val_start, out_vals


def decode_postings(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Full decode → (doc_ids int64 ascending, tfs int64, dls|None).

    Batched: one cheap python pass collects every PFor chunk's
    (count, width, offset) descriptor, then all chunks of EQUAL WIDTH
    unpack in one vectorized numpy pass.  The block-at-a-time decoder
    paid ~8 µs of fixed numpy overhead per 128-value chunk (3 chunks ×
    n_blocks per blob), which dominated warm-up and exhaustive decode
    of stopword lists; batching cuts the numpy call count from
    O(chunks) to O(distinct widths).  Values are bit-identical to
    _decode_postings_blocks (asserted by the codecs round-trip and
    property tests)."""
    empty = np.array([], dtype=np.int64)
    if not blob:
        return empty, empty, None
    version = blob[0]
    if (version & 0x03) != _VERSION_PFOR:
        return _decode_postings_blocks(blob)
    has_dls = bool(version & _FLAG_DLS)
    arr = np.frombuffer(blob, dtype=np.uint8)
    _n, pos = _read_varint(arr, 1)
    n_blocks, pos = _read_varint(arr, pos)
    if not n_blocks:
        return empty, empty, None
    ns = 3 if has_dls else 2
    counts = np.empty(n_blocks, dtype=np.int64)
    firsts = np.empty(n_blocks, dtype=np.int64)
    n_chunks = n_blocks * ns
    ch_cnt = np.empty(n_chunks, dtype=np.int64)
    ch_w = np.empty(n_chunks, dtype=np.int64)
    ch_off = np.empty(n_chunks, dtype=np.int64)
    exc: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    ci = 0
    for b in range(n_blocks):
        c, pos = _read_varint(arr, pos)
        f, pos = _read_varint(arr, pos)
        counts[b] = c
        firsts[b] = f
        for cnt in (c - 1, c, c)[:ns]:
            w = int(arr[pos])
            pos += 1
            n_exc, pos = _read_varint(arr, pos)
            ch_cnt[ci] = cnt
            ch_w[ci] = w
            ch_off[ci] = pos
            pos += (cnt * w + 7) >> 3
            if n_exc:
                inter, pos = varint_decode(blob, 2 * n_exc, pos)
                exc[ci] = (inter[0::2].astype(np.int64), inter[1::2])
            ci += 1
    val_start, out_vals = _unpack_chunks_batched(arr, ch_cnt, ch_w, ch_off, exc)
    return _assemble_postings(out_vals, val_start, 0, counts, firsts, ns, has_dls)


def _assemble_postings(
    out_vals: np.ndarray,
    val_start: np.ndarray,
    ci0: int,
    counts: np.ndarray,
    firsts: np.ndarray,
    ns: int,
    has_dls: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Rebuild (docs, tfs, dls) from unpacked chunk values.  ``ci0`` is
    the blob's first chunk index in the (possibly shared) chunk table —
    decode_postings passes 0, decode_postings_many each blob's base."""
    n_blocks = len(counts)
    total_docs = int(counts.sum())
    dstart = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(counts, out=dstart[1:])
    stride = ci0 + np.arange(n_blocks, dtype=np.int64) * ns
    # gaps, gathered in block order, as int64 (gap+1 = doc delta)
    gaps_all = out_vals[
        _seg_index(val_start[stride], counts - 1)
    ].astype(np.int64)
    # per-block gap totals via cumsum differences (robust to c=1 blocks)
    gcum = np.zeros(gaps_all.size + 1, dtype=np.int64)
    np.cumsum(gaps_all, out=gcum[1:])
    gb = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(counts - 1, out=gb[1:])
    last = firsts + (gcum[gb[1:]] - gcum[gb[:-1]]) + (counts - 1)
    # docs = one global cumsum of deltas, with each block's first doc
    # injected as a delta against the previous block's last doc
    deltas = np.empty(total_docs, dtype=np.int64)
    mask = np.ones(total_docs, dtype=bool)
    mask[dstart[:-1]] = False
    deltas[mask] = gaps_all + 1
    deltas[dstart[0]] = firsts[0]
    if n_blocks > 1:
        deltas[dstart[1:-1]] = firsts[1:] - last[:-1]
    docs = np.cumsum(deltas)
    tfs = out_vals[_seg_index(val_start[stride + 1], counts)].astype(
        np.int64
    ) + 1
    dls = (
        out_vals[_seg_index(val_start[stride + 2], counts)].astype(np.int64)
        if has_dls
        else None
    )
    return docs, tfs, dls


def _parse_postings_chunks(blob, arr, base, ch_cnt, ch_w, ch_off, exc, ci):
    """Append one PFor blob's block/chunk descriptors to the shared
    chunk table (offsets shifted by ``base``).  Returns
    (counts, firsts, ns, has_dls, next_ci)."""
    version = blob[0]
    has_dls = bool(version & _FLAG_DLS)
    ns = 3 if has_dls else 2
    _n, pos = _read_varint(arr, 1)
    n_blocks, pos = _read_varint(arr, pos)
    counts = np.empty(n_blocks, dtype=np.int64)
    firsts = np.empty(n_blocks, dtype=np.int64)
    for b in range(n_blocks):
        c, pos = _read_varint(arr, pos)
        f, pos = _read_varint(arr, pos)
        counts[b] = c
        firsts[b] = f
        for cnt in (c - 1, c, c)[:ns]:
            w = int(arr[pos])
            pos += 1
            n_exc, pos = _read_varint(arr, pos)
            ch_cnt.append(cnt)
            ch_w.append(w)
            ch_off.append(base + pos)
            pos += (cnt * w + 7) >> 3
            if n_exc:
                inter, pos = varint_decode(blob, 2 * n_exc, pos)
                exc[ci] = (inter[0::2].astype(np.int64), inter[1::2])
            ci += 1
    return counts, firsts, ns, has_dls, ci


# decode_postings_many batch bound: the width-group unpack builds a
# per-BIT gather index (8 B per bit), so one batch is capped at ~2 MiB
# of encoded bytes (~130 MiB of transient index) — large enough to
# amortize the fixed numpy overhead ~100×, small enough to stay cache-
# friendly (an UNBOUNDED batch over a warm-up's 3.5k blobs allocated
# multi-GB temporaries and ran 3× slower than per-blob decode).
_MANY_BATCH_BYTES = 2 * 1024 * 1024


def decode_postings_many(
    blobs: "list[bytes]",
) -> "list[tuple[np.ndarray, np.ndarray, np.ndarray | None]]":
    """Decode MANY posting blobs with shared width-grouped unpack
    passes over bounded-size batches — the warm-up path decodes
    thousands of small blobs, where per-blob fixed numpy overhead
    dominated decode_postings.  Output i is bit-identical to
    decode_postings(blobs[i])."""
    if len(blobs) > 1:
        sizes = [len(b) if b else 0 for b in blobs]
        if sum(sizes) > _MANY_BATCH_BYTES:
            out_all: list = []
            lo, acc = 0, 0
            for i, sz in enumerate(sizes):
                if acc and acc + sz > _MANY_BATCH_BYTES:
                    out_all.extend(decode_postings_many(blobs[lo:i]))
                    lo, acc = i, 0
                acc += sz
            out_all.extend(decode_postings_many(blobs[lo:]))
            return out_all
    out: list = [None] * len(blobs)
    ch_cnt: list[int] = []
    ch_w: list[int] = []
    ch_off: list[int] = []
    exc: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    metas: list = []
    parts: list[np.ndarray] = []
    base = 0
    ci = 0
    for bi, blob in enumerate(blobs):
        if not blob or (blob[0] & 0x03) != _VERSION_PFOR:
            out[bi] = decode_postings(blob)
            continue
        arr_b = np.frombuffer(blob, dtype=np.uint8)
        ci0 = ci
        counts, firsts, ns, has_dls, ci = _parse_postings_chunks(
            blob, arr_b, base, ch_cnt, ch_w, ch_off, exc, ci
        )
        if not len(counts):
            e = np.array([], dtype=np.int64)
            out[bi] = (e, e, None)
            continue
        metas.append((bi, ci0, counts, firsts, ns, has_dls))
        parts.append(arr_b)
        base += len(blob)
    if parts:
        big = np.concatenate(parts)
        val_start, out_vals = _unpack_chunks_batched(
            big,
            np.asarray(ch_cnt, dtype=np.int64),
            np.asarray(ch_w, dtype=np.int64),
            np.asarray(ch_off, dtype=np.int64),
            exc,
        )
        for bi, ci0, counts, firsts, ns, has_dls in metas:
            out[bi] = _assemble_postings(
                out_vals, val_start, ci0, counts, firsts, ns, has_dls
            )
    return out


# ------------------------------------------------------- generic stream
# (used for position lists: delta-encoded uint64 streams, PFor-chunked
# so decode stays vectorized — the per-value varint decode loop would
# be the slow path for high-frequency phrase terms)

def encode_stream(vals: np.ndarray, block_size: int = BLOCK_SIZE) -> bytes:
    """Encode a uint64 stream as varint(count) + [varint(chunk_count) +
    PFor chunk]...  Chunks are self-delimiting so streams concatenate
    (merge_streams) without re-chunking."""
    vals = np.asarray(vals, dtype=np.uint64)
    parts = [varint_encode(np.array([vals.size], dtype=np.uint64))]
    for lo in range(0, vals.size, block_size):
        chunk = vals[lo : lo + block_size]
        parts.append(_varint1(chunk.size))
        parts.append(_encode_pfor_chunk(chunk))
    return b"".join(parts)


def decode_stream(blob: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Inverse of encode_stream → (values, next_offset).  Batched like
    decode_postings: chunk descriptors are parsed in one cheap python
    pass, then all equal-width chunks unpack in single vectorized numpy
    passes (the chunk-at-a-time loop paid ~8 µs of fixed numpy overhead
    per 128-value chunk — the dominant cost of position decode for
    stopword phrase queries)."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    n, pos = _read_varint(arr, offset)
    if n == 0:
        return np.empty(0, dtype=np.uint64), pos
    ch_cnt_l: list[int] = []
    ch_w_l: list[int] = []
    ch_off_l: list[int] = []
    exc: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    done = 0
    ci = 0
    while done < n:
        cnt, pos = _read_varint(arr, pos)
        w = int(arr[pos])
        pos += 1
        n_exc, pos = _read_varint(arr, pos)
        ch_cnt_l.append(cnt)
        ch_w_l.append(w)
        ch_off_l.append(pos)
        pos += (cnt * w + 7) >> 3
        if n_exc:
            inter, pos = varint_decode(blob, 2 * n_exc, pos)
            exc[ci] = (inter[0::2].astype(np.int64), inter[1::2])
        done += cnt
        ci += 1
    _vs, out = _unpack_chunks_batched(
        arr,
        np.asarray(ch_cnt_l, dtype=np.int64),
        np.asarray(ch_w_l, dtype=np.int64),
        np.asarray(ch_off_l, dtype=np.int64),
        exc,
    )
    return out, pos


def merge_streams(parts: list[bytes]) -> bytes:
    """Concatenate encoded streams (each self-delimiting) — O(bytes),
    matching merge_encoded's disjoint-range contract: position deltas
    restart per doc, so no rebasing is needed."""
    total = 0
    bodies = []
    for blob in parts:
        if not blob:
            continue
        (n,), off = varint_decode(blob, 1, 0)
        total += int(n)
        bodies.append(blob[off:])
    return varint_encode(np.array([total], dtype=np.uint64)) + b"".join(bodies)


def encode_position_lists(positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode per-(doc) position lists for one term's postings.

    `positions`: all token positions concatenated in doc order
    (ascending within each doc); `tfs`: list length per doc.  Deltas
    within a doc, absolute at each doc's first position."""
    positions = np.asarray(positions, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if positions.size == 0:
        return encode_stream(np.array([], dtype=np.uint64))
    deltas = np.empty_like(positions)
    deltas[0] = positions[0]
    deltas[1:] = positions[1:] - positions[:-1]
    starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
    deltas[starts] = positions[starts]  # absolute restart per doc
    return encode_stream(deltas.astype(np.uint64))


def decode_position_lists(blob: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (flat positions int64, per-doc start offsets int64[len(tfs)+1])."""
    tfs = np.asarray(tfs, dtype=np.int64)
    deltas, _ = decode_stream(blob)
    pos = deltas.astype(np.int64)
    if pos.size:
        starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
        # prefix-sum within docs: cumsum then subtract carried baseline
        csum = np.cumsum(pos)
        base = np.zeros_like(pos)
        base[starts[1:]] = csum[starts[1:] - 1]
        np.maximum.accumulate(base, out=base)
        pos = csum - base
    offsets = np.concatenate(([0], np.cumsum(tfs)))
    return pos, offsets


def merge_encoded(
    parts: list[tuple[bytes, np.ndarray, np.ndarray, np.ndarray]]
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """Merge partial posting blobs whose doc-id ranges are DISJOINT and
    given in ascending order (guaranteed because the index build range-
    partitions documents by doc_id).  O(bytes): no decode — block bodies
    are independently decodable (absolute first_doc per block), so the
    merge is header rewrite + byte concatenation.

    Reference analog: gather step of scatter/gather
    (batch_seqr_loader/vqsr.py:393-471) — merge without recompute.
    """
    total_n = 0
    total_blocks = 0
    bodies: list[bytes] = []
    last_doc_parts, maxtf_parts, off_parts = [], [], []
    version = None
    prev_last = -1
    for blob, block_last, block_maxtf, block_off in parts:
        if not blob:
            continue
        v = blob[0]
        version = v if version is None else version
        if v != version:
            raise ValueError("cannot merge blobs with mixed codecs")
        (n,), off = varint_decode(blob, 1, 1)
        (nb,), off = varint_decode(blob, 1, off)
        if int(n):
            hdr, _ = varint_decode(blob, 2, off)  # first block: count, first_doc
            if int(hdr[1]) <= prev_last:
                raise ValueError("merge_encoded requires disjoint ascending doc ranges")
            prev_last = int(block_last[-1])
        body = blob[off:]
        base_shift = off  # old body start within old blob
        bodies.append(body)
        total_n += int(n)
        total_blocks += int(nb)
        last_doc_parts.append(block_last)
        maxtf_parts.append(block_maxtf)
        off_parts.append((block_off - base_shift, len(body)))
    if version is None:
        return b"", np.array([], np.int64), np.array([], np.int32), np.array([], np.int32)
    head = (
        bytes([version])
        + varint_encode(np.array([total_n], dtype=np.uint64))
        + varint_encode(np.array([total_blocks], dtype=np.uint64))
    )
    blob = head + b"".join(bodies)
    # rebase block offsets onto the merged blob
    offs = []
    base = len(head)
    for rel, blen in off_parts:
        offs.append(rel.astype(np.int64) + base)
        base += blen
    block_last = np.concatenate(last_doc_parts) if last_doc_parts else np.array([], np.int64)
    block_maxtf = np.concatenate(maxtf_parts) if maxtf_parts else np.array([], np.int32)
    block_off = np.concatenate(offs).astype(np.int32) if offs else np.array([], np.int32)
    if block_last.size > 1 and not (np.diff(block_last) > 0).all():
        raise ValueError("merge_encoded requires disjoint ascending doc ranges")
    return blob, block_last, block_maxtf, block_off
