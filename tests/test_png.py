"""Stdlib PNG codec + real image-decode path of the multimodal
operators (r3 verdict item 5: decode for real where a decoder exists;
deterministic fake only for payloads nothing can decode)."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from hail_elasticsearch_pipelines_spark.functions.png import (
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (7, 3), (16, 16), (33, 21)])
def test_png_roundtrip(ch, shape):
    rng = np.random.default_rng(ch * 100 + shape[0])
    arr = rng.integers(0, 256, size=(*shape, ch), dtype=np.uint8)
    out = decode_png(encode_png(arr))
    np.testing.assert_array_equal(out, arr)


def test_png_deterministic_bytes():
    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert encode_png(arr) == encode_png(arr.copy())
    assert is_png(encode_png(arr))


def _filtered_png(arr: np.ndarray, ftype: int) -> bytes:
    """Build a PNG applying filter ``ftype`` to every scanline (spec
    filter transforms implemented independently of the decoder)."""
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    out = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        left = np.zeros(stride, np.int32)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(stride, np.int32)
        upleft[ch:] = prev[:-ch]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # paeth
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        out.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(out)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_all_filter_types(ftype, ch):
    rng = np.random.default_rng(ftype * 10 + ch)
    arr = rng.integers(0, 256, size=(9, 11, ch), dtype=np.uint8)
    got = decode_png(_filtered_png(arr, ftype))
    np.testing.assert_array_equal(got, arr)


def test_png_mixed_filters_per_scanline():
    """Real encoders choose a filter PER scanline — decode must handle
    an arbitrary mix (spec transforms applied independently here)."""
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(25, 13, 3), dtype=np.uint8)
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    ftypes = rng.integers(0, 5, size=h)
    out = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        left = np.zeros(stride, np.int32)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(stride, np.int32)
        upleft[ch:] = prev[:-ch]
        f = int(ftypes[y])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        out.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(out)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), arr)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\0\0\0\0"
    )
    with pytest.raises(ValueError):
        decode_png(bad)


def test_resize_nearest_matches_naive():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(13, 29, 3), dtype=np.uint8)
    ow, oh = 9, 17
    got = resize_nearest(arr, ow, oh)
    naive = np.empty((oh, ow, 3), np.uint8)
    for y in range(oh):
        for x in range(ow):
            naive[y, x] = arr[(y * 13) // oh, (x * 29) // ow]
    np.testing.assert_array_equal(got, naive)
    assert resize_nearest(arr, 29, 13).shape == arr.shape


def test_media_metadata_real_dims_for_png(spark):
    from hail_elasticsearch_pipelines_spark.operators.multimodal import (
        media_metadata,
    )

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    payloads = [encode_png(arr), b"\x00\x01random-not-an-image\x02" * 4]
    pdf = pd.DataFrame({"media_id": [0, 1], "payload": payloads})
    rows = (
        media_metadata(spark.createDataFrame(pdf))
        .select("media_id", "media_meta.*")
        .orderBy("media_id")
        .collect()
    )
    assert rows[0]["mime_guess"] == "image/png"
    assert (rows[0]["width"], rows[0]["height"]) == (30, 40)  # REAL dims
    # non-decodable payload → deterministic fake dims
    from hail_elasticsearch_pipelines_spark.operators.multimodal import (
        fake_decode_dims,
    )

    assert (rows[1]["width"], rows[1]["height"]) == fake_decode_dims(payloads[1])


def test_resize_images_real_and_fallback(spark):
    from hail_elasticsearch_pipelines_spark.operators.multimodal import (
        fake_decode_dims,
        resize_images,
    )

    rng = np.random.default_rng(11)
    wide = rng.integers(0, 256, size=(50, 100, 3), dtype=np.uint8)
    tall = rng.integers(0, 256, size=(64, 16, 4), dtype=np.uint8)
    junk = b"not an image at all" * 3
    pdf = pd.DataFrame(
        {
            "media_id": [0, 1, 2],
            "payload": [encode_png(wide), encode_png(tall), junk],
        }
    )
    rows = {
        r["media_id"]: r
        for r in resize_images(
            spark.createDataFrame(pdf), target=32
        ).collect()
    }
    # wide: 100x50 → 32x16, really resized: decode the output PNG
    r = rows[0]
    assert r["decoded"] and (r["src_w"], r["src_h"]) == (100, 50)
    assert (r["out_w"], r["out_h"]) == (32, 16)
    out = decode_png(bytes(r["resized_png"]))
    assert out.shape == (16, 32, 3)
    np.testing.assert_array_equal(out, resize_nearest(wide, 32, 16))
    assert r["resized_sha"] == hashlib.sha256(bytes(r["resized_png"])).hexdigest()
    # tall RGBA: 16x64 → 8x32
    r = rows[1]
    assert r["decoded"] and (r["out_w"], r["out_h"]) == (8, 32)
    assert decode_png(bytes(r["resized_png"])).shape == (32, 8, 4)
    # junk: stub arithmetic fallback, flagged undecoded
    r = rows[2]
    w, h = fake_decode_dims(junk)
    assert not r["decoded"] and (r["src_w"], r["src_h"]) == (w, h)
    assert r["resized_png"] is None
    hhex = hashlib.sha256(junk).hexdigest()
    m = max(w, h)
    ow, oh = max(1, (w * 32) // m), max(1, (h * 32) // m)
    assert r["resized_sha"] == hashlib.sha256(
        f"{hhex}:{ow}x{oh}".encode()
    ).hexdigest()
