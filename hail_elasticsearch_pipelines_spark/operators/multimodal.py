"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata structs.

Image DECODE is real where a decoder exists: PIL when installed (any
format), else the stdlib-zlib PNG codec (functions/png.py) for PNG
payloads — ``media_metadata`` reports true dims and ``resize_images``
produces actual resized PNG bytes, both unit-tested on generated PNGs.
Payloads no decoder handles (and video frame decode, which needs av)
fall back to a deterministic fake — the reference's dummy-VEP pattern
(luigi_pipeline/lib/hail_vep_runners.py:21): the external step is
mocked, the pipeline around it exercised for real.  The fake is
SQL-expressible on purpose, so the driver's DuckDB oracle value-checks
the Spark plumbing end to end on its synthetic (non-PNG) payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("mime_guess", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"\x1aE\xdf\xa3", "video/webm"),
]


def sniff_mime(payload: bytes) -> str | None:
    for magic, mime in _MAGIC:
        if payload[: len(magic)] == magic:
            return mime
    return None


def _try_real_decode(payload: bytes):
    """REAL image dims when possible: PIL if installed (any format),
    else the stdlib-zlib PNG decoder (functions/png.py) for PNG
    payloads.  None → caller falls back to the deterministic fake (the
    dummy-VEP pattern, luigi_pipeline/lib/hail_vep_runners.py:21)."""
    try:
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height
    except ImportError:
        pass
    except Exception:
        return None
    try:
        from ..functions import png

        if png.is_png(payload):
            arr = png.decode_png(payload)
            return arr.shape[1], arr.shape[0]
    except Exception:
        return None
    return None


def fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: dims derived from the
    content hash — stable, testable, clearly not a real decoder."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 1024, 16 + h[1] % 1024


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach a typed metadata struct per media row via one Arrow UDF
    (hash, size, mime sniff, decoded-or-fake dims)."""

    @F.pandas_udf(MEDIA_META_SCHEMA)
    def meta_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for ser in batches:
            rows = []
            for payload in ser:
                b = bytes(payload) if payload is not None else b""
                dims = _try_real_decode(b) or fake_decode_dims(b)
                rows.append(
                    (
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        sniff_mime(b),
                        dims[0],
                        dims[1],
                        None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

    return df.withColumn("media_meta", meta_udf(F.col(payload_col)))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType(), False),
        T.StructField("src_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("resized_sha", T.StringType(), False),
    ]
)


def image_resize_stub(
    df: DataFrame, payload_col: str = "payload", target: int = 224
) -> DataFrame:
    """Image resize plumbing (mapInPandas, one row per image): aspect-fit
    a source image into ``target`` × ``target`` with INTEGER arithmetic
    (out = src * target // max(src_w, src_h)) and emit the resized
    artifact's identity hash.  The decode/resample itself is stubbed
    behind an import-try (PIL absent in this container): source dims
    come from fake_decode_dims (first two sha256 bytes) and the
    'resized bytes' hash is the hex-string chain
    sha256(payload_sha || ':' || out_w || 'x' || out_h) — deliberately
    SQL-expressible so the driver's DuckDB oracle value-checks the
    fan-out and the aspect-fit arithmetic end to end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = bytes(payload)
                hhex = hashlib.sha256(b).hexdigest()
                w, h = fake_decode_dims(b)
                m = max(w, h)
                ow = max(1, (w * target) // m)
                oh = max(1, (h * target) // m)
                rsha = hashlib.sha256(f"{hhex}:{ow}x{oh}".encode()).hexdigest()
                rows.append((int(mid), w, h, ow, oh, rsha))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return df.select("media_id", payload_col).mapInPandas(gen, schema=RESIZE_SCHEMA)


RESIZE_REAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType(), False),
        T.StructField("src_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("resized_png", T.BinaryType(), True),
        T.StructField("resized_sha", T.StringType(), False),
        T.StructField("decoded", T.BooleanType(), False),
    ]
)


def resize_images(
    df: DataFrame, payload_col: str = "payload", target: int = 224
) -> DataFrame:
    """REAL image resize: decode (PIL when installed, else the stdlib
    PNG codec), aspect-fit into ``target``² with deterministic
    nearest-neighbor resampling, re-encode as PNG, and emit the resized
    bytes + identity hash.  Rows whose payload no decoder handles fall
    back to the stub arithmetic (fake dims, hash-chain sha,
    decoded=false) so mixed corpora flow through one operator.

    Same Spark shape as image_resize_stub (mapInPandas, one row per
    image, Arrow-batched) — rows are independent, so this scales with
    partition count; decode cost stays in the executor's Python worker
    and only (dims, resized bytes) cross Arrow back."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import png

        try:  # soft-import: PIL covers every format when installed
            import io

            from PIL import Image

            def _decode(b: bytes):
                try:
                    return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
                except Exception:
                    return None

        except ImportError:

            def _decode(b: bytes):
                if png.is_png(b):
                    try:
                        return png.decode_png(b)
                    except ValueError:
                        return None
                return None

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = bytes(payload)
                arr = _decode(b)
                if arr is not None:
                    h, w = arr.shape[:2]
                    m = max(w, h)
                    ow = max(1, (w * target) // m)
                    oh = max(1, (h * target) // m)
                    resized = png.encode_png(png.resize_nearest(arr, ow, oh))
                    rsha = hashlib.sha256(resized).hexdigest()
                    rows.append((int(mid), w, h, ow, oh, resized, rsha, True))
                else:
                    hhex = hashlib.sha256(b).hexdigest()
                    w, h = fake_decode_dims(b)
                    m = max(w, h)
                    ow = max(1, (w * target) // m)
                    oh = max(1, (h * target) // m)
                    rsha = hashlib.sha256(
                        f"{hhex}:{ow}x{oh}".encode()
                    ).hexdigest()
                    rows.append((int(mid), w, h, ow, oh, None, rsha, False))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_REAL_SCHEMA.fields]
            )

    return df.select("media_id", payload_col).mapInPandas(
        gen, schema=RESIZE_REAL_SCHEMA
    )


def byte_histogram(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """256-bin byte histogram per payload (vectorized np.bincount) — the
    feature-extraction shape: binary in, fixed-width vector out."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def hist_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ser in batches:
            out = [
                np.bincount(np.frombuffer(bytes(p), dtype=np.uint8), minlength=256).astype(
                    np.int32
                )
                if p is not None
                else np.zeros(256, dtype=np.int32)
                for p in ser
            ]
            yield pd.Series(out)

    return df.withColumn("byte_hist", hist_udf(F.col(payload_col)))


def frame_sample_stub(df: DataFrame, payload_col: str = "payload", every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emits (frame_idx, frame_sha) rows
    per video via mapInPandas fan-out.  Decode is stubbed: 'frames' are
    deterministic slices of the payload hash chain; a real decoder drops
    in by replacing `_fake_frames` only."""

    def _fake_frames(payload: bytes, every_n: int) -> list[tuple[int, str]]:
        # hex-STRING hash chain (not binary-digest chaining) so the
        # stub is replicable in plain SQL: sha256(h || ':' || idx) over
        # ASCII text at every step — the driver's DuckDB oracle runs
        # the identical chain (oracle_sql()['frame_sample']).
        n_fake_frames = 1 + len(payload) % 7
        out = []
        h = hashlib.sha256(payload).hexdigest()
        for i in range(0, n_fake_frames * every_n, every_n):
            h = hashlib.sha256(f"{h}:{i}".encode()).hexdigest()
            out.append((i, h))
        return out

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_sha", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                for idx, sha in _fake_frames(bytes(payload), every_n):
                    rows.append((int(mid), idx, sha))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return df.select("media_id", payload_col).mapInPandas(gen, schema=out_schema)
