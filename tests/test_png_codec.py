"""Pure-stdlib PNG codec units: encode↔decode round trips across color
types, scanline filter types 1-4 (hand-encoded), chunk/CRC validation,
GIF header sniffing, and the clearly-raised unsupported cases."""

import struct
import zlib

import numpy as np
import pytest

from qwatch_spark.functions.png import (
    PNG_SIG,
    decode_png,
    encode_png,
    gif_header,
    png_header,
    resize_nearest,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


@pytest.mark.parametrize(
    "shape", [(5, 7), (5, 7, 1), (4, 6, 2), (3, 9, 3), (2, 2, 4)]
)
def test_round_trip_all_color_types(shape):
    px = (np.arange(np.prod(shape)).reshape(shape) * 37 % 256).astype(np.uint8)
    out = decode_png(encode_png(px))
    want = px[:, :, None] if px.ndim == 2 else px
    assert out.shape == want.shape and (out == want).all()


def test_header_parse():
    px = np.zeros((13, 21, 3), dtype=np.uint8)
    assert png_header(encode_png(px)) == (21, 13, 8, 2)
    assert png_header(b"not a png") is None
    assert gif_header(b"GIF89a" + struct.pack("<HH", 320, 200) + b"\0" * 8) == (320, 200)
    assert gif_header(b"GIF00a" + b"\0" * 8) is None


def test_decode_unfilters_types_1_to_4():
    """Hand-encode one scanline per filter type (Sub/Up/Average/Paeth)
    and check the decoder reconstructs the exact pixels."""
    h, w, bpp = 4, 5, 3
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, (h, w, bpp)).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y, ft in zip(range(h), [1, 2, 3, 4]):
        line = px[y].reshape(-1).astype(int)
        enc = np.zeros(w * bpp, dtype=np.uint8)
        for i in range(w * bpp):
            left = line[i - bpp] if i >= bpp else 0
            up = int(prev[i])
            ul = int(prev[i - bpp]) if i >= bpp else 0
            if ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + enc.tobytes()
        prev = line.astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    b = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(b) == px).all()


def test_corrupt_and_unsupported_raise():
    px = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png(px)
    # flip a byte inside IDAT → CRC failure
    bad = bytearray(good)
    bad[48] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    # 16-bit depth → explicit NotImplementedError, not silent garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    deep = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(deep)


def test_resize_nearest_shapes_and_identity():
    px = (np.arange(6 * 8 * 3).reshape(6, 8, 3) % 256).astype(np.uint8)
    assert (resize_nearest(px, 8, 6) == px).all()  # same-size = identity
    small = resize_nearest(px, 4, 3)
    assert small.shape == (3, 4, 3)
    assert (small == px[::2, ::2]).all()  # exact 2x decimation


# ---- property tests (hypothesis) ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_encode_decode_round_trip(h, w, c, seed):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    out = decode_png(encode_png(px))
    assert out.shape == (h, w, c) and (out == px).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    ow=st.integers(1, 16),
    oh=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_resize_pixels_come_from_source(h, w, ow, oh, seed):
    """Every resampled pixel must be an exact copy of SOME source pixel
    (nearest-neighbor introduces no new values), and resampling is
    deterministic."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = resize_nearest(px, ow, oh)
    assert out.shape == (oh, ow, 3)
    src = {bytes(px[y, x]) for y in range(h) for x in range(w)}
    assert {bytes(out[y, x]) for y in range(oh) for x in range(ow)} <= src
    assert (resize_nearest(px, ow, oh) == out).all()
