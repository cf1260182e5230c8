"""Format dispatch over the pure-stdlib image codecs (png.py, jpeg.py):
one sniff/decode/encode surface for the multimodal operators, so the
Arrow-batched UDFs don't care which real codec a payload needs.
Video/audio still have no in-sandbox codec and keep raising
NotImplementedError at their plug points."""

from __future__ import annotations

import numpy as np

from qwatch_spark.functions.jpeg import decode_jpeg, encode_jpeg, jpeg_header
from qwatch_spark.functions.png import (
    decode_png,
    encode_png,
    gif_header,
    png_header,
)


def sniff_image(payload: bytes | None):
    """('png'|'jpeg'|'gif', width, height) or None. GIF is
    metadata-only (no pixel codec — LZW stays out of scope)."""
    p = png_header(payload)
    if p is not None:
        return "png", p[0], p[1]
    j = jpeg_header(payload)
    if j is not None:
        return "jpeg", j[0], j[1]
    g = gif_header(payload)
    if g is not None:
        return "gif", g[0], g[1]
    return None


def sniff_media(payload: bytes | None):
    """(kind, fmt, dim_a, dim_b) across every real codec: images are
    (w, h), audio is (rate, n_samples), video is (width, n_frames) —
    the same dim semantics as the fake 16-byte header, so the metadata
    schema is codec-independent."""
    img = sniff_image(payload)
    if img is not None:
        return "image", img[0], img[1], img[2]
    from qwatch_spark.functions.avi import avi_header
    from qwatch_spark.functions.wav import wav_header

    wav = wav_header(payload)
    if wav is not None:
        return "audio", "wav", wav[0], wav[1]
    avi = avi_header(payload)
    if avi is not None:
        return "video", "mjpeg-avi", avi[0], avi[2]
    return None


def decode_image(payload: bytes) -> tuple[np.ndarray, str]:
    """(pixels, format) for PNG/JPEG payloads; ValueError otherwise."""
    kind = sniff_image(payload)
    if kind is None:
        raise ValueError("not a decodable image")
    fmt = kind[0]
    if fmt == "png":
        return decode_png(payload), fmt
    if fmt == "jpeg":
        return decode_jpeg(payload), fmt
    raise NotImplementedError(f"{fmt} pixel decode")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_jpeg(pixels)
    raise NotImplementedError(f"{fmt} encode")
