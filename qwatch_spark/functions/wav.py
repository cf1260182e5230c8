"""Pure-stdlib WAV/PCM codec (RIFF parsing + numpy) — the REAL audio
path for the multimodal operators. PCM needs no external codec: the
container is a RIFF chunk walk and the samples are the bytes.
Compressed audio (mp3/aac/ogg) genuinely needs external codecs and
keeps raising NotImplementedError at the plug point.

No reference analog — qwatch has no media path; this covers the
training-data brief's multimodal-column requirement.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 PCM (n,) mono or (n, ch) → a canonical RIFF/WAVE stream."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"unsupported sample shape {a.shape}")
    n, ch = a.shape
    data = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16
    )  # PCM, block align = ch * 16-bit
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_riff(payload: bytes, form: bytes):
    """Yield (chunk_id, body) for the top-level chunks of a RIFF form."""
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != form
    ):
        return
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        yield cid, payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned


def wav_header(payload: bytes) -> tuple[int, int, int] | None:
    """(sample_rate, n_samples, n_channels) or None if not PCM WAV."""
    fmt = data_len = None
    for cid, body in _walk_riff(payload, b"WAVE"):
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_len = len(body)
    if fmt is None or data_len is None or fmt[0] != 1:  # PCM only
        return None
    _tag, ch, rate, _bps, block, _bits = fmt
    if block == 0:
        return None
    return rate, data_len // block, ch


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """((n_samples, n_channels) int16 array, sample_rate). ValueError
    for non-WAV, NotImplementedError for non-16-bit-PCM encodings."""
    fmt = data = None
    for cid, body in _walk_riff(payload, b"WAVE"):
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("not a WAV (missing fmt/data chunk)")
    tag, ch, rate, _bps, _block, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"compressed WAV (format tag {tag})")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit PCM")
    n = len(data) // (2 * ch)
    samples = np.frombuffer(data[: n * 2 * ch], dtype="<i2").reshape(n, ch)
    return samples, rate
