"""WAV/PCM and MJPEG-AVI codecs (functions/wav.py, functions/avi.py):
round trips, RIFF chunk-walk correctness, loud refusals for compressed
encodings, and the multimodal operators running all three modalities
real in one batch (image metadata, audio metadata, video frame
sampling with decodable JPEG frames)."""

import struct

import numpy as np
import pytest

from qwatch_spark.functions.avi import (
    avi_header,
    encode_mjpeg_avi,
    iter_mjpeg_frames,
)
from qwatch_spark.functions.jpeg import decode_jpeg, encode_jpeg
from qwatch_spark.functions.wav import decode_wav, encode_wav, wav_header


def tone(n=800, rate=8000, hz=440):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * hz * t) * 12000).astype(np.int16)


def test_wav_roundtrip_mono_and_stereo():
    mono = tone()
    out, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and out.shape == (800, 1) and (out[:, 0] == mono).all()
    stereo = np.stack([mono, -mono], axis=1)
    out2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and (out2 == stereo).all()


def test_wav_header_and_refusals():
    assert wav_header(encode_wav(tone(), 8000)) == (8000, 800, 1)
    assert wav_header(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert wav_header(b"not riff") is None
    assert wav_header(None) is None
    # format tag 85 (mp3-in-wav) must be refused, not misparsed
    bad = bytearray(encode_wav(tone(), 8000))
    fmt_at = bad.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at, 85)
    assert wav_header(bytes(bad)) is None
    with pytest.raises(NotImplementedError, match="compressed"):
        decode_wav(bytes(bad))


def _frames(n=5, h=16, w=24):
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        g = ((xx * 3 + yy * 2 + i * 40) % 256).astype(np.uint8)
        out.append(np.stack([g, 255 - g, g], axis=-1))
    return out


def test_avi_roundtrip_frames_decode():
    frames = _frames()
    avi = encode_mjpeg_avi(frames, fps=5)
    assert avi_header(avi) == (24, 16, 5)
    got = list(iter_mjpeg_frames(avi))
    assert len(got) == 5
    for jpg, orig in zip(got, frames):
        px = decode_jpeg(jpg)  # every chunk is a standalone JPEG
        assert px.shape == orig.shape
        assert float(np.mean(np.abs(px.astype(int) - orig.astype(int)))) < 6.0
    assert avi_header(encode_wav(tone(), 8000)) is None


def test_multimodal_real_all_three_modalities(spark):
    """One mixed batch through the real codecs: image dims, audio
    rate/samples, video frame count — and the sampled frames decode."""
    from qwatch_spark.operators.multimodal import decode_metadata, sample_frames

    img = encode_jpeg(_frames(1)[0])
    wav = encode_wav(tone(), 8000)
    avi = encode_mjpeg_avi(_frames(6), fps=3)
    df = spark.createDataFrame(
        [(1, img), (2, wav), (3, avi), (4, b"junk")],
        "media_id long, payload binary",
    )
    meta = {r["media_id"]: r for r in decode_metadata(df, codec="real").collect()}
    assert (meta[1]["kind"], meta[1]["dim_a"], meta[1]["dim_b"]) == ("image", 24, 16)
    assert (meta[2]["kind"], meta[2]["dim_a"], meta[2]["dim_b"]) == ("audio", 8000, 800)
    assert (meta[3]["kind"], meta[3]["dim_a"], meta[3]["dim_b"]) == ("video", 24, 6)
    assert meta[4]["valid"] is False

    frames = sample_frames(df, every=2, codec="real").collect()
    assert [(r["media_id"], r["frame_no"]) for r in frames] == [
        (3, 0), (3, 2), (3, 4),
    ]
    for r in frames:
        assert decode_jpeg(bytes(r["frame"])).shape == (16, 24, 3)

def test_audio_features_over_decoded_pcm(spark):
    """extract_features(codec='real') on WAV: statistics over the
    DECODED |int16| samples scaled to byte range, not payload bytes."""
    from qwatch_spark.operators.multimodal import extract_features

    samples = tone(400, 8000, 200)
    df = spark.createDataFrame(
        [(1, encode_wav(samples, 8000)), (2, b"junk")],
        "media_id long, payload binary",
    )
    feats = {r["media_id"]: r for r in extract_features(df, codec="real").collect()}
    want = (np.abs(samples.astype(np.int32)) >> 7).clip(0, 255)
    assert feats[1]["mean_byte"] == pytest.approx(float(want.mean()))
    assert feats[1]["max_byte"] == int(want.max())
    assert feats[2]["mean_byte"] is None
