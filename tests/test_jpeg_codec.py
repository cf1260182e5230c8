"""Pure-stdlib baseline JPEG codec units: encode↔decode round trips
(grayscale / RGB, 4:4:4 / 4:2:0, odd dimensions), spec conformance of
the zigzag and header layout, loud NotImplementedError for the
profiles a baseline decoder must refuse, and the multimodal operators
running end-to-end real on JPEG payloads."""

import struct

import numpy as np
import pytest

from qwatch_spark.functions.jpeg import (
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    jpeg_header,
)


def smooth(h, w, phase=0.0):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        (128 + 60 * np.sin(xx / 9.0 + phase) + 50 * np.cos(yy / 7.0))
        .clip(0, 255)
        .astype(np.uint8)
    )


def test_zigzag_is_the_spec_order():
    # ITU T.81 Figure A.6, first two anti-diagonal sweeps + spot checks
    assert list(_ZIGZAG[:16]) == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    ]
    assert _ZIGZAG[63] == 63 and sorted(_ZIGZAG) == list(range(64))


@pytest.mark.parametrize("shape", [(24, 24), (45, 62), (8, 8), (17, 9)])
def test_grayscale_roundtrip(shape):
    img = smooth(*shape)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert float(np.mean(np.abs(out.astype(int) - img.astype(int)))) < 3.0


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("shape", [(32, 48), (45, 62)])
def test_rgb_roundtrip(shape, subsample):
    g = smooth(*shape)
    img = np.stack([g, np.roll(g, 5, 1), 255 - g], axis=-1)
    payload = encode_jpeg(img, subsample=subsample)
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    tol = 8.0 if subsample else 5.0  # chroma box-mean loses detail
    assert float(np.mean(np.abs(out.astype(int) - img.astype(int)))) < tol
    # 4:2:0 streams must actually be smaller AND declare 2x2 sampling
    if subsample:
        sof = payload.index(b"\xff\xc0")
        assert payload[sof + 11] == 0x22  # luma h=2, v=2
        assert len(payload) < len(encode_jpeg(img, subsample=False))


def test_header_sniff():
    img = smooth(20, 30)
    assert jpeg_header(encode_jpeg(img)) == (30, 20, 1)
    rgb = np.stack([img] * 3, axis=-1)
    assert jpeg_header(encode_jpeg(rgb)) == (30, 20, 3)
    assert jpeg_header(b"not a jpeg") is None
    assert jpeg_header(None) is None
    assert jpeg_header(b"\xff\xd8\xff JPEG-ish garbage") is None


def test_flat_regions_are_lossless_modulo_rounding():
    """A constant image quantizes to pure DC — decode must be exact."""
    img = np.full((16, 24), 97, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 1


def test_unsupported_profiles_raise_loudly():
    img = smooth(16, 16)
    payload = bytearray(encode_jpeg(img))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(payload))
    payload[sof + 1] = 0xCD  # arithmetic
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_random_content_roundtrip_has_no_false_negatives():
    """Noise is the worst case for DCT compression but the pipeline must
    still round-trip structurally (shape, dtype, bounded error)."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (19, 26, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    # flat Q=10/20 tables: even noise stays within quantization reach
    assert float(np.mean(np.abs(out.astype(int) - img.astype(int)))) < 20.0


def _jpeg_media_df(spark):
    g = smooth(12, 16)
    rgb = np.stack([g, 255 - g, np.roll(g, 3, 1)], axis=-1)
    rows = [
        (1, encode_jpeg(g), g[:, :, None]),
        (2, encode_jpeg(rgb), rgb),
        (3, encode_jpeg(rgb, subsample=True), rgb),
    ]
    df = spark.createDataFrame(
        [(mid, bytes(p)) for mid, p, _ in rows],
        "media_id long, payload binary",
    )
    return df, rows


def test_multimodal_real_codec_handles_jpeg(spark):
    from qwatch_spark.functions.images import decode_image
    from qwatch_spark.operators.multimodal import (
        decode_metadata,
        extract_features,
        resize_images,
    )

    df, rows = _jpeg_media_df(spark)
    meta = {r["media_id"]: r for r in decode_metadata(df, codec="real").collect()}
    for mid, _p, px in rows:
        assert (meta[mid]["kind"], meta[mid]["dim_a"], meta[mid]["dim_b"]) == (
            "image", px.shape[1], px.shape[0],
        )
    feats = {r["media_id"]: r for r in extract_features(df, codec="real").collect()}
    for mid, p, _px in rows:
        want = decode_jpeg(p)  # features are over DECODED pixels
        assert feats[mid]["mean_byte"] == pytest.approx(float(want.mean()))
        assert feats[mid]["max_byte"] == int(want.max())
    out = {
        r["media_id"]: r["payload"]
        for r in resize_images(df, out_w=6, out_h=5, codec="real").collect()
    }
    for mid, _p, _px in rows:
        px2, fmt = decode_image(bytes(out[mid]))  # re-encoded same format
        assert fmt == "jpeg" and px2.shape[:2] == (5, 6)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    channels=st.sampled_from([1, 3]),
    subsample=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_roundtrip_structural(h, w, channels, subsample, seed):
    """ANY size/content/mode round-trips: correct declared and decoded
    dimensions, uint8 out, error bounded by the flat quantizer."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h, w)).astype(np.float32)
    # low-pass the noise a little so the error bound is meaningful
    img = ((base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3).astype(np.uint8)
    if channels == 3:
        img = np.stack([img, 255 - img, np.roll(img, 2, 1)], axis=-1)
    payload = encode_jpeg(img, subsample=subsample and channels == 3)
    hdr = jpeg_header(payload)
    assert hdr == (w, h, channels)
    out = decode_jpeg(payload)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = float(np.mean(np.abs(out.astype(int) - img.astype(int))))
    # worst case: near-noise chroma through a 4:2:0 box mean — the
    # bound is structural sanity, not a quality promise
    assert err < 35.0, err
