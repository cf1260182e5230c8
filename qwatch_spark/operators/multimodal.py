"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode kernel is pluggable per codec:

- `codec="header"` (default) — a deterministic fake that parses a
  16-byte header we define (magic, kind, width/height or rate/frames);
  tests exercise the REAL Spark plumbing (schemas, Arrow batch shapes,
  mapInPandas iterators, partitioning, explode of sampled frames) with
  bytes we can generate.
- `codec="real"` — an ACTUAL image decode, pure stdlib: PNG via
  qwatch_spark.functions.png (zlib inflate + full scanline unfiltering
  → pixels), baseline JPEG via qwatch_spark.functions.jpeg (Huffman +
  dequant + IDCT + chroma upsample → pixels), and GIF header sniffing
  for metadata. decode_metadata, extract_features, and resize_images
  all run end-to-end real on PNG and JPEG bytes (resize decodes,
  nearest-neighbor resamples, and re-encodes in the same format).
  Progressive JPEG / audio / video genuinely need external codecs and
  keep raising NotImplementedError at the plug point.

Layout of the fake media header (big-endian):
    0..4   magic b"QWMM"
    4..8   kind:   1=image, 2=audio, 3=video
    8..12  dim_a:  width  | sample_rate | width
    12..16 dim_b:  height | n_samples   | n_frames
    16..   payload bytes (pixels / samples / frames, frame = 64 bytes)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"QWMM"
KINDS = {1: "image", 2: "audio", 3: "video"}
FRAME_BYTES = 64

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("dim_a", T.IntegerType(), True),
        T.StructField("dim_b", T.IntegerType(), True),
        T.StructField("payload_bytes", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("max_byte", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def encode_fake_media(media_id: int, kind: int, dim_a: int, dim_b: int) -> bytes:
    """Deterministic synthetic payload (seeded by media_id)."""
    n = dim_b * FRAME_BYTES if kind == 3 else max(dim_a, 1) * 4
    body = bytes((media_id * 31 + i * 7) % 256 for i in range(n))
    return MAGIC + struct.pack(">III", kind, dim_a, dim_b) + body


def make_media_df(spark, n: int = 64) -> DataFrame:
    rows = []
    for i in range(n):
        kind = 1 + i % 3
        dim_a, dim_b = 8 + i % 5, 4 + i % 7
        rows.append((i, encode_fake_media(i, kind, dim_a, dim_b)))
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _parse_header(payload: bytes | None):
    if payload is None or len(payload) < 16 or payload[:4] != MAGIC:
        return None
    kind, a, b = struct.unpack(">III", payload[4:16])
    return KINDS.get(kind), a, b


def decode_metadata(media: DataFrame, codec: str = "header") -> DataFrame:
    """mapInPandas decode: binary payload → typed metadata rows.

    codec='real' parses actual media formats with the pure-stdlib
    codecs — PNG IHDR / JPEG SOF / GIF screen descriptor for images,
    RIFF fmt+data for PCM WAV audio, RIFF avih for MJPEG AVI video;
    unrecognized payloads come back valid=False."""
    if codec not in ("header", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real":
            from qwatch_spark.functions.images import sniff_media

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if codec == "real":
                    p = bytes(payload) if payload is not None else None
                    kind = sniff_media(p)
                    if kind is not None:
                        k, _fmt, a, b = kind
                        out.append((mid, k, a, b, len(p), True))
                    else:
                        out.append((mid, None, None, None, None, False))
                    continue
                hdr = _parse_header(payload)
                if hdr is None:
                    out.append((mid, None, None, None, None, False))
                else:
                    kind, a, b = hdr
                    out.append((mid, kind, a, b, len(payload) - 16, True))
            yield pd.DataFrame(
                out, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

    return media.mapInPandas(decode, MEDIA_META_SCHEMA)


def extract_features(media: DataFrame, codec: str = "header") -> DataFrame:
    """Arrow-batched numeric features.

    codec='header': over the raw payload bytes (codec-free).
    codec='real': over DECODED samples — pixels for PNG/JPEG (inflate+
    unfilter / Huffman+IDCT via the stdlib codecs), |PCM| magnitudes
    scaled to byte range (>>7 of abs int16) for WAV audio, so mean/max
    keep one unit across modalities; payloads that decode as neither
    yield null features."""
    import hashlib

    if codec not in ("header", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if codec == "real":
            from qwatch_spark.functions.images import decode_image
            from qwatch_spark.functions.wav import decode_wav

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if codec == "real":
                    try:
                        px, _fmt = decode_image(bytes(payload))
                    except (ValueError, NotImplementedError, TypeError):
                        try:
                            samples, _rate = decode_wav(bytes(payload))
                            px = (
                                np.abs(samples.astype(np.int32)) >> 7
                            ).clip(0, 255)
                        except (ValueError, NotImplementedError, TypeError):
                            out.append((mid, None, None, None))
                            continue
                    out.append(
                        (
                            mid,
                            float(px.mean()),
                            int(px.max()),
                            hashlib.md5(bytes(payload)).hexdigest(),
                        )
                    )
                    continue
                if payload is None or len(payload) <= 16:
                    out.append((mid, None, None, None))
                    continue
                body = np.frombuffer(bytes(payload[16:]), dtype=np.uint8)
                out.append(
                    (
                        mid,
                        float(body.mean()),
                        int(body.max()),
                        hashlib.md5(bytes(payload)).hexdigest(),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(feats, FEATURE_SCHEMA)


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, out_w: int, out_h: int, codec: str = "header"
) -> DataFrame:
    """binary→binary image resize (the PIL/thumbnail plug point).

    The header codec does a deterministic nearest-neighbor resample of
    the fake payload and rewrites the header dims — exercising the real
    shape of a resize stage: Arrow-batched bytes in, bytes out, non-image
    rows passed through as NULL payloads (downstream gates drop them).
    codec='real' is END-TO-END real for 8-bit PNGs and baseline JPEGs:
    stdlib decode → nearest-neighbor resample → re-encode in the SAME
    format; undecodable payloads (video etc.) come back NULL."""
    if codec not in ("header", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real":
            from qwatch_spark.functions.images import decode_image, encode_image
            from qwatch_spark.functions.png import resize_nearest

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if codec == "real":
                    try:
                        px, fmt = decode_image(bytes(payload))
                    except (ValueError, NotImplementedError, TypeError):
                        out.append((mid, None))
                        continue
                    out.append(
                        (mid, encode_image(resize_nearest(px, out_w, out_h), fmt))
                    )
                    continue
                hdr = _parse_header(payload)
                if hdr is None or hdr[0] != "image":
                    out.append((mid, None))
                    continue
                body = bytes(payload[16:])
                n_out = max(out_w, 1) * 4
                if body:
                    idx = [min(int(i * len(body) / n_out), len(body) - 1) for i in range(n_out)]
                    new_body = bytes(body[i] for i in idx)
                else:
                    new_body = b""
                out.append(
                    (mid, MAGIC + struct.pack(">III", 1, out_w, out_h) + new_body)
                )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.mapInPandas(rz, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every: int = 2, codec: str = "header"
) -> DataFrame:
    """Video frame sampling: one input row → N frame rows (row-expanding
    mapInPandas — the UDTF-shaped multimodal op).

    codec='real' walks MJPEG AVI containers (RIFF '00dc' chunk walk):
    each emitted frame is a standalone JPEG, decodable downstream with
    functions.jpeg.decode_jpeg — the plug point is real end-to-end for
    the one video coding a pure-stdlib decoder can reach. Inter-coded
    video (H.264 etc.) stays honestly out of scope."""
    if codec not in ("header", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real":
            from qwatch_spark.functions.avi import iter_mjpeg_frames

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if codec == "real":
                    p = bytes(payload) if payload is not None else b""
                    for fno, jpg in enumerate(iter_mjpeg_frames(p)):
                        if fno % every == 0:
                            out.append((mid, fno, jpg))
                    continue
                hdr = _parse_header(payload)
                if hdr is None or hdr[0] != "video":
                    continue
                _, _, n_frames = hdr
                body = bytes(payload[16:])
                for fno in range(0, n_frames, every):
                    out.append(
                        (mid, fno, body[fno * FRAME_BYTES : (fno + 1) * FRAME_BYTES])
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(frames, FRAME_SCHEMA)
