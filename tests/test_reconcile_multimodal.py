"""Snapshot reconciliation (SURVEY §3.3) + multimodal plumbing tests."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qwatch_spark.config import PipelineConfig
from qwatch_spark.datagen import gen_feed_df
from qwatch_spark.operators.apply import apply_changes
from qwatch_spark.operators.multimodal import (
    decode_metadata,
    extract_features,
    make_media_df,
    sample_frames,
)
from qwatch_spark.operators.reconcile import reconcile_snapshot
from qwatch_spark.plans.snapshot_table import SnapshotTable

CFG = PipelineConfig(n_buckets=8)


def test_reconcile_upserts_and_deletes(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    feed = gen_feed_df(spark, 800).drop("epoch_hint")
    apply_changes(spark, feed, table, 0, CFG)
    before = {r["url"] for r in table.read(spark).select("url").collect()}
    assert before

    # snapshot: half the live rows, with fresh html
    snap_urls = sorted(before)[: len(before) // 2]
    snapshot = (
        table.read(spark)
        .filter(F.col("url").isin(snap_urls))
        .select("url", "html", "lang")
        .withColumn("html", F.concat(F.lit(b"<p>snap</p>")))
    )
    observed = dt.datetime(2030, 1, 1)
    stats = reconcile_snapshot(
        spark, snapshot, table, 1, CFG, observed_at=observed, delete_missing=True
    )
    assert not stats.skipped
    after = table.read(spark)
    urls_after = {r["url"] for r in after.select("url").collect()}
    assert urls_after == set(snap_urls)  # missing keys tombstoned
    row = after.limit(1).collect()[0]
    assert row["warc_ts"] == observed
    assert row["text"] == "snap"  # projection re-ran on snapshot payload

    # idempotent: re-delivering the reconcile epoch is a no-op
    assert reconcile_snapshot(
        spark, snapshot, table, 1, CFG, observed_at=observed, delete_missing=True
    ).skipped


def test_reconcile_does_not_regress_newer_events(spark, tmp_path):
    """A snapshot observed BEFORE an event's warc_ts must not overwrite it."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    feed = gen_feed_df(spark, 300).drop("epoch_hint")
    apply_changes(spark, feed, table, 0, CFG)
    state = {r["url"]: r["warc_ts"] for r in table.read(spark).collect()}
    old_snapshot = table.read(spark).select("url", "html", "lang")
    reconcile_snapshot(
        spark, old_snapshot, table, 1, CFG,
        observed_at=dt.datetime(2000, 1, 1),  # ancient observation
    )
    after = {r["url"]: r["warc_ts"] for r in table.read(spark).collect()}
    assert after == state


def test_multimodal_decode_and_features(spark):
    media = make_media_df(spark, n=30)
    meta = decode_metadata(media)
    rows = {r["media_id"]: r for r in meta.collect()}
    assert len(rows) == 30
    assert all(r["valid"] for r in rows.values())
    assert {r["kind"] for r in rows.values()} == {"image", "audio", "video"}

    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert all(f["digest"] is not None and 0 <= f["mean_byte"] <= 255 for f in feats.values())
    # deterministic: same payload → same digest across runs
    feats2 = {r["media_id"]: r["digest"] for r in extract_features(media).collect()}
    assert feats2 == {k: v["digest"] for k, v in feats.items()}


def test_multimodal_invalid_payload_flagged(spark):
    from pyspark.sql import types as T

    bad = spark.createDataFrame(
        [(99, b"NOTMAGIC-garbage")],
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    r = decode_metadata(bad).collect()[0]
    assert r["valid"] is False and r["kind"] is None


def test_frame_sampling_expands_rows(spark):
    media = make_media_df(spark, n=30)
    frames = sample_frames(media, every=2)
    got = frames.collect()
    assert got  # video rows exist
    from qwatch_spark.operators.multimodal import FRAME_BYTES, _parse_header

    meta = {r["media_id"]: r for r in decode_metadata(media).collect()}
    by_media: dict[int, list] = {}
    for r in got:
        by_media.setdefault(r["media_id"], []).append(r)
        assert len(bytes(r["frame"])) == FRAME_BYTES
    for mid, rows in by_media.items():
        assert meta[mid]["kind"] == "video"
        n_frames = meta[mid]["dim_b"]
        assert len(rows) == (n_frames + 1) // 2
        assert sorted(r["frame_no"] for r in rows) == list(range(0, n_frames, 2))


def _png_media_df(spark, n=6):
    """(media_id, payload): real PNGs of varying dims/channels, one GIF
    header, one garbage payload."""
    import struct

    import numpy as np

    from qwatch_spark.functions.png import encode_png

    rows = []
    for i in range(n):
        c = (1, 3, 4)[i % 3]
        w, h = 4 + i, 3 + i
        px = ((np.arange(h * w * c).reshape(h, w, c) * (i + 7)) % 256).astype(
            np.uint8
        )
        rows.append((i, bytearray(encode_png(px)), px))
    gif = bytearray(b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8)
    rows.append((100, gif, None))
    rows.append((101, bytearray(b"\xff\xd8\xff JPEG-ish garbage"), None))
    df = spark.createDataFrame(
        [(mid, bytes(p)) for mid, p, _ in rows],
        "media_id long, payload binary",
    )
    return df, {mid: px for mid, _, px in rows if px is not None}


def test_real_codec_decodes_png_metadata(spark):
    df, pixels = _png_media_df(spark)
    meta = {r["media_id"]: r for r in decode_metadata(df, codec="real").collect()}
    for mid, px in pixels.items():
        h, w = px.shape[:2]
        r = meta[mid]
        assert (r["kind"], r["dim_a"], r["dim_b"], r["valid"]) == ("image", w, h, True)
    assert (meta[100]["kind"], meta[100]["dim_a"], meta[100]["dim_b"]) == (
        "image", 320, 200,
    )
    assert meta[101]["valid"] is False and meta[101]["kind"] is None


def test_real_codec_pixel_features(spark):
    """extract_features(codec='real') statistics are over DECODED pixels
    (zlib inflate + unfilter), matching numpy on the source arrays."""
    df, pixels = _png_media_df(spark)
    feats = {r["media_id"]: r for r in extract_features(df, codec="real").collect()}
    for mid, px in pixels.items():
        assert feats[mid]["mean_byte"] == pytest.approx(float(px.mean()))
        assert feats[mid]["max_byte"] == int(px.max())
    assert feats[100]["mean_byte"] is None  # GIF pixels need a real LZW codec
    assert feats[101]["mean_byte"] is None


def test_real_codec_resize_roundtrip(spark):
    """resize(codec='real') emits VALID PNGs whose pixels are the exact
    nearest-neighbor resample of the originals."""
    import numpy as np

    from qwatch_spark.functions.png import decode_png, resize_nearest
    from qwatch_spark.operators.multimodal import resize_images

    df, pixels = _png_media_df(spark)
    out = {
        r["media_id"]: r["payload"]
        for r in resize_images(df, out_w=4, out_h=4, codec="real").collect()
    }
    for mid, px in pixels.items():
        got = decode_png(bytes(out[mid]))
        want = resize_nearest(px, 4, 4)
        assert got.shape == (4, 4, px.shape[2]) and (got == want).all()
    assert out[100] is None and out[101] is None  # undecodable → NULL


def test_resize_images_rewrites_dims_and_resamples(spark):
    from qwatch_spark.operators.multimodal import (
        decode_metadata,
        make_media_df,
        resize_images,
    )

    media = make_media_df(spark, 12)
    resized = resize_images(media, out_w=4, out_h=4)
    meta = decode_metadata(resized).collect()
    by_id = {r["media_id"]: r for r in meta}
    orig = {r["media_id"]: r for r in decode_metadata(media).collect()}
    for mid, r in by_id.items():
        if orig[mid]["kind"] == "image":
            assert (r["kind"], r["dim_a"], r["dim_b"]) == ("image", 4, 4)
            assert r["payload_bytes"] == 16  # 4 px * 4 bytes
        else:  # non-images pass through as NULL payloads
            assert not r["valid"]
    # deterministic: same input → byte-identical output
    a = {r["media_id"]: bytes(r["payload"]) for r in resized.collect() if r["payload"]}
    b = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 4, 4).collect() if r["payload"]}
    assert a == b


def test_unknown_codec_rejected(spark):
    import pytest

    from qwatch_spark.operators.multimodal import make_media_df, resize_images

    with pytest.raises(ValueError, match="unknown codec"):
        resize_images(make_media_df(spark, 2), 4, 4, codec="pil")
    with pytest.raises(ValueError, match="unknown codec"):
        decode_metadata(make_media_df(spark, 2), codec="ffmpeg")
