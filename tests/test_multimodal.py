"""Multimodal operator tests: byte-exact frame slicing, histogram
features vs a pure-numpy reference, decode stats, and the documented
resize stub."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from irs_990_efiler_database_spark.catalog import load_table
from irs_990_efiler_database_spark.operators.multimodal import (
    FRAME_BYTES,
    byte_histogram_features,
    byte_histogram_rows,
    decode_image,
    resize_image,
    sample_frames,
    synthetic_media,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(load_table(spark, SF, "documents")).cache()


def test_media_schema_and_kinds(media):
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.filter(F.col("kind") == "image").first()
    assert row["meta"]["width"] >= 16 and row["meta"]["height"] >= 1


def test_frame_sampling_is_byte_exact(media):
    frames = {
        (r["media_id"], r["frame_idx"]): bytes(r["frame"])
        for r in sample_frames(media, every=4).collect()
    }
    assert frames
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for (mid, idx), frame in frames.items():
        start = idx * FRAME_BYTES
        assert frame == payloads[mid][start : start + FRAME_BYTES]
        assert idx % 4 == 0 and len(frame) == FRAME_BYTES


def test_byte_histogram_matches_numpy(media):
    got = {
        r["media_id"]: r["features"]
        for r in byte_histogram_features(media).collect()
    }
    for r in media.limit(20).collect():
        buf = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        hist = np.bincount(buf >> 4, minlength=16)[:16]
        want = (hist / max(hist.sum(), 1)).astype(np.float32)
        assert np.allclose(got[r["media_id"]], want)


def test_decode_stats_pad_semantics(media):
    stats = {r["media_id"]: r for r in decode_image(media).collect()}
    r = media.filter(F.col("kind") == "image").first()
    buf = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
    w, h = r["meta"]["width"], r["meta"]["height"]
    px = np.zeros(w * h, dtype=np.uint8)
    px[: min(buf.size, w * h)] = buf[: w * h]
    s = stats[r["media_id"]]
    assert s["mean_px"] == pytest.approx(float(px.mean()))
    assert s["min_px"] == int(px.min()) and s["max_px"] == int(px.max())


def test_byte_histogram_rows_match_features(media):
    rows = byte_histogram_rows(media).collect()
    by_id: dict[int, dict[int, tuple[int, float]]] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], {})[r["bin"]] = (r["cnt"], r["weight"])
    for r in media.limit(20).collect():
        buf = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        hist = np.bincount(buf >> 4, minlength=16)[:16]
        got = by_id.get(r["media_id"], {})
        assert set(got) == {int(b) for b in np.nonzero(hist)[0]}
        for b, (cnt, weight) in got.items():
            assert cnt == int(hist[b])
            assert weight == hist[b] / buf.size  # exact IEEE division


def test_resize_nearest_neighbor_exact(media):
    out = resize_image(media, 8, 8)
    assert out.schema == media.schema
    resized = {
        r["media_id"]: r
        for r in out.filter(F.col("kind") == "image").collect()
    }
    for r in media.filter(F.col("kind") == "image").limit(10).collect():
        w, h = r["meta"]["width"], r["meta"]["height"]
        buf = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        px = np.zeros(w * h, dtype=np.uint8)
        px[: min(buf.size, w * h)] = buf[: w * h]
        grid = px.reshape(h, w)
        rr = (np.arange(8) * h) // 8
        cc = (np.arange(8) * w) // 8
        want = grid[np.ix_(rr, cc)].tobytes()
        got = resized[r["media_id"]]
        assert bytes(got["payload"]) == want
        assert got["meta"]["width"] == 8 and got["meta"]["height"] == 8
        assert got["meta"]["n_bytes"] == 64


def test_resize_passes_non_images_through(media):
    out = resize_image(media, 8, 8)
    orig = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter(F.col("kind") != "image").collect()
    }
    got = {
        r["media_id"]: bytes(r["payload"])
        for r in out.filter(F.col("kind") != "image").collect()
    }
    assert got == orig


def test_dhash_finds_planted_copies_and_gradient_invariance(spark):
    """dHash must pair every planted exact copy with its original at
    l1 = 0, and the fingerprint must be invariant to a uniform
    histogram scale (gradient ordering only), unlike a mean-threshold
    hash."""
    from irs_990_efiler_database_spark.queries.multimodal_ops import (
        mm_dhash_neardup,
    )

    rows = mm_dhash_neardup(spark, "/root/testdata/sf0.001").collect()
    pairs = {(r["id_a"], r["id_b"]): r["l1"] for r in rows}
    for i in range(25):
        assert pairs.get((i, i + 1_000_000)) == 0.0, f"copy {i} not paired"
