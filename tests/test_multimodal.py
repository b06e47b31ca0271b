"""Multimodal plumbing: the four named kernels (decode stub, feature
extract, resize, frame-sample) — schemas, batch shapes, metadata
transforms and determinism are real; only the codec is faked."""

import pytest

from origami_spark.operators.multimodal import (
    decode_stub,
    media_features,
    media_from_documents,
    resize_images,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def _media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return media_from_documents(docs).cache()


def test_decode_stub_is_honest():
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "image")


def test_resize_plumbing(spark):
    media = _media(spark)
    n_images = media.filter("kind = 'image'").count()
    out = resize_images(media, 32, 24).cache()
    assert out.count() == n_images
    rows = out.collect()
    for r in rows[:20]:
        assert len(bytes(r["payload"])) == 32 * 24   # exact target size
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 24
        assert r["meta"]["sample_rate"] == 16000     # carried through
    # deterministic
    again = {r["media_id"]: bytes(r["payload"])
             for r in resize_images(media, 32, 24).collect()}
    assert all(bytes(r["payload"]) == again[r["media_id"]] for r in rows)


def test_frame_sampling_time_grid(spark):
    media = _media(spark)
    frames = sample_frames(media, every_ms=500).cache()
    vids = {r["media_id"]: r["meta"]["duration_ms"]
            for r in media.filter("kind = 'video'").collect()}
    got = frames.collect()
    assert got
    per_vid = {}
    for r in got:
        per_vid.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
    for mid, fr in per_vid.items():
        fr.sort()
        # contiguous frame indexes on the 500ms grid, within duration
        assert [i for (i, _t) in fr] == list(range(len(fr)))
        assert all(t == i * 500 for (i, t) in fr)
        assert fr[-1][1] < max(vids[mid], 1)
    assert set(per_vid) == set(vids)
