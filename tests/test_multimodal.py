"""Multimodal plumbing: the four named kernels (decode stub, feature
extract, resize, frame-sample) — schemas, batch shapes, metadata
transforms and determinism are real; only the codec is faked."""

import pytest

from origami_spark.operators.multimodal import (
    REAL_DECODE,
    _detect_real_decode,
    decode_media,
    decode_stub,
    media_decode,
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


def test_real_decode_env_override(monkeypatch):
    """ORIGAMI_REAL_DECODE forces the seam both ways, independent of
    what's importable."""
    monkeypatch.setenv("ORIGAMI_REAL_DECODE", "0")
    assert _detect_real_decode() is False
    monkeypatch.setenv("ORIGAMI_REAL_DECODE", "1")
    assert _detect_real_decode() is True


@pytest.mark.skipif(REAL_DECODE, reason="codec present: stub path n/a")
def test_codecless_env_refuses_decode(spark):
    """In this container (no PIL) the seam is honest: decode_media
    routes to the stub and media_decode refuses at PLAN time."""
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...", "image")
    with pytest.raises(NotImplementedError):
        media_decode(_media(spark))


@pytest.mark.skipif(not REAL_DECODE,
                    reason="no codec in this container (VERDICT r4 "
                           "item 8: runs unchanged on a PIL cluster)")
def test_media_decode_real_codec(spark):
    """On a PIL-equipped cluster: a real PNG decodes to its true
    dimensions; garbage payloads fail per-row into (ok=false, err)
    instead of killing the job."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 5)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue())),
         (2, "image", bytearray(b"not an image")),
         (3, "audio", bytearray(b"\x00\x01"))],
        "media_id bigint, kind string, payload binary")
    got = {r["media_id"]: r for r in media_decode(media).collect()}
    assert got[1]["ok"] and (got[1]["width"], got[1]["height"]) == (7, 5)
    assert not got[2]["ok"] and got[2]["err"]
    assert not got[3]["ok"]  # audio decode not modeled -> stubbed row


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


def _ref_blockhash(data: bytes) -> int:
    """Independent Python formulation of media_blockhash."""
    n = len(data)
    if not n:
        return 0
    seg_sum = [0] * 60
    seg_len = [0] * 60
    for i, v in enumerate(data):
        k = i * 60 // n
        seg_sum[k] += v
        seg_len[k] += 1
    total = sum(data)
    h = 0
    for k in range(60):
        if seg_sum[k] * n > total * seg_len[k]:
            h |= 1 << k
    return h


def test_blockhash_matches_python_reference(spark):
    from origami_spark.operators.multimodal import media_blockhash

    payloads = [
        (0, b""),
        (1, b"a"),
        (2, bytes(range(256)) * 3),
        (3, b"the quick brown fox jumps over the lazy dog" * 5),
        (4, b"\x00" * 59),              # shorter than 60 bytes
        (5, b"\xff\x00" * 400),
    ]
    media = spark.createDataFrame(
        [(i, "image", p) for i, p in payloads],
        "media_id bigint, kind string, payload binary")
    got = {r["media_id"]: r["bh"] for r in media_blockhash(media).collect()}
    assert got == {i: _ref_blockhash(p) for i, p in payloads}


def test_media_near_dups_finds_single_byte_edits(spark):
    """One substituted byte leaves the pair within the banding
    guarantee; unrelated payloads (distinct random-ish digests) emit
    no pair."""
    import hashlib

    from origami_spark.operators.multimodal import media_near_dups

    # NON-repeating pseudo-random bytes: a repeating short cycle (e.g.
    # a hex digest * 20) makes every segment sample the same phase and
    # unrelated payloads collide within a few bits — the block-mean
    # hash needs full-width variation to separate, like real pixels
    base = [b"".join(hashlib.sha256(f"{i}|{j}".encode()).digest()
                     for j in range(40))
            for i in range(12)]
    rows = [(i, "image", p) for i, p in enumerate(base)]
    # plant edits of originals 0..3 as ids 100..103
    for i in range(4):
        edited = bytearray(base[i])
        edited[7] = edited[7] ^ 0x5A
        rows.append((100 + i, "image", bytes(edited)))
    media = spark.createDataFrame(
        rows, "media_id bigint, kind string, payload binary")
    pairs = {(r["media_a"], r["media_b"])
             for r in media_near_dups(media, max_hamming=4).collect()}
    assert {(i, 100 + i) for i in range(4)} <= pairs
    # nothing links two distinct originals
    assert not [p for p in pairs if p[0] < 100 and p[1] < 100]


def test_media_near_dups_pigeonhole_recall_is_exact(spark):
    """Any pair within hamming <= 4 of a 5x12 banding MUST be found:
    plant controlled k-bit flips directly against the banding by
    editing payload segments."""
    from origami_spark.operators.multimodal import (media_blockhash,
                                                    media_near_dups)

    # base alternates all-0x00 / all-0xff segments (10 bytes each), so
    # every segment mean sits FAR from the payload mean and a bit flips
    # iff its whole segment is rewritten — edits are decisive, never
    # boundary-rounded away
    base = bytes(
        (0x00 if (i // 10) % 2 == 0 else 0xFF) for i in range(600))
    variants = [(0, base)]
    for j in range(1, 5):
        b = bytearray(base)
        for seg in range(j):
            lo = seg * 2 * 10            # rewrite an all-0x00 segment
            b[lo:lo + 10] = b"\xff" * 10
        variants.append((j, bytes(b)))
    media = spark.createDataFrame(
        [(i, "image", p) for i, p in variants],
        "media_id bigint, kind string, payload binary")
    hashes = {r["media_id"]: r["bh"]
              for r in media_blockhash(media).collect()}
    pairs = {(r["media_a"], r["media_b"]): r["hamming"]
             for r in media_near_dups(media, max_hamming=4).collect()}
    dists = [bin(hashes[0] ^ hashes[j]).count("1") for j in range(1, 5)]
    # the edits are decisive: exactly j bits flip — distances 1..4 are
    # ALL exercised (a vacuous guard here once hid an untested range)
    assert dists == [1, 2, 3, 4], dists
    for j, d in zip(range(1, 5), dists):
        assert (0, j) in pairs and pairs[(0, j)] == d, (j, d)
