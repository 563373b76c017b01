"""Multimodal plumbing: Arrow/mapInPandas over binary payload columns.

The codec layer is stubbed (this container has no image/audio libs —
decode_image raises); these tests pin the REAL parts: schemas, row
expansion, determinism, and edge payloads."""
import hashlib

import pytest


def _payload_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_image_is_a_stub():
    from nexusbase_spark.pipeline.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_sample_frames_expansion_and_sha(spark):
    from nexusbase_spark.pipeline.multimodal import sample_frames

    b = bytes(range(256)) * 10          # 2560 bytes -> 3 frames of 1024/1024/512
    df = _payload_df(spark, [(1, b), (2, b"xy"), (3, b"")])
    got = {(r["doc_id"], r["frame_idx"]): r
           for r in sample_frames(df, frame_size=1024, every=2).collect()}
    # doc 1: frames 0 and 2 sampled (every=2), frame 1 skipped
    assert set(got) == {(1, 0), (1, 2), (2, 0), (3, 0)}
    assert got[(1, 0)]["frame_bytes"] == 1024
    assert got[(1, 2)]["frame_bytes"] == 512
    assert got[(1, 2)]["frame_sha"] == hashlib.sha256(b[2048:]).hexdigest()
    # sub-frame and empty payloads still emit exactly one frame row
    assert got[(2, 0)]["frame_bytes"] == 2
    assert got[(3, 0)]["frame_bytes"] == 0


def test_resize_payload_exact_size_and_tiling(spark):
    from nexusbase_spark.pipeline.multimodal import resize_payload

    df = _payload_df(spark, [(1, b"abc"), (2, b"x" * 1000), (3, b"")])
    got = {r["doc_id"]: r for r in resize_payload(df, out_bytes=8).collect()}
    assert all(r["n_bytes"] == 8 for r in got.values())
    assert bytes(got[1]["payload"]) == b"abcabcab"   # tiled then truncated
    assert bytes(got[2]["payload"]) == b"x" * 8      # truncated
    assert bytes(got[3]["payload"]) == b"\x00" * 8   # empty -> zero fill


def test_extract_features_deterministic_unit_interval(spark):
    from nexusbase_spark.pipeline.multimodal import extract_features

    df = _payload_df(spark, [(1, b"hello"), (2, b"hello"), (3, b"world")])
    got = {r["doc_id"]: r["features"] for r in extract_features(df, dim=8).collect()}
    assert got[1] == got[2] != got[3]
    assert len(got[1]) == 8 and all(0.0 <= v <= 1.0 for v in got[1])
    assert got[1][0] == hashlib.sha256(b"hello").digest()[0] / 255.0
