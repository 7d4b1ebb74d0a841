"""Text-analysis functions and multimodal plumbing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from bluegraph_spark.functions.text import (
    fingerprint,
    langid_col,
    quality_score,
    simhash64,
    token_count,
    tokens_col,
)
from bluegraph_spark.operators.multimodal import (
    extract_media_features,
    fake_byte_features,
    sample_frames,
)


def test_token_count_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "b a c a"), (2, "a b c"), (3, "c b a a a")], "id long, text string"
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            token_count("text").alias("n"),
            fingerprint("text").alias("fp"),
        ).collect()
    }
    assert rows[1].n == 4 and rows[2].n == 3
    # same distinct token set => same fingerprint
    assert rows[1].fp == rows[2].fp == rows[3].fp
    assert rows[1].fp == hashlib.md5(b"a b c").hexdigest()


def test_langid(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of it is in that"),
            (2, "el la de que y los en un"),
            (3, "xyz qrs tuv"),
        ],
        "id long, text string",
    )
    got = {r.id: r.lang for r in df.select("id", langid_col("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "es", 3: "und"}


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["word"] * 50)), (2, "!!!"), (3, "")], "id long, text string"
    )
    got = {r.id: r.q for r in df.select("id", quality_score("text").alias("q")).collect()}
    assert 0.0 <= got[2] <= got[1] <= 1.0


def test_simhash_deterministic(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")], "id long, text string")
    sigs = [
        r.s for r in df.select(simhash64(tokens_col("text")).alias("s")).collect()
    ]
    assert sigs[0] == sigs[1] != 0


def test_media_features_and_frames(spark):
    media = spark.createDataFrame(
        [
            ("m1", "image", bytes(range(256)) * 8),
            ("m2", "audio", b"\x00" * 100),
            ("m3", "video", b""),
        ],
        "media_id string, kind string, payload binary",
    )
    feats = {r.media_id: r for r in extract_media_features(media).collect()}
    assert feats["m1"].n_bytes == 2048
    assert feats["m1"].byte_mean == pytest.approx(127.5)
    assert sum(feats["m1"].histogram) == pytest.approx(1.0)
    assert feats["m3"].n_bytes == 0

    frames = sample_frames(media, every_n_bytes=512, max_frames=4).collect()
    m1_frames = [r for r in frames if r.media_id == "m1"]
    assert [r.byte_offset for r in sorted(m1_frames, key=lambda r: r.frame_no)] == [
        0, 512, 1024, 1536,
    ]

    with pytest.raises(NotImplementedError):
        extract_media_features(media, decoder="real")
