"""Multimodal plumbing and skew-mitigation behavior tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_from_scratch_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_table,
    sample_frames,
)
from vector_db_from_scratch_spark.operators.skew import (
    NUM_SALTS,
    salted_event_totals,
)


def test_media_table_payloads_roundtrip(spark, sf_dir):
    rows = media_table(spark, sf_dir).limit(5).collect()
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).collect()}
    for r in rows:
        assert bytes(r["payload"]).decode("utf-8") == docs[r["media_id"]]
        assert r["n_bytes"] == len(bytes(r["payload"]))


def test_decode_stub_rejects_unknown_kind():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "hologram")


def test_feature_extraction_histogram_sums(spark, sf_dir):
    feats = extract_features(spark, sf_dir).collect()
    assert len(feats) == 500
    for r in feats[:20]:
        assert sum(r["hist"]) == r["n_bytes"]
        assert 0.0 <= r["byte_mean"] <= 255.0


def test_frame_sampling_stride(spark, sf_dir):
    frames = sample_frames(spark, sf_dir, stride=64)
    media = media_table(spark, sf_dir).filter("kind = 'video'")
    expected = media.select(
        F.sum(F.ceil(F.col("n_bytes") / 64)).alias("n")
    ).collect()[0]["n"]
    assert frames.count() == expected


def test_salted_agg_matches_direct(spark, sf_dir):
    salted = {r["event_type"]: (r["total_value"], r["n_events"])
              for r in salted_event_totals(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = {
        r["event_type"]: (float(r["s"]), r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(salted) == set(direct)
    for k in salted:
        assert salted[k][1] == direct[k][1]
        assert salted[k][0] == pytest.approx(direct[k][0], abs=1e-6)


def test_salt_spreads_keys(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(NUM_SALTS)))
        .select("salt").distinct().count()
    )
    assert n == NUM_SALTS

def test_skew_salt_auto_decision_sound(spark, sf_dir):
    """Sketch-derived salt decision: the CM bound never under-estimates
    the heaviest key (so the salt never under-provisions), the chosen S is
    in [1, MAX_SALTS], the salted two-stage checksum equals the direct
    aggregation exactly, and regrouping loses no rows."""
    from vector_db_from_scratch_spark.operators import skew

    r = skew.skew_salt_auto(spark, sf_dir).collect()[0]
    assert r["est_never_under"]
    assert r["est_max"] >= r["max_count"]
    assert 1 <= r["salt_s"] <= skew.MAX_SALTS
    assert r["checksum_diff"] == 0
    assert r["regroup_diff"] == 0
    assert r["max_partial"] <= r["max_count"]
    # the decision is self-consistent: S chosen = clamp(ceil(est_max/target))
    import math
    expect = min(max(math.ceil(r["est_max"] / r["target"]), 1), skew.MAX_SALTS)
    assert r["salt_s"] == expect


def test_real_media_fixture_deterministic_and_nontrivial(tmp_path, monkeypatch):
    """The genuine-blob fixture regenerates byte-identically from its seed
    (content-keyed artifacts must be reproducible in any environment) and
    actually exercises the decoder paths text-wrapped payloads cannot:
    2-D rasters, an odd-sized pre-data RIFF chunk, multi-frame video."""
    import pyarrow.parquet as pq

    from vector_db_from_scratch_spark.operators.multimodal import decode_media
    from vector_db_from_scratch_spark.sources import media_fixtures as mf

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "a"))
    b1, g1 = mf.ensure_media_fixture()
    blobs1 = pq.read_table(b1).to_pylist()
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "b"))
    b2, _ = mf.ensure_media_fixture()
    blobs2 = pq.read_table(b2).to_pylist()
    assert blobs1 == blobs2

    golden = {r["media_id"]: r for r in pq.read_table(g1).to_pylist()}
    assert len(blobs1) == 3 * mf.N_PER_KIND
    for row in blobs1:
        arr = decode_media(row["payload"], row["kind"])
        g = golden[row["media_id"]]
        assert len(arr) == g["n_samples"] == row["n_bytes"]
        assert int(arr.astype("int64").sum()) == g["sample_sum"]
        assert len(row["payload"]) - len(arr) == g["header_overhead"]
    # non-text dimensions really present
    import struct as _s
    pgms = [r["payload"] for r in blobs1 if r["kind"] == "image"]
    assert all(p.startswith(b"P5") for p in pgms)
    assert any(int(p.split(b"\n")[1].split(b" ")[1]) > 1 for p in pgms)  # height > 1
    wavs = [r["payload"] for r in blobs1 if r["kind"] == "audio"]
    assert all(b"LIST" in w and w.index(b"LIST") < w.index(b"data") for w in wavs)
    y4ms = [r["payload"] for r in blobs1 if r["kind"] == "video"]
    assert all(p.count(b"FRAME") >= 2 for p in y4ms)
    assert all(b"FRAME Xfix\n" in p for p in y4ms)
