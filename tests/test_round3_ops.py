"""Round-3 surfaces: per-library LSH config, reference disk-layout
migration, distributed range report, scratch-dir lifecycle."""

import os

import numpy as np
import pytest

from vector_db_from_scratch_spark.operators.entity import (
    EntityError,
    FrozenFieldError,
    demo_store,
    store_from_driver_tables,
    _store_restricted,
)
from vector_db_from_scratch_spark.operators.lsh import (
    NUM_PROJECTIONS,
    _bucket_of,
    projection_matrix,
)
from vector_db_from_scratch_spark.sources.artifacts import scratch_dir
from vector_db_from_scratch_spark.sources.reference_layout import (
    load_reference_layout,
    validate_index_sidecars,
    write_reference_layout,
)


# -- per-library LSH config (reference indexes.py:172-187) -----------------

def test_seeded_projection_matrix_differs_from_default():
    default = projection_matrix(dimension=8)
    seeded = projection_matrix(dimension=8, num_projections=4, seed=123)
    assert len(default) == NUM_PROJECTIONS and len(seeded) == 4
    assert default[0] != seeded[0]
    # deterministic per seed
    assert seeded == projection_matrix(dimension=8, num_projections=4, seed=123)


def test_seeded_config_changes_bucket_assignment():
    v = [0.3, -0.7, 0.2, 0.9, -0.1, 0.5, -0.4, 0.8]
    b_default = _bucket_of(v, projection_matrix(dimension=8))
    b_seeded = _bucket_of(v, projection_matrix(dimension=8, num_projections=4, seed=123))
    assert b_seeded < 16  # only 4 bits wide
    assert (b_default, 8) != (b_seeded, 4)


def test_store_search_reads_library_lsh_config(spark):
    """The seeded library's search must flow (num_projections, random_state)
    into the projection matrix: mirror of the reference's seeded index tests
    (tests/test_indexes.py:64-90) -- the nearest chunk wins under any seed
    for these orthogonal fixtures, and the library row carries the config."""
    store = demo_store(spark)
    lib = store._library("lib-lsh-seeded")
    assert lib["num_projections"] == 4 and lib["random_state"] == 123
    res = store.search("lib-lsh-seeded", [0.9, 0.1, 0.0], k=1).collect()
    assert [r["chunk_id"] for r in res] == ["ch-12"]


def test_lsh_config_frozen_while_chunks_exist(spark):
    store = demo_store(spark)
    with pytest.raises(FrozenFieldError):
        store.update_library("lib-lsh-seeded", {"random_state": 7})
    with pytest.raises(EntityError):
        store.create_library(
            dict(library_id="bad", name="bad", embedding_dimension=3,
                 distance_metric="cosine", index_kind="random_projection",
                 num_projections=0)
        )


def test_create_library_defaults_new_columns_to_null(spark):
    store = demo_store(spark)
    s2 = store.create_library(
        dict(library_id="lib-new", name="new", embedding_dimension=3,
             distance_metric="cosine", index_kind="flat")
    )
    row = s2._library("lib-new")
    assert row["num_projections"] is None and row["random_state"] is None


# -- reference disk layout (disk_store.py:37-43,100-116) -------------------

def test_reference_layout_roundtrip_and_sidecars(spark, sf_dir):
    base = _store_restricted(store_from_driver_tables(spark, sf_dir), "src0")
    data_dir = write_reference_layout(base, scratch_dir("ref-layout-test-"))

    # tree shape: one JSON per entity + index sidecars per library
    n_docs = base.documents.count()
    n_chunks = base.chunks.count()
    assert len(os.listdir(os.path.join(data_dir, "documents"))) == n_docs
    assert len(os.listdir(os.path.join(data_dir, "chunks"))) == n_chunks
    assert sorted(os.listdir(os.path.join(data_dir, "indexes"))) == [
        "src0.json", "src0.npy"
    ]

    loaded = load_reference_layout(spark, data_dir)
    assert loaded.documents.count() == n_docs
    assert loaded.chunks.count() == n_chunks

    # search after reload == search before (test_disk_persistence.py:240-271)
    q = [float(x) for x in
         base.chunks.orderBy("chunk_id").first()["embedding"]]
    before = [(r["chunk_id"], r["distance"])
              for r in base.search("src0", q, k=3).collect()]
    after = [(r["chunk_id"], r["distance"])
             for r in loaded.search("src0", q, k=3).collect()]
    assert before == after

    assert validate_index_sidecars(data_dir, loaded) == {"src0": True}

    # .npy carries the embeddings in vector_id order, float32 like the
    # reference (indexes.py:139-141)
    arr = np.load(os.path.join(data_dir, "indexes", "src0.npy"))
    assert arr.dtype == np.float32 and arr.shape[0] == n_chunks


def test_scratch_dirs_registered_for_cleanup():
    from vector_db_from_scratch_spark.sources import artifacts

    d = scratch_dir("probe-")
    assert d in artifacts._SCRATCH_DIRS and os.path.isdir(d)


# -- distributed range report (no global single-task window) ---------------

def test_range_report_matches_ntile_semantics(spark, sf_dir):
    from pyspark.sql import Window, functions as F

    from vector_db_from_scratch_spark.operators.maintenance import (
        range_partition_report,
    )
    from vector_db_from_scratch_spark.sources.tables import load_table

    got = {r["range_id"]: (r["n_rows"], r["lo"], r["hi"])
           for r in range_partition_report(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        r["range_id"]: (r["n_rows"], r["lo"], r["hi"])
        for r in (
            orders.withColumn("range_id", F.ntile(8).over(w).cast("long"))
            .groupBy("range_id")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi"))
            .collect()
        )
    }
    assert got == want


# -- Arrow fast-path twins for the text expression queries -----------------

def test_language_id_trigram_fast_equals_expression(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.textops import language_id_trigram

    fast = {tuple(r) for r in language_id_trigram(spark, sf_dir, fast=True).collect()}
    expr = {tuple(r) for r in language_id_trigram(spark, sf_dir, fast=False).collect()}
    assert fast == expr


def test_fingerprints_fast_equals_expression(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.textops import fingerprints

    fast = {tuple(r) for r in fingerprints(spark, sf_dir, fast=True).collect()}
    expr = {tuple(r) for r in fingerprints(spark, sf_dir, fast=False).collect()}
    assert fast == expr


def test_char_entropy_fast_equals_expression(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.textops import char_entropy

    fast = {tuple(r) for r in char_entropy(spark, sf_dir, fast=True).collect()}
    expr = {tuple(r) for r in char_entropy(spark, sf_dir, fast=False).collect()}
    assert fast == expr


# -- persisted trained-IVF artifact ----------------------------------------

def test_ivf_trained_persisted_equals_in_process(spark, sf_dir):
    from vector_db_from_scratch_spark.operators import ivf

    a = [tuple(r) for r in ivf.ivf_knn_trained(spark, sf_dir).collect()]
    b = [tuple(r) for r in ivf.ivf_trained_persisted_knn(spark, sf_dir).collect()]
    assert a == b and len(a) == 10

    root = ivf.trained_artifact_path(sf_dir, ivf.NUM_CELLS, 2)
    assert os.path.exists(os.path.join(root, "centroids", "_SUCCESS"))
    assert os.path.exists(os.path.join(root, "index", "_SUCCESS"))
    # artifact round trip preserves the trained centroids exactly (float32)
    reloaded = ivf._load_persisted_centroids(spark, sf_dir, ivf.NUM_CELLS, 2)
    assert reloaded == ivf.train_centroids(spark, sf_dir, ivf.NUM_CELLS, 2)


# -- real codec layer (PGM / WAV / y4m) ------------------------------------

def test_codec_roundtrip_all_kinds():
    from vector_db_from_scratch_spark.operators.multimodal import (
        decode_media,
        encode_media,
    )

    data = bytes(range(7)) + b"hello world"
    for kind in ("image", "audio", "video"):
        payload = encode_media(data, kind)
        assert payload != data  # a real container, not a passthrough
        out = decode_media(payload, kind)
        assert bytes(out) == data


def test_codec_rejects_malformed_payloads():
    from vector_db_from_scratch_spark.operators.multimodal import decode_media

    with pytest.raises(ValueError):
        decode_media(b"P6\n3 1\n255\nabc", "image")  # P6 is not P5
    with pytest.raises(ValueError):
        decode_media(b"RIFFxxxxJUNK", "audio")
    with pytest.raises(ValueError):
        decode_media(b"YUV4MPEG2 F25:1\nFRAME\n", "video")  # missing W/H
    with pytest.raises(ValueError):
        decode_media(b"P5\n10 1\n255\nshort", "image")  # truncated raster


def test_wav_header_is_canonical():
    import struct

    from vector_db_from_scratch_spark.operators.multimodal import encode_media

    p = encode_media(b"abcd", "audio")
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    assert struct.unpack("<I", p[4:8])[0] == 36 + 4  # RIFF size
    assert struct.unpack("<I", p[40:44])[0] == 4  # data size
    assert len(p) == 48


def test_pq_persisted_equals_in_process(spark, sf_dir):
    from vector_db_from_scratch_spark.operators import pq

    a = [tuple(r) for r in pq.pq_knn(spark, sf_dir).collect()]
    b = [tuple(r) for r in pq.pq_persisted_knn(spark, sf_dir).collect()]
    assert a == b and len(a) == 10

    root = pq.pq_artifact_path(sf_dir, pq.M_SUBSPACES, pq.KS_CODES, pq.LLOYD_ITERS)
    assert os.path.exists(os.path.join(root, "codebooks", "_SUCCESS"))
    assert os.path.exists(os.path.join(root, "codes", "_SUCCESS"))
    reloaded = pq._load_persisted_codebooks(
        spark, sf_dir, pq.M_SUBSPACES, pq.KS_CODES, pq.LLOYD_ITERS
    )
    assert (reloaded == pq.train_codebooks(spark, sf_dir)).all()


def test_asof_tie_semantics(spark, tmp_path):
    """As-of tie discipline, pinned on a constructed frame: a click at the
    SAME ts as the purchase matches (<= semantics) regardless of event_id
    order, among ties the max click event_id wins, and a purchase with no
    prior click gets NULLs."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vector_db_from_scratch_spark.operators.analytics import asof_last_click

    base = dt.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        # user 1: two clicks tied at t0 (ids 5 and 7), purchase id 6 at t0:
        # click-before-purchase at equal ts => both match; max id 7 wins
        (5, base, 1, "click"),
        (7, base, 1, "click"),
        (6, base, 1, "purchase"),
        # user 2: purchase before any click -> NULL
        (8, base, 2, "purchase"),
        (9, base + dt.timedelta(minutes=1), 2, "click"),
        # user 3: later click must not leak backward; nearest prior wins
        (10, base, 3, "click"),
        (11, base + dt.timedelta(minutes=5), 3, "purchase"),
        (12, base + dt.timedelta(minutes=9), 3, "click"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {
        r["purchase_id"]: r["last_click_id"]
        for r in asof_last_click(spark, str(tmp_path)).collect()
    }
    assert got == {6: 7, 8: None, 11: 10}
