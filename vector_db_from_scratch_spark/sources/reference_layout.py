"""Migration reader/writer for the reference's on-disk layout.

The reference persists one JSON file per entity under
``libraries/ documents/ chunks/`` plus a per-library index artifact
``indexes/<library_id>.json`` (metadata: dimension + vector_ids) and
``indexes/<library_id>.npy`` (the stacked vector array) --
``vector_db/disk_store.py:37-43,100-116`` and ``vector_db/indexes.py:125-162``.
This module lets a user of the reference point the Spark engine at that
exact directory tree:

* :func:`load_reference_layout` -- read the tree into an
  :class:`~..operators.entity.EntityStore`. Spark's JSON source reads the
  per-entity files as a directory listing (``multiLine`` mode, one object
  per file), so ingestion parallelizes across files; an explicit schema
  avoids an inference pass. Reference-only fields (created_at/updated_at,
  maintained counts) are dropped -- counts are derived relationally
  (``library_counts``), timestamps are out of the engine's data model.
* :func:`write_reference_layout` -- produce the same tree from an
  EntityStore, entity files written distributively (``foreachPartition``:
  each executor partition writes its own files, no driver funnel). The
  ``.npy`` index sidecar is inherently ONE dense array per library
  (``np.stack`` in indexes.py:139-141), so it is a driver-side bounded
  artifact exactly like the reference writes it -- a migration fixture
  format, not the engine's scale path (that is the bucket-partitioned
  parquet index, operators/lsh.py:save_index).
* :func:`validate_index_sidecars` -- check each ``indexes/<lib>`` pair is
  consistent with the chunk table (dimension, vector count, id set).

The file-per-row shape is the reference's anti-pattern, kept verbatim on
the WRITE side only for round-trip fidelity; after migration the engine
persists tables (save_store) and bucket-partitioned indexes.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed timestamp for written fixtures: the reference stamps entities with
# wall-clock UTC (entities.py:17-24); a constant keeps fixtures byte-stable.
_EPOCH = "1970-01-01T00:00:00+00:00"

_LIB_JSON_SCHEMA = (
    "id string, name string, description string, "
    "metadata map<string,string>, embedding_dimension int, "
    "distance_metric string, index_kind string, "
    "num_projections int, random_state int"
)
_DOC_JSON_SCHEMA = "id string, library_id string, name string, metadata map<string,string>"
_CHUNK_JSON_SCHEMA = (
    "id string, document_id string, text string, embedding array<float>, "
    "metadata map<string,string>, chunk_index int"
)


def _write_partition_files(dir_path: str, rows, extra: dict) -> None:
    os.makedirs(dir_path, exist_ok=True)
    for row in rows:
        d = row.asDict(recursive=True)
        d.update(extra)
        with open(os.path.join(dir_path, f"{d['id']}.json"), "w") as f:
            json.dump(d, f, indent=2)


def write_reference_layout(store, data_dir: str) -> str:
    """Materialize ``store`` as the reference's directory tree; returns
    ``data_dir``. Entity JSON is written per-partition on executors;
    the per-library ``.npy`` sidecar is assembled driver-side (the
    reference's own single-array format, bounded per library)."""
    import numpy as np

    for sub in ("libraries", "documents", "chunks", "indexes"):
        os.makedirs(os.path.join(data_dir, sub), exist_ok=True)

    stamps = {"created_at": _EPOCH, "updated_at": _EPOCH}

    libs = store.libraries.select(
        F.col("library_id").alias("id"), "name", "description", "metadata",
        "embedding_dimension", "distance_metric", "index_kind",
        "num_projections", "random_state",
    )
    docs = store.documents.select(
        F.col("document_id").alias("id"), "library_id", "name", "metadata"
    )
    chunks = store.chunks.select(
        F.col("chunk_id").alias("id"), "document_id", "text", "embedding",
        "metadata", "chunk_index",
    )
    for df, sub in ((libs, "libraries"), (docs, "documents"), (chunks, "chunks")):
        target = os.path.join(data_dir, sub)
        df.foreachPartition(lambda rows, t=target: _write_partition_files(t, rows, stamps))

    # indexes/<library_id>.{json,npy} in FlatIndex.save's format
    # (indexes.py:125-141): vector_ids listing + stacked float32 array.
    chunk_lib = store.chunks.join(
        store.documents.select("document_id", "library_id"), "document_id"
    ).select("library_id", F.col("chunk_id"), "embedding")
    for lib in store.libraries.select("library_id", "embedding_dimension").collect():
        rows = (
            chunk_lib.filter(F.col("library_id") == lib["library_id"])
            .orderBy("chunk_id")
            .collect()
        )
        meta = {
            "dimension": lib["embedding_dimension"],
            "vector_ids": [r["chunk_id"] for r in rows],
        }
        base = os.path.join(data_dir, "indexes", str(lib["library_id"]))
        with open(base + ".json", "w") as f:
            json.dump(meta, f)
        if rows:
            np.save(
                base + ".npy",
                np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in rows]),
            )
    return data_dir


def _read_entity_dir(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .json(os.path.join(path, "*.json"))
    )


def load_reference_layout(spark: SparkSession, data_dir: str):
    """EntityStore over a reference-layout tree (S4 completed for real
    reference data: JSON-per-entity in, DataFrame algebra out)."""
    from ..operators.entity import EntityStore

    libs = _read_entity_dir(
        spark, os.path.join(data_dir, "libraries"), _LIB_JSON_SCHEMA
    ).select(
        F.col("id").alias("library_id"), "name", "description", "metadata",
        "embedding_dimension", "distance_metric", "index_kind",
        "num_projections", "random_state",
    )
    docs = _read_entity_dir(
        spark, os.path.join(data_dir, "documents"), _DOC_JSON_SCHEMA
    ).select(F.col("id").alias("document_id"), "library_id", "name", "metadata")
    chunks = _read_entity_dir(
        spark, os.path.join(data_dir, "chunks"), _CHUNK_JSON_SCHEMA
    ).select(
        F.col("id").alias("chunk_id"), "document_id", "text", "embedding",
        "metadata", "chunk_index",
    )
    return EntityStore(libraries=libs, documents=docs, chunks=chunks)


def validate_index_sidecars(data_dir: str, store) -> dict[str, bool]:
    """Per-library consistency of ``indexes/*`` vs the chunk table:
    dimension matches, array row count == len(vector_ids) == chunk count,
    and the id sets agree. Driver-side reads of bounded sidecar metadata."""
    import numpy as np

    chunk_lib = store.chunks.join(
        store.documents.select("document_id", "library_id"), "document_id"
    ).select("library_id", "chunk_id")
    out: dict[str, bool] = {}
    for meta_path in sorted(glob.glob(os.path.join(data_dir, "indexes", "*.json"))):
        lib_id = os.path.splitext(os.path.basename(meta_path))[0]
        with open(meta_path) as f:
            meta = json.load(f)
        ids = set(meta["vector_ids"])
        table_ids = {
            r["chunk_id"]
            for r in chunk_lib.filter(F.col("library_id") == lib_id).collect()
        }
        ok = ids == table_ids
        npy_path = meta_path[: -len(".json")] + ".npy"
        if ids:
            arr = np.load(npy_path)
            ok = ok and arr.shape == (len(ids), meta["dimension"])
        else:
            ok = ok and not os.path.exists(npy_path)
        out[lib_id] = ok
    return out
