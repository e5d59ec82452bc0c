"""Content-keyed artifact identity: the tag must change when the source
file's bytes change even if mtime and size are preserved (cp -p / rsync -t
/ deterministic regeneration), and must change across algorithm versions."""

import os
import sys

sys.path.insert(0, "/root/repo")

from vector_db_from_scratch_spark.sources import artifacts  # noqa: E402


def _write(path, payload: bytes, mtime: float) -> None:
    with open(path, "wb") as fh:
        fh.write(payload)
    os.utime(path, (mtime, mtime))


def test_source_ident_detects_content_change_with_preserved_mtime(tmp_path):
    p = str(tmp_path / "emb.parquet")
    _write(p, b"A" * 4096, 1700000000.0)
    a = artifacts.source_ident(p)
    _write(p, b"A" * 4095 + b"B", 1700000000.0)  # same size, same mtime
    b = artifacts.source_ident(p)
    assert a != b, "footer fingerprint must catch same-size same-mtime rewrites"


def test_source_ident_stable_for_identical_state(tmp_path):
    p = str(tmp_path / "emb.parquet")
    _write(p, b"payload" * 100, 1700000000.0)
    assert artifacts.source_ident(p) == artifacts.source_ident(p)


def test_source_ident_embeds_algo_version(tmp_path):
    p = str(tmp_path / "emb.parquet")
    _write(p, b"x" * 128, 1700000000.0)
    assert artifacts.source_ident(p).endswith(f":{artifacts.ALGO_VERSION}")


def test_is_read_corruption_classifier():
    """Only provable read-path damage may trigger artifact deletion;
    transient executor/JVM failures must never delete a shared artifact."""
    from pyspark.errors import AnalysisException

    from vector_db_from_scratch_spark.sources.artifacts import is_read_corruption

    assert is_read_corruption(
        AnalysisException("[PATH_NOT_FOUND] Path does not exist")
    )
    assert is_read_corruption(
        RuntimeError("java.io.FileNotFoundException: part-0000 deleted")
    )
    assert is_read_corruption(RuntimeError("x is not a Parquet file"))
    assert not is_read_corruption(RuntimeError("ExecutorLostFailure (executor 3)"))
    assert not is_read_corruption(MemoryError("java.lang.OutOfMemoryError"))


def test_discard_corrupt_artifact_rename_aside(tmp_path):
    """Discard must detach via rename (no half-deleted live path) and be a
    no-op when the path is already gone."""
    import os

    from vector_db_from_scratch_spark.sources.artifacts import discard_corrupt_artifact

    d = tmp_path / "artifact"
    d.mkdir()
    (d / "part-0").write_text("x")
    discard_corrupt_artifact(str(d))
    assert not d.exists()
    assert not any(p.name.startswith("artifact.corrupt") for p in tmp_path.iterdir())
    discard_corrupt_artifact(str(d))  # already gone: no raise
