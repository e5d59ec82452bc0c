"""AST-level source-hygiene guards motivated by two real round-5 defects:
a duplicate top-level `def` in an operator module silently shadowed the
earlier one (Python last-def-wins, commit 17a92ec), and
`reg["cube_orders"]` was assigned twice in registry.py (the first
assignment lost without any error).  These tests pin the CLASS of bug,
not just the instances."""

import ast
import pathlib
from collections import Counter

PKG = pathlib.Path(__file__).resolve().parent.parent / "vector_db_from_scratch_spark"


def _module_files():
    return [p for p in PKG.rglob("*.py") if "__pycache__" not in p.parts]


def test_no_duplicate_top_level_defs():
    offenders = {}
    for path in _module_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        names = Counter(
            node.name
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
        )
        dupes = sorted(n for n, c in names.items() if c > 1)
        if dupes:
            offenders[str(path.relative_to(PKG))] = dupes
    assert not offenders, f"shadowed top-level defs: {offenders}"


def test_scale_block_generator_idempotent(tmp_path, monkeypatch):
    """bench.regenerate_scale_block must rewrite ONLY the marker-delimited
    block (prose outside survives, repeated runs converge) -- this is the
    mechanism that stopped SCALE.md's hand-copied-number drift."""
    import sys

    sys.path.insert(0, str(PKG.parent))
    import bench

    doc = tmp_path / "SCALE.md"
    doc.write_text(
        "prose before\n\n"
        f"{bench.SCALE_BLOCK_BEGIN}\nstale content 6.3x\n{bench.SCALE_BLOCK_END}\n\n"
        "prose after\n"
    )
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    detail = {"sf": 0.1, "scale10x": {"q_plain": [1.0, 2.0], "q_pairs": [1.0, 4.0, 10, 1000]}}
    bench.regenerate_scale_block(detail)
    once = doc.read_text()
    bench.regenerate_scale_block(detail)
    assert doc.read_text() == once, "not idempotent"
    assert "prose before" in once and "prose after" in once
    assert "stale content" not in once
    assert "| q_plain | 1.0 | 2.0 | 2.0x | - |" in once
    assert "pairs 10 -> 1000 (100.0x); sec/pair ratio 0.04" in once


def test_no_duplicate_registry_keys():
    """Every literal `reg["name"] = ...` inside registry.build() must be
    unique — a repeat silently overwrites the earlier entry. The scan is
    scoped to the build() function so an unrelated helper that reassigns
    a local `reg[...]` cannot false-positive."""
    tree = ast.parse((PKG / "registry.py").read_text())
    build = next(
        node for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name == "build"
    )
    keys = Counter()
    for node in ast.walk(build):
        if not isinstance(node, ast.Assign):
            continue
        for tgt in node.targets:
            if (
                isinstance(tgt, ast.Subscript)
                and isinstance(tgt.value, ast.Name)
                and tgt.value.id == "reg"
                and isinstance(tgt.slice, ast.Constant)
                and isinstance(tgt.slice.value, str)
            ):
                keys[tgt.slice.value] += 1
    dupes = sorted(k for k, c in keys.items() if c > 1)
    assert not dupes, f"registry keys assigned more than once: {dupes}"
    assert len(keys) > 150, "registry literal-key scan lost its subject"
