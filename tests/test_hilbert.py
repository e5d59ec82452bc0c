"""Hilbert layout: curve bijectivity + the defining adjacency property
(which Morton lacks), layout directory structure, and box-scan totals."""

import os

from pyspark.sql import functions as F

from vector_db_from_scratch_spark.operators.hilbert import (
    hilbert_box_partitions,
    hilbert_pruned_scan,
    hilbert_xy2d,
    layout_curve_compare,
    orders_hilbert_layout_dir,
)
from vector_db_from_scratch_spark.operators.zorder import (
    BOX_BX,
    BOX_BY,
    ZPART_SHIFT,
    ZSIDE,
    morton2,
)


def test_hilbert_bijective_and_adjacent():
    """Every cell gets a unique id in [0, 64), and consecutive ids are
    ALWAYS grid-adjacent -- the locality property Morton does not have."""
    cells = {(bx, by): hilbert_xy2d(bx, by) for bx in range(ZSIDE) for by in range(ZSIDE)}
    ids = sorted(cells.values())
    assert ids == list(range(ZSIDE * ZSIDE))
    by_id = {d: xy for xy, d in cells.items()}
    for d in range(ZSIDE * ZSIDE - 1):
        (x0, y0), (x1, y1) = by_id[d], by_id[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, by_id[d], by_id[d + 1])
    # Morton, by contrast, jumps: at least one consecutive pair is not
    # adjacent (this is WHY hilbert exists)
    m_by_id = {
        morton2(bx, by): (bx, by) for bx in range(ZSIDE) for by in range(ZSIDE)
    }
    jumps = [
        d
        for d in range(ZSIDE * ZSIDE - 1)
        if abs(m_by_id[d][0] - m_by_id[d + 1][0])
        + abs(m_by_id[d][1] - m_by_id[d + 1][1])
        > 1
    ]
    assert jumps, "morton unexpectedly adjacent everywhere"


def test_hilbert_property_any_grid_size():
    """Bijectivity + adjacency hold for every grid width the formula could
    be deployed at, not just the shipped ZBITS (hypothesis-style sweep --
    the space is tiny so it's exhaustive, no sampling needed)."""
    for bits in (1, 2, 3, 4, 5):
        side = 1 << bits
        cells = {
            (x, y): hilbert_xy2d(x, y, bits)
            for x in range(side)
            for y in range(side)
        }
        assert sorted(cells.values()) == list(range(side * side)), bits
        by_id = {d: xy for xy, d in cells.items()}
        for d in range(side * side - 1):
            (x0, y0), (x1, y1) = by_id[d], by_id[d + 1]
            assert abs(x0 - x1) + abs(y0 - y1) == 1, (bits, d)


def test_layout_directories_match_partition_ids(spark, sf_dir):
    path = orders_hilbert_layout_dir(spark, sf_dir)
    dirs = {
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith("hpart=")
    }
    assert dirs <= set(range(ZSIDE * ZSIDE >> ZPART_SHIFT))
    assert set(hilbert_box_partitions()) <= dirs


def test_box_scan_totals_match_flat_recount(spark, sf_dir):
    """Sum of per-cell n_rows over the pruned scan == the box row count
    recomputed from the flat layout table (no pruning)."""
    got = sum(r["n_rows"] for r in hilbert_pruned_scan(spark, sf_dir).collect())
    path = orders_hilbert_layout_dir(spark, sf_dir)
    flat = (
        spark.read.parquet(path)
        .filter(F.col("bx").between(*BOX_BX) & F.col("by").between(*BOX_BY))
        .count()
    )
    assert got == flat > 0


def test_curve_compare_row_accounting(spark, sf_dir):
    """rows_read >= rows_in_box for both curves (a pruned scan never reads
    less than the box), and rows_in_box agrees across curves."""
    rows = {r["curve"]: r for r in layout_curve_compare(spark, sf_dir).collect()}
    assert set(rows) == {"hilbert", "morton"}
    assert rows["hilbert"]["rows_in_box"] == rows["morton"]["rows_in_box"] > 0
    for r in rows.values():
        assert r["rows_read"] >= r["rows_in_box"]
        assert r["read_amplification"] >= 1.0
