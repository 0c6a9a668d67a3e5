"""Count-min sketch (operators/sketches.py) vs an independent
pure-Python reference using the same md5 position spec."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import sketches
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL

DEPTH, WIDTH = 4, 1024


def _pos(key: str, i: int) -> int:
    return int(hashlib.md5(f"cms{i}:{key}".encode()).hexdigest()[:15], 16) % WIDTH


def _ref_cms(values: list[str]):
    cells = [[0] * WIDTH for _ in range(DEPTH)]
    for v in values:
        for i in range(DEPTH):
            cells[i][_pos(v, i)] += 1
    return cells


def test_cms_matches_reference_and_is_one_sided(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_partkey")
    values = [str(r.l_partkey) for r in li.collect()]
    ref = _ref_cms(values)
    cells = {
        (r.row_idx, r.col_idx): r.c
        for r in sketches.countmin_cells(li, "l_partkey").collect()
    }
    for (i, j), c in cells.items():
        assert ref[i][j] == c, (i, j)
    assert sum(cells.values()) == DEPTH * len(values)  # every row counted

    from collections import Counter

    truth = Counter(values)
    keys = li.distinct()
    est = {
        str(r.l_partkey): r.cms_est
        for r in sketches.countmin_estimate(
            sketches.countmin_cells(li, "l_partkey"), keys, "l_partkey"
        ).collect()
    }
    for k, t in truth.items():
        assert est[k] >= t, k  # CMS never undercounts
        assert est[k] == min(ref[i][_pos(k, i)] for i in range(DEPTH)), k


def test_cms_absent_key_and_determinism(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_partkey")
    cells = sketches.countmin_cells(li, "l_partkey")
    ghost = spark.createDataFrame([(10**15,)], "l_partkey long")
    (row,) = sketches.countmin_estimate(cells, ghost, "l_partkey").collect()
    assert row.cms_est >= 0  # collision noise only; never negative
    a = sorted(map(tuple, sketches.countmin_cells(li, "l_partkey").collect()))
    b = sorted(
        map(tuple, sketches.countmin_cells(li.repartition(7), "l_partkey").collect())
    )
    assert a == b
