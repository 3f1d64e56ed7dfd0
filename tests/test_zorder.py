"""Z-order layout (operators/zorder.py): interleave algebra against a
Python model, and the data-skipping payoff — z-laid-out partitions
carry tighter per-file (min, max) rectangles than the natural layout."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cccatalog_spark.operators.zorder import z_value, z_value_sql, zorder_layout


def _z_model(a, b, bits=16):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_model(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 3), (255, 255), (65535, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == _z_model(r["a"], r["b"]), (r["a"], r["b"])


def test_z_value_sql_matches_column_form(spark):
    df = spark.createDataFrame([(i, i * 7 % 100) for i in range(50)], "a long, b long")
    viaexpr = df.selectExpr(f"({z_value_sql('a', 'b')}) AS z").collect()
    viacol = df.select(z_value(F.col("a"), F.col("b")).alias("z")).collect()
    assert [r["z"] for r in viaexpr] == [r["z"] for r in viacol]


def test_z_locality_beats_row_order_layout(spark):
    # 64x64 grid in row-major order; 16 partitions. Natural (row-order)
    # layout gives each partition the full b-range; z-order layout
    # confines BOTH dimensions.
    n = 64
    df = spark.createDataFrame(
        [(i // n, i % n) for i in range(n * n)], "a long, b long"
    )

    def max_area(frame):
        stats = (
            frame.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                (F.max("a") - F.min("a") + 1).alias("ra"),
                (F.max("b") - F.min("b") + 1).alias("rb"),
            )
            .collect()
        )
        return max(r["ra"] * r["rb"] for r in stats)

    natural = df.repartitionByRange(16, "a", "b")
    zlaid = zorder_layout(df, "a", "b", 16, bits=6)
    # natural layout: ~4 full-width rows per partition -> area ~4*64
    # z-order: every partition a 16x16-ish rectangle -> area ~256 but
    # strictly smaller spread in b; assert z beats natural
    assert max_area(zlaid) <= max_area(natural)
    # and z cells are genuinely 2-D local: no partition spans the
    # whole b range
    stats = (
        zlaid.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg((F.max("b") - F.min("b") + 1).alias("rb"))
        .collect()
    )
    assert max(r["rb"] for r in stats) < n


def test_z_value_rejects_bad_bits(spark):
    with pytest.raises(ValueError):
        z_value(F.lit(1), F.lit(2), bits=0)
    with pytest.raises(ValueError):
        z_value(F.lit(1), F.lit(2), bits=40)
