"""Density-based clustering (DBSCAN, Ester et al. KDD'96) over 2-D
points — cluster discovery WITHOUT choosing k, the geo/layout-space
complement to the k-means/SemDeDup centroid family.

The distributed decomposition is three primitives this codebase
already ships, composed:

1. eps-neighborhood pairs from the grid-bucketed exact radius join
   (operators/geo.radius_join — 3x3 neighbor-cell equi-join + exact
   haversine refilter; NEVER an all-pairs cross join);
2. core points by one degree aggregate (|N_eps(p)| >= min_pts,
   point itself included, per the paper);
3. clusters = connected components over CORE-CORE edges
   (dedup.connected_components_star, O(log diameter) rounds), then
   border points attach to their minimum-labeled adjacent core
   cluster; everything else is noise.

Labels are deterministic end to end: cluster id = the component's
minimum point id; border ties break to the smallest cluster label.

Scale shape: one radius join (grid-pruned), two aggregates, the
star-CC rounds (lineage-cut), one broadcast-free attach join. Skewed
dense cells are the radius join's documented hot-cell case (salt the
cell key); everything else is data-proportional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan_2d(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    eps_km: float,
    min_pts: int,
    max_abs_lat: float = 70.0,
) -> DataFrame:
    """Full DBSCAN over ``(id, lat, lon)`` points. Returns one row per
    point: ``(id, n_nbrs, is_core, cluster)`` — ``n_nbrs`` the
    eps-neighbor count EXCLUDING the point, ``cluster`` the component
    min-id for cores, the min adjacent core cluster for borders, and
    NULL for noise. ``radius_join`` preconditions apply
    (|lat| <= max_abs_lat, eps < 110 km)."""
    from cccatalog_spark.operators.dedup import (
        connected_components_star,
    )
    from cccatalog_spark.operators.geo import radius_join

    # --- duplicate-position pre-aggregate (guide §2.3 "aggregate
    # before you shuffle"). Co-located points are mutual eps-neighbors
    # (d = 0 ≤ eps), so every point at one position has the SAME
    # neighbor multiset, degree, core flag and cluster: the radius
    # join, degree aggregate, star-CC rounds and border attach all run
    # at POSITION grain (multiplicity ``_m`` carried as a weight), and
    # points re-attach by one position equi-join at the end. With k
    # points per distinct position the pair volume drops k² — the
    # radius join was the operator's dominant cost. Null-coordinate
    # points never join anything in the original form (NULL distance),
    # so they stay SINGLETON positions keyed by their own id rather
    # than collapsing.
    pid, plat, plon = "_pmin", "_plat", "_plon"
    lat_c, lon_c = F.col(lat_col), F.col(lon_col)
    nn = points.where(lat_c.isNotNull() & lon_c.isNotNull())
    nulls = points.where(lat_c.isNull() | lon_c.isNull())
    pos = (
        nn.groupBy(
            lat_c.alias(plat), lon_c.alias(plon)
        )
        .agg(
            F.min(id_col).alias(pid),
            F.count("*").alias("_m"),
        )
        .unionByName(
            nulls.select(
                lat_c.alias(plat),
                lon_c.alias(plon),
                F.col(id_col).alias(pid),
                F.lit(1).cast("long").alias("_m"),
            )
        )
        .persist()
    )

    left = pos.select(
        F.col(pid).alias("_ida"),
        F.col(plat).alias("_lata"),
        F.col(plon).alias("_lona"),
    )
    right = pos.select(
        F.col(pid).alias("_idb"),
        F.col(plat).alias("_latb"),
        F.col(plon).alias("_lonb"),
        F.col("_m").alias("_mb"),
    )
    # keep the (p, p) self-pair: a position's own multiplicity feeds
    # its points' neighbor counts (each point's co-located twins)
    pairs = radius_join(
        left, right, eps_km,
        lat_cols=("_lata", "_latb"), lon_cols=("_lona", "_lonb"),
        max_abs_lat=max_abs_lat,
    ).select("_ida", "_idb", "_mb")
    pairs = pairs.persist()

    # per-point degree at position grain: all points within eps of p
    # (own position included) minus the point itself
    deg = pairs.groupBy(F.col("_ida").alias(pid)).agg(
        (F.sum("_mb") - F.lit(1)).cast("long").alias("n_nbrs")
    )
    posflags = (
        pos.join(deg, pid, "left")
        .select(
            pid,
            plat,
            plon,
            F.coalesce("n_nbrs", F.lit(0)).alias("n_nbrs"),
            (F.coalesce("n_nbrs", F.lit(0)) + 1 >= min_pts).alias(
                "is_core"
            ),
        )
        .persist()
    )
    cores = posflags.where("is_core").select(pid)
    core_edges = (
        pairs.join(cores.withColumnRenamed(pid, "_ida"), "_ida")
        .join(cores.withColumnRenamed(pid, "_idb"), "_idb")
        .where(F.col("_ida") < F.col("_idb"))
        .select(F.col("_ida").alias("src"), F.col("_idb").alias("dst"))
    )
    # position node ids are min point ids, so the component's min node
    # id IS the component's min (core) point id — the same label the
    # point-grain CC produced
    cc = connected_components_star(
        cores.select(F.col(pid).alias("node")), core_edges
    ).select(F.col("node").alias(pid), F.col("cluster_id"))

    border = (
        pairs.join(
            cc.withColumnRenamed(pid, "_idb"), "_idb"
        )  # neighbor position is core with a cluster
        .groupBy(F.col("_ida").alias(pid))
        .agg(F.min("cluster_id").alias("_border_cl"))
    )
    posout = (
        posflags.join(cc, pid, "left")
        .join(border, pid, "left")
        .select(
            plat,
            plon,
            pid,
            "n_nbrs",
            "is_core",
            F.when(F.col("is_core"), F.col("cluster_id"))
            .otherwise(F.col("_border_cl"))
            .alias("cluster"),
        )
    )
    # re-attach points to their position's result (nulls by own id —
    # they are their own singleton positions)
    out_nn = nn.select(F.col(id_col), lat_c.alias(plat), lon_c.alias(plon)).join(
        posout.where(
            F.col(plat).isNotNull() & F.col(plon).isNotNull()
        ),
        [plat, plon],
    )
    out_nul = nulls.select(F.col(id_col)).join(
        posout.where(
            F.col(plat).isNull() | F.col(plon).isNull()
        ).withColumnRenamed(pid, id_col),
        id_col,
    )
    return out_nn.select(
        id_col, "n_nbrs", "is_core", "cluster"
    ).unionByName(out_nul.select(id_col, "n_nbrs", "is_core", "cluster"))
