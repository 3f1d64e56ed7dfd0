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

    left = points.select(
        F.col(id_col).alias("_ida"),
        F.col(lat_col).alias("_lata"),
        F.col(lon_col).alias("_lona"),
    )
    right = points.select(
        F.col(id_col).alias("_idb"),
        F.col(lat_col).alias("_latb"),
        F.col(lon_col).alias("_lonb"),
    )
    pairs = radius_join(
        left, right, eps_km,
        lat_cols=("_lata", "_latb"), lon_cols=("_lona", "_lonb"),
        max_abs_lat=max_abs_lat,
    ).where(F.col("_ida") != F.col("_idb")).select("_ida", "_idb")
    pairs = pairs.persist()

    deg = pairs.groupBy(F.col("_ida").alias("_id")).agg(
        F.count("*").alias("n_nbrs")
    )
    flags = (
        points.select(F.col(id_col).alias("_id"))
        .join(deg, "_id", "left")
        .select(
            "_id",
            F.coalesce("n_nbrs", F.lit(0)).alias("n_nbrs"),
            (F.coalesce("n_nbrs", F.lit(0)) + 1 >= min_pts).alias(
                "is_core"
            ),
        )
        .persist()
    )
    cores = flags.where("is_core").select("_id")
    core_edges = (
        pairs.join(cores.withColumnRenamed("_id", "_ida"), "_ida")
        .join(cores.withColumnRenamed("_id", "_idb"), "_idb")
        .where(F.col("_ida") < F.col("_idb"))
        .select(F.col("_ida").alias("src"), F.col("_idb").alias("dst"))
    )
    cc = connected_components_star(
        cores.select(F.col("_id").alias("node")), core_edges
    ).select(F.col("node").alias("_id"), F.col("cluster_id"))

    border = (
        pairs.join(
            cc.withColumnRenamed("_id", "_idb"), "_idb"
        )  # neighbor is a core with a cluster
        .groupBy(F.col("_ida").alias("_id"))
        .agg(F.min("cluster_id").alias("_border_cl"))
    )
    return (
        flags.join(cc, "_id", "left")
        .join(border, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_nbrs",
            "is_core",
            F.when(F.col("is_core"), F.col("cluster_id"))
            .otherwise(F.col("_border_cl"))
            .alias("cluster"),
        )
    )
