"""Tiling operators (SURVEY.md F24, A6, W4, W7, K3).

The reference shells out to tippecanoe
(/root/reference/scripts/build_pmtiles.py:186-198); here tile
assignment is pure Catalyst math (expressions.tile_x/tile_y), the
density drop is a deterministic per-tile top-k, and the tile table is
an ordinary DataFrame ready for any sink. Distribution: one shuffle
on (z, x, y) — exactly the partitioning a tile server wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from overmatch_spark import expressions as X


def assign_match_ids(matches: DataFrame) -> DataFrame:
    """W7: stable sequential feature ids (the reference uses JSONL
    line numbers — enrich_matches_with_dynamodb.py:294,315). Stable
    key = (osm_id, overture_id); row_number over a global sort, NOT
    monotonically_increasing_id (which is partition-layout dependent
    and would break exact tile-assignment equality across runs)."""
    w = Window.orderBy("osm_id", "overture_id")
    return matches.withColumn("match_id", F.row_number().over(w).cast("long"))


def assign_tiles(matches: DataFrame, zooms=(10, 12, 14)) -> DataFrame:
    """F24: one row per (feature, zoom) with slippy z/x/y."""
    per_zoom = [
        matches.select(
            "match_id",
            F.lit(z).alias("z"),
            X.tile_x(F.col("lon"), z).alias("x"),
            X.tile_y(F.col("lat"), z).alias("y"),
        )
        for z in zooms
    ]
    out = per_zoom[0]
    for df in per_zoom[1:]:
        out = out.unionByName(df)
    return out


def density_drop(tiles: DataFrame, max_per_tile: int) -> DataFrame:
    """A6: tippecanoe --drop-densest-as-needed, made deterministic and
    reproducible: per (z,x,y) keep the top-k by a stable hash rank
    (md5-derived, engine-portable so oracles can replay it), mark the
    rest kept=false."""
    from overmatch_spark.operators.dedup import h60

    w = Window.partitionBy("z", "x", "y").orderBy(
        h60(F.col("match_id").cast("string")).asc(), F.col("match_id").asc()
    )
    return tiles.withColumn(
        "kept", F.row_number().over(w) <= F.lit(max_per_tile)
    )


def auto_max_zoom(matches: DataFrame, counts=(1000, 100_000, 10_000_000)) -> int:
    """W4: tippecanoe -zg picks max zoom from density; we fix it
    deterministically from feature count thresholds."""
    n = matches.count()
    z = 10
    for threshold in counts:
        if n > threshold:
            z += 2
    return z


def tile_table(tiles_kept: DataFrame, features: DataFrame) -> DataFrame:
    """K3: the tile pyramid as a table — groupBy (z,x,y) collecting
    feature structs, ordered deterministically within each tile."""
    joined = tiles_kept.filter(F.col("kept")).join(features, "match_id")
    return joined.groupBy("z", "x", "y").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("match_id"),
                    F.col("osm_id"),
                    F.col("overture_id"),
                    F.col("lon"),
                    F.col("lat"),
                )
            )
        ).alias("features"),
        F.count("*").cast("long").alias("n_features"),
    )
