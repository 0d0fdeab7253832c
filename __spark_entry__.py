"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2,
run over the driver's TPC-H-ish tables via the demo layer derivations
in overmatch_spark.demo (the same derivation expressed once as
Catalyst expressions and once as DuckDB SQL — see that module's
docstring for the exact-agreement design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _matches_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from overmatch_spark import demo
    from overmatch_spark.operators.conflate import conflate

    a = demo.spark_layer_a(spark, sf_dir)
    b = demo.spark_layer_b(spark, sf_dir)
    m = conflate(a, b)
    return m.select(
        "osm_id",
        "overture_id",
        F.round(F.col("lon"), 9).alias("lon"),
        F.round(F.col("lat"), 9).alias("lat"),
        "distance_m",
        "similarity",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the distributed conflation join (J1-J5) over
    layers derived from /root/testdata/sf0.001."""
    return _matches_df(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_conflate_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J5: the full spatial-similarity join (cell-partitioned)."""
    return _matches_df(spark, sf_dir)


def q_conflate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4: match-distribution summary aggregates."""
    m = _matches_df(spark, sf_dir)
    return m.agg(
        F.count("*").cast("long").alias("n_matches"),
        F.countDistinct("osm_id").cast("long").alias("n_osm"),
        F.countDistinct("overture_id").cast("long").alias("n_overture"),
        F.round(F.avg("distance_m"), 6).alias("avg_dist"),
        F.min("distance_m").alias("min_dist"),
        F.max("distance_m").alias("max_dist"),
        F.round(F.sum("similarity"), 6).alias("sum_sim"),
    )


def q_grouped_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: group-collect matches per osm element."""
    m = _matches_df(spark, sf_dir)
    return m.groupBy("osm_id").agg(
        F.count("*").cast("long").alias("match_count"),
        F.array_join(F.sort_array(F.collect_list("overture_id")), ",").alias(
            "overture_ids"
        ),
    )


def q_knn_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: nearest-neighbor fallback for unmatched named features."""
    from overmatch_spark import demo
    from overmatch_spark.operators.knn import knn_fallback

    a = demo.spark_layer_a(spark, sf_dir)
    b = demo.spark_layer_b(spark, sf_dir)
    m = _matches_df(spark, sf_dir)
    return knn_fallback(a, b, m)


def q_tile_counts_z12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24 + K3 grouping: slippy-tile assignment of match points at
    z=12, with per-tile feature counts."""
    from overmatch_spark import expressions as X

    m = _matches_df(spark, sf_dir)
    return (
        m.select(
            X.tile_x(F.col("lon"), 12).alias("tx"),
            X.tile_y(F.col("lat"), 12).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count("*").cast("long").alias("n"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "conflate_matches": q_conflate_matches,
        "conflate_stats": q_conflate_stats,
        "grouped_matches": q_grouped_matches,
        "knn_fallback": q_knn_fallback,
        "tile_counts_z12": q_tile_counts_z12,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from overmatch_spark import demo
    from overmatch_spark import expressions as X

    layers = demo.sql_layers_cte()
    matches_cte = f"{layers},{demo.SQL_MATCHES}"

    dist_ab = X.sql_planar_distance(
        X.sql_merc_x("u.lon"), X.sql_merc_y("u.lat"),
        X.sql_merc_x("b.lon"), X.sql_merc_y("b.lat"),
    )

    return {
        "conflate_matches": f"""
            {matches_cte}
            SELECT osm_id, overture_id, lon, lat, distance_m, similarity
            FROM matches
        """,
        "conflate_stats": f"""
            {matches_cte}
            SELECT CAST(count(*) AS BIGINT) AS n_matches,
                   CAST(count(DISTINCT osm_id) AS BIGINT) AS n_osm,
                   CAST(count(DISTINCT overture_id) AS BIGINT) AS n_overture,
                   round(avg(distance_m), 6) AS avg_dist,
                   min(distance_m) AS min_dist,
                   max(distance_m) AS max_dist,
                   round(sum(similarity), 6) AS sum_sim
            FROM matches
        """,
        "grouped_matches": f"""
            {matches_cte}
            SELECT osm_id,
                   CAST(count(*) AS BIGINT) AS match_count,
                   string_agg(overture_id, ',' ORDER BY overture_id) AS overture_ids
            FROM matches GROUP BY osm_id
        """,
        "knn_fallback": f"""
            {matches_cte},
            unmatched AS (
              SELECT a.osm_id, a.lon, a.lat FROM layer_a a
              WHERE a.name IS NOT NULL AND a.name != ''
                AND a.osm_id NOT IN (SELECT osm_id FROM matches)
            ),
            cand AS (
              SELECT u.osm_id, b.id AS overture_id, {dist_ab} AS dist,
                     row_number() OVER (
                       PARTITION BY u.osm_id
                       ORDER BY round({dist_ab} * 1000), b.id
                     ) AS rn
              FROM unmatched u CROSS JOIN layer_b b
            )
            SELECT osm_id, overture_id, round(dist * 10) / 10 AS distance_m
            FROM cand WHERE rn = 1
        """,
        "tile_counts_z12": f"""
            {matches_cte}
            SELECT {X.sql_tile_x('lon', 12)} AS tx,
                   {X.sql_tile_y('lat', 12)} AS ty,
                   CAST(count(*) AS BIGINT) AS n
            FROM matches GROUP BY 1, 2
        """,
    }
