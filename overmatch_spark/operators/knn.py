"""kNN fallback (SURVEY.md J8 — north-rule extension).

The reference silently drops OSM rows with zero matches
(/root/reference/scripts/match.py:217,229); the north rule adds a
nearest-neighbor fallback for them. Distributed algorithm:

  coarse-to-fine ring expansion over the hierarchical cell grid.
  At each round k (resolution res0 - k, cell edge doubling each
  round) the remaining probes equi-join candidates in their 3x3 cell
  neighborhood. A 3x3 cover guarantees everything within one cell
  edge is seen, so a found minimum d <= edge(res_k) is PROVABLY the
  global nearest and that probe exits the loop; otherwise the probe
  continues to the coarser round (its candidate set only grows).
  Terminates because edge doubles every round.

Tie-break: (rint(dist*1000), id) — millimeter-rounded distance then
lexicographic id, chosen so single-node oracles (numpy spec, DuckDB)
reproduce it without last-ulp ambiguity.

Per-round work shrinks geometrically (most probes resolve in round
0), so at 10^12 scale this is a handful of small shuffles after the
first — and the first is the same cell-join machinery as J2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from overmatch_spark import expressions as X


def knn_fallback(
    layer_a: DataFrame,
    layer_b: DataFrame,
    matches: DataFrame,
    res0: int = 16,
    min_res: int = 4,
) -> DataFrame:
    """Nearest layer_b feature for every named layer_a row absent from
    `matches`. Returns (osm_id, overture_id, distance_m)."""
    remaining = (
        layer_a.filter(F.col("name").isNotNull() & (F.col("name") != ""))
        .join(matches.select("osm_id").distinct(), "osm_id", "left_anti")
        .select(
            "osm_id",
            X.merc_x(F.col("lon")).alias("ax"),
            X.merc_y(F.col("lat")).alias("ay"),
        )
    )
    b = layer_b.select(
        F.col("id").alias("overture_id"),
        X.merc_x(F.col("lon")).alias("bx"),
        X.merc_y(F.col("lat")).alias("by"),
    )

    results = None
    res = res0
    while res >= min_res:
        edge = X.cell_edge_m(res)
        probe = remaining.withColumn(
            "cell",
            F.explode(
                F.array(
                    *[
                        X.cell_id(
                            X.cell_ix(F.col("ax"), res) + F.lit(dx),
                            X.cell_iy(F.col("ay"), res) + F.lit(dy),
                        )
                        for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1)
                    ]
                )
            ),
        )
        build = b.withColumn("cell", X.cell_of(F.col("bx"), F.col("by"), res))
        cand = probe.join(build, "cell").withColumn(
            "dist",
            X.planar_distance(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
        )
        best = (
            cand.groupBy("osm_id")
            .agg(
                F.min(
                    F.struct(
                        F.rint(F.col("dist") * F.lit(1000.0)).alias("dk"),
                        F.col("overture_id").alias("overture_id"),
                        F.col("dist").alias("dist"),
                    )
                ).alias("best")
            )
            .select(
                "osm_id",
                F.col("best.overture_id").alias("overture_id"),
                F.col("best.dist").alias("dist"),
            )
        )
        # provably-global-nearest exit condition
        done = best.filter(F.col("dist") <= F.lit(edge)).select(
            "osm_id", "overture_id", X.round1(F.col("dist")).alias("distance_m")
        )
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(
            done.select("osm_id"), "osm_id", "left_anti"
        )
        # cheap emptiness probe every few rounds keeps the loop from
        # planning joins over an already-empty probe side
        if res % 3 == 0 and remaining.isEmpty():
            return results
        res -= 1

    # coarsest fallback: all-pairs via a single coarse cell is not
    # guaranteed; finish stragglers with a broadcast cross join (the
    # remaining set is tiny by construction)
    straggler = (
        remaining.crossJoin(F.broadcast(b))
        .withColumn(
            "dist",
            X.planar_distance(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
        )
        .groupBy("osm_id")
        .agg(
            F.min(
                F.struct(
                    F.rint(F.col("dist") * F.lit(1000.0)).alias("dk"),
                    F.col("overture_id").alias("overture_id"),
                    F.col("dist").alias("dist"),
                )
            ).alias("best")
        )
        .select(
            "osm_id",
            F.col("best.overture_id").alias("overture_id"),
            X.round1(F.col("best.dist")).alias("distance_m"),
        )
    )
    return results.unionByName(straggler)
