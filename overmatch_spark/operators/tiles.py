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


def assign_match_ids(matches: DataFrame,
                     num_partitions: int | None = None) -> DataFrame:
    """W7: stable sequential feature ids (the reference uses JSONL
    line numbers — enrich_matches_with_dynamodb.py:294,315). Stable
    key = (osm_id, overture_id).

    Width-proportional two-phase plan (NOT a global-sort Window, which
    funnels every row through ONE task): range-partition on the key,
    sort within partitions, then add per-partition offsets computed
    from a tiny per-partition count pass (the zipWithIndex pattern).
    The local index comes from monotonically_increasing_id's low 33
    bits — safe HERE because the layout is pinned: the partitioning is
    range-based on the (unique) key, rows are sorted within each
    partition, and the DataFrame is persisted (MEMORY_AND_DISK — an
    evicted block spills, it is not recomputed) so the offset pass and
    the id pass read the same physical partitions. On EXECUTOR LOSS a
    lost block does recompute; a production job that must survive that
    mid-flight replaces the persist with a reliable checkpoint of the
    range-partitioned table. Output ids are identical to row_number()
    over a global (osm_id, overture_id) sort (property-tested)."""
    keys = ["osm_id", "overture_id"]
    n = num_partitions or matches.sparkSession.sparkContext.defaultParallelism
    part = (
        matches.repartitionByRange(n, *keys)
        .sortWithinPartitions(*keys)
        .persist()
    )
    with_mid = (
        part.withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned(F.col("_mid"), 33))
        .withColumn("_local", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)))
        .drop("_mid")
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in with_mid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    if not counts:  # empty input: no rows to id
        out = with_mid.withColumn(
            "match_id", F.lit(None).cast("long")
        ).drop("_pid", "_local").localCheckpoint()
        part.unpersist()
        return out
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(int(p)).cast("long") for p, _ in counts]),
            F.array(*[F.lit(int(offsets[p])).cast("long") for p, _ in counts]),
        ),
        F.col("_pid"),
    )
    out = (
        with_mid.withColumn(
            "match_id", (off + F.col("_local") + F.lit(1)).cast("long")
        )
        .drop("_pid", "_local")
        # freeze the ids NOW (truncated lineage) so the pinned layout
        # cache can be released instead of leaking for the session
        .localCheckpoint()
    )
    part.unpersist()
    return out


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
