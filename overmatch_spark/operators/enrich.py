"""Enrichment + serving-side operators (SURVEY.md §2.3 J6/J7, §2.4 A1-A3,
§2.5 W1-W3/W6, §2.7 F20-F22).

The reference runs these in three places — the DynamoDB enrichment
script, the FastAPI serving path, and the frontend's
TagComparisonTable — all reduced here to DataFrame combinators over
the match table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from overmatch_spark.expressions import match_quality


def enrich_with_seen(
    matches: DataFrame, osm_seen: DataFrame, overture_seen: DataFrame
) -> DataFrame:
    """J6: two left joins against the seen-state tables; existence ->
    *_marked flag + first/last_seen (non-matches False/None) —
    /root/reference/scripts/enrich_matches_with_dynamodb.py:129-167."""
    o = osm_seen.select(
        F.col("element_id").alias("osm_id"),
        F.col("first_seen").alias("osm_first_seen"),
        F.col("last_seen").alias("osm_last_seen"),
        F.lit(True).alias("_osm_hit"),
    )
    v = overture_seen.select(
        F.col("element_id").alias("overture_id"),
        F.col("first_seen").alias("overture_first_seen"),
        F.col("last_seen").alias("overture_last_seen"),
        F.lit(True).alias("_ov_hit"),
    )
    return (
        matches.join(o, "osm_id", "left")
        .join(v, "overture_id", "left")
        .withColumn("osm_marked", F.coalesce(F.col("_osm_hit"), F.lit(False)))
        .withColumn("overture_marked", F.coalesce(F.col("_ov_hit"), F.lit(False)))
        .drop("_osm_hit", "_ov_hit")
    )


def marked_counts(enriched: DataFrame) -> DataFrame:
    """A3: conditional counters over the enriched matches —
    enrich_matches_with_dynamodb.py:283-357."""
    return enriched.agg(
        F.count("*").cast("long").alias("total"),
        F.sum(F.when(F.col("osm_marked"), 1).otherwise(0))
        .cast("long")
        .alias("osm_marked_count"),
        F.sum(F.when(F.col("overture_marked"), 1).otherwise(0))
        .cast("long")
        .alias("overture_marked_count"),
        F.sum(
            F.when(F.col("osm_marked") & F.col("overture_marked"), 1).otherwise(0)
        )
        .cast("long")
        .alias("both_marked_count"),
    )


def group_matches(matches: DataFrame) -> DataFrame:
    """A1: per-osm_id collected matches + count
    (/root/reference/api/load_matches.py:64-102,204-212)."""
    return matches.groupBy("osm_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("distance_m"), F.col("overture_id"), F.col("similarity")
                )
            )
        ).alias("matches"),
        F.count("*").cast("long").alias("match_count"),
    )


def closest_match(matches: DataFrame) -> DataFrame:
    """W1/W3: rank matches per element closest-first, keep rank 1 —
    front_end/src/components/TagComparisonTable.tsx:84-89,374-377.
    Deterministic tie-break by overture_id."""
    w = Window.partitionBy("osm_id").orderBy(
        F.col("distance_m").asc(), F.col("overture_id").asc()
    )
    return (
        matches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def merge_tags_closest_wins(matches_with_tags: DataFrame) -> DataFrame:
    """W2: per (osm_id, tag key), the value of the NEAREST match that
    carries it — TagComparisonTable.tsx:90-100 iterates farthest ->
    closest so the closest overwrites; expressed as explode + rank-1.
    Input needs columns (osm_id, distance_m, overture_id,
    overture_tags map<string,string>)."""
    exploded = matches_with_tags.select(
        "osm_id", "distance_m", "overture_id",
        F.explode("overture_tags").alias("key", "value"),
    )
    w = Window.partitionBy("osm_id", "key").orderBy(
        F.col("distance_m").asc(), F.col("overture_id").asc()
    )
    winners = exploded.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return winners.groupBy("osm_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("key", "value")))
        ).alias("merged_tags")
    )


def with_quality(matches: DataFrame) -> DataFrame:
    """F20: match-quality score column."""
    return matches.withColumn(
        "quality", match_quality(F.col("similarity"), F.col("distance_m"))
    )


def tag_diff(osm_tags: DataFrame, merged: DataFrame) -> DataFrame:
    """F21/D3/W6: per-key diff classification between an element's OSM
    tags and the merged Overture tags, "different" rows first then key
    order — TagComparisonTable.tsx:103-147. Inputs:
    osm_tags(osm_id, tags map), merged(osm_id, merged_tags map).

    ORDERING CONTRACT: the diff-first order holds WITHIN each osm_id
    (repartition on osm_id + sortWithinPartitions — one shuffle, no
    global sort at scale); the DataFrame has NO total order across
    osm_ids. A presentation sink that needs one globally-sorted file
    should apply .coalesce(1).sortWithinPartitions(...) or an
    orderBy itself — paying that single-reducer cost is the sink's
    decision, not this operator's."""
    joined = osm_tags.join(merged, "osm_id", "full")
    keys = joined.select(
        "osm_id",
        F.explode(
            F.array_union(
                F.map_keys(F.coalesce(F.col("tags"), F.map_from_arrays(F.array(), F.array()))),
                F.map_keys(
                    F.coalesce(
                        F.col("merged_tags"), F.map_from_arrays(F.array(), F.array())
                    )
                ),
            )
        ).alias("key"),
        F.col("tags"),
        F.col("merged_tags"),
    )
    classified = keys.select(
        "osm_id",
        "key",
        F.col("tags")[F.col("key")].alias("osm_value"),
        F.col("merged_tags")[F.col("key")].alias("overture_value"),
    ).withColumn(
        "status",
        F.when(
            F.col("osm_value").isNotNull()
            & F.col("overture_value").isNotNull()
            & (F.col("osm_value") == F.col("overture_value")),
            "same",
        )
        .when(
            F.col("osm_value").isNotNull() & F.col("overture_value").isNotNull(),
            "different",
        )
        .when(F.col("osm_value").isNotNull(), "osm_only")
        .otherwise("overture_only"),
    )
    # W6's ordering contract is PER-ELEMENT presentation order
    # ("different" rows first, then key order) — sort within hash
    # partitions of osm_id rather than forcing a global total sort
    # (which would range-shuffle the whole diff table through a
    # sampled partitioner at 100x scale for no semantic gain).
    return classified.repartition("osm_id").sortWithinPartitions(
        "osm_id", F.desc(F.col("status") == "different"), F.asc("key")
    )


def auto_apply_keys(diff: DataFrame) -> DataFrame:
    """F22: keys auto-applied by the frontend: phone/website/cuisine
    or addr:* — TagComparisonTable.tsx:38-42,153-171."""
    return diff.withColumn(
        "auto_apply",
        F.col("key").isin("phone", "website", "cuisine")
        | F.col("key").startswith("addr:"),
    )


def probe_ids(matches_grouped: DataFrame, ids: DataFrame) -> DataFrame:
    """J7: serving-path point lookup — broadcast the (small) request
    id set against the grouped-match table (api/main.py:321-367)."""
    return matches_grouped.join(F.broadcast(ids), "osm_id", "left_semi")
