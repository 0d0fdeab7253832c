"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2,
run over the driver's TPC-H-ish tables via the demo layer derivations
in overmatch_spark.demo (the same derivation expressed once as
Catalyst expressions and once as DuckDB SQL — see that module's
docstring for the exact-agreement design).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCRATCH: str | None = None


def _scratch_dir(prefix: str) -> str:
    """Per-call unique dir under ONE process-owned scratch root that
    is removed at interpreter exit — repeated harness runs no longer
    accumulate temp dirs, while lazily-read DataFrames stay valid for
    the whole process lifetime (the dirs back lazy scans, so they
    must not be removed at query-return time)."""
    global _SCRATCH
    if _SCRATCH is None:
        _SCRATCH = tempfile.mkdtemp(prefix="overmatch_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH)


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


def q_tile_bounds_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24 inverse (raster->vector): every match point must fall
    inside the bbox of the tile it was assigned to; emits the tile
    bboxes (rounded) + containment flag per match."""
    from overmatch_spark import expressions as X

    m = _matches_df(spark, sf_dir)
    tx = X.tile_x(F.col("lon"), 12)
    ty = X.tile_y(F.col("lat"), 12)
    m = m.select("osm_id", "lon", "lat", tx.alias("tx"), ty.alias("ty"))
    lon_min, lat_min, lon_max, lat_max = X.tile_bounds(
        F.col("tx"), F.col("ty"), 12
    )
    return m.select(
        "osm_id", "tx", "ty",
        F.round(lon_min, 9).alias("lon_min"),
        F.round(lat_min, 9).alias("lat_min"),
        (
            (F.col("lon") >= lon_min) & (F.col("lon") < lon_max)
            & (F.col("lat") > lat_min) & (F.col("lat") <= lat_max)
        ).alias("contained"),
    )


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


def q_pip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: point-in-polygon boundary filter (ray cast, rectilinear
    demo polygon)."""
    from overmatch_spark import demo
    from overmatch_spark import expressions as X

    a = demo.spark_layer_a(spark, sf_dir)
    x = X.merc_x(F.col("lon"))
    y = X.merc_y(F.col("lat"))
    return a.filter(X.pip(x, y, demo.PIP_POLY)).select("osm_id")


def q_match_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20: frontend match-quality score as a column expression."""
    from overmatch_spark.operators.enrich import with_quality

    m = _matches_df(spark, sf_dir)
    return with_quality(m).select(
        "osm_id", "overture_id", F.round(F.col("quality"), 6).alias("quality")
    )


def q_tag_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F8: website clean/normalize, phone normalize + toll-free
    drop, address parse — over synthesized per-key inputs."""
    from overmatch_spark import demo
    from overmatch_spark.operators import tags

    c = demo.load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    website = (
        F.when(key % 5 == 0,
               F.concat(F.lit("HTTPS://WWW.Example"), key.cast("string"),
                        F.lit(".COM/Menu?utm_source=fb&page="),
                        (key % 7).cast("string")))
        .when(key % 5 == 1,
              F.concat(F.lit("http://Foo"), key.cast("string"),
                       F.lit(".com/Home?ref=abc&id=9&x=1")))
        .when(key % 5 == 2,
              F.concat(F.lit("https://www.doordash.com/store/"),
                       key.cast("string")))
        .when(key % 5 == 3,
              F.concat(F.lit("https://Bar"), (key % 100).cast("string"),
                       F.lit(".COM/a/B?hsa_cam=2&_ga=1")))
        .otherwise(F.lit(None))
    )
    phone = (
        F.when(key % 4 == 0,
               F.concat(F.lit("(202) 555-"), (key % 9000 + 1000).cast("string")))
        .when(key % 4 == 1,
              F.concat(F.lit("+1-800-555-"), (key % 9000 + 1000).cast("string")))
        .when(key % 4 == 2,
              F.concat(F.lit("202.555."), (key % 9000 + 1000).cast("string")))
        .otherwise(F.lit(None))
    )
    addr = (
        F.when(key % 3 == 0,
               F.concat((key % 900 + 100).cast("string"),
                        F.lit(" Main Street Northwest")))
        .when(key % 3 == 1,
              F.concat((key % 99 + 1).cast("string"), F.lit(" Oak Avenue")))
        .otherwise(F.lit(None))
    )
    return c.select(
        key.alias("id"),
        tags.clean_website(website).alias("website_clean"),
        tags.drop_toll_free(tags.normalize_phone(phone)).alias("phone_norm"),
        tags.parse_housenumber(addr).alias("housenumber"),
        tags.parse_street(addr).alias("street"),
    )


def _seen_tables(spark: SparkSession, sf_dir: str):
    from overmatch_spark import demo

    c = demo.load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    osm_seen = c.filter(key % 3 == 0).select(
        F.concat(F.lit("node/"), key.cast("string")).alias("element_id"),
        ((key * 11) % 3000).cast("long").alias("first_seen"),
        ((key * 11) % 3000 + key % 100).cast("long").alias("last_seen"),
    )
    ov_seen = c.filter(key % 5 < 2).select(
        F.concat(F.lit("ov/"), key.cast("string")).alias("element_id"),
        ((key * 17) % 3000).cast("long").alias("first_seen"),
        ((key * 17) % 3000 + key % 90).cast("long").alias("last_seen"),
    )
    return osm_seen, ov_seen


def q_enrich_marked_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 + A3: seen-state enrichment left joins + conditional
    counters."""
    from overmatch_spark.operators.enrich import enrich_with_seen, marked_counts

    m = _matches_df(spark, sf_dir)
    osm_seen, ov_seen = _seen_tables(spark, sf_dir)
    return marked_counts(enrich_with_seen(m, osm_seen, ov_seen))


def q_seen_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5/D2 consolidated r4 (was seen_upsert + seen_replay):
    (a) src='upsert': first_seen-immutable / last_seen-refreshed MERGE
    semantics over in-memory tables (epoch-day integers for
    cross-engine hashing); (b) src='replay': the same semantics
    through the REAL partitioned store — three overlapping batches
    merged sequentially (manifest commits, bucket rewrites, a
    mid-sequence compaction), then the committed state read back.
    The replay equals a single-shot min/max upsert of the union —
    upsert_seen is merge-order-independent, which is exactly what
    makes the replayed store oracle-expressible."""
    from overmatch_spark import demo
    from overmatch_spark.operators.seen import upsert_seen
    from overmatch_spark.operators.seen_store import PartitionedSeenStore

    c = demo.load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    seen, _ = _seen_tables(spark, sf_dir)
    batch = c.filter(key % 2 == 0).select(
        F.concat(F.lit("node/"), key.cast("string")).alias("element_id"),
        ((key * 13) % 3000 + 500).cast("long").alias("seen_at"),
    )
    upserted = upsert_seen(seen, batch).withColumn("src", F.lit("upsert"))

    store = PartitionedSeenStore(
        spark, _scratch_dir("overmatch_seenrep_"), n_buckets=8
    )
    for i in (0, 1, 2):
        b = c.filter((key % 3 == i) | (key % 5 == i)).select(
            F.concat(F.lit("node/"), key.cast("string")).alias("element_id"),
            ((key * (7 + i)) % 3000 + 100 * i).cast("long").alias("seen_at"),
        )
        store.merge_batch(b)
        if i == 1:
            store.compact()  # state must be invariant under compaction
    replayed = store.read().withColumn("src", F.lit("replay"))
    return upserted.unionByName(replayed)


def q_tile_density_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 + F24 + A6: stable match ids -> z14 tiles -> deterministic
    per-tile top-k density drop."""
    from overmatch_spark.operators.tiles import (
        assign_match_ids,
        assign_tiles,
        density_drop,
    )

    m = assign_match_ids(_matches_df(spark, sf_dir))
    t = assign_tiles(m, zooms=(14,))
    return density_drop(t, max_per_tile=3).select("match_id", "z", "x", "y", "kept")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup (hash-groupBy) over a corpus with injected
    full duplicates."""
    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import exact_dedup

    d = demo.load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    corpus = d.unionByName(dup)
    return exact_dedup(corpus, "text", "doc_id").select("doc_id", "content_hash")


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (shingle -> banded minhash ->
    bucket join -> exact-Jaccard verify) over a corpus with injected
    truncated near-duplicates."""
    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import minhash_lsh_pairs

    d = demo.load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    trunc = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.size(words) - 2), " ").alias("text"),
    )
    corpus = d.unionByName(trunc)
    return minhash_lsh_pairs(
        corpus, "text", "doc_id", bands=8, rows_per_band=2,
        jaccard_threshold=0.5,
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures + keep-lowest-id per signature bucket."""
    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import simhash_dedup

    d = demo.load(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_dedup(d, "text", "doc_id")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram Jaccard similarity for adjacent doc pairs."""
    from overmatch_spark import demo

    d = demo.load(spark, sf_dir, "documents").select("doc_id", "text")

    def grams(text):
        n = F.length(text)
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - F.lit(2), F.lit(1))),
                lambda i: text.substr(i, F.lit(3)),
            )
        )

    left = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("id_a"), grams(F.col("text")).alias("ga")
    )
    right = d.select((F.col("doc_id") - 1).alias("id_a"),
                     F.col("doc_id").alias("id_b"),
                     grams(F.col("text")).alias("gb"))
    j = left.join(right, "id_a")
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb"))).cast("double")
    union = (F.size(F.col("ga")) + F.size(F.col("gb"))).cast("double") - inter
    return j.select(
        "id_a", "id_b", F.round(inter / union, 9).alias("jaccard3")
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: hyperplane-LSH buckets + exact cosine
    verify."""
    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import embedding_near_dups

    e = demo.load(spark, sf_dir, "embeddings")
    return embedding_near_dups(
        e, "embedding", "vec_id", num_planes=8, dim=64, cosine_threshold=0.2
    )


def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for probe vectors (vec_id < 5)."""
    from overmatch_spark import demo
    from overmatch_spark.operators.ann import brute_force_topk

    e = demo.load(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    return brute_force_topk(e, probes, "embedding", "vec_id", k=5)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated r4 (was ann_lsh_topk + ann_multiprobe_topk):
    LSH-bucketed approximate top-5 (the scale path), single-bucket
    and multi-probe (probes also search the 2 buckets reached by
    flipping their lowest-|margin| sign bits), variant-labelled."""
    from overmatch_spark import demo
    from overmatch_spark.operators.ann import lsh_topk, multiprobe_topk

    e = demo.load(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    single = lsh_topk(
        e, probes, "embedding", "vec_id", k=5, num_planes=6, dim=64
    ).withColumn("variant", F.lit("lsh"))
    multi = multiprobe_topk(
        e, probes, "embedding", "vec_id", k=5, num_planes=6, dim=64, extra=2
    ).withColumn("variant", F.lit("multiprobe"))
    return single.unionByName(multi)


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated r4 (was text_stats + lang_quality_summary):
    per-document language ID, quality score, token counts and
    fingerprint, plus the per-language aggregate (count, avg quality)
    as window columns on the same rows."""
    from pyspark.sql import Window

    from overmatch_spark import demo
    from overmatch_spark.operators import text_analysis as ta

    d = demo.load(spark, sf_dir, "documents")
    t = F.col("text")
    stats = d.select(
        "doc_id",
        ta.token_count(t).alias("n_tokens"),
        ta.bpe_ish_token_estimate(t).alias("n_tokens_bpe"),
        ta.lang_id(t).alias("pred_lang"),
        ta.quality_score(t).alias("quality"),
        ta.fingerprint(t).alias("fp"),
    )
    w = Window.partitionBy("pred_lang")
    return stats.select(
        "*",
        F.count("*").over(w).cast("long").alias("lang_n"),
        F.round(F.avg("quality").over(w), 6).alias("lang_avg_quality"),
    )


_TAG_CATS = ["restaurant", "bar", "cafe", "bakery"]


def _multi_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from overmatch_spark import demo
    from overmatch_spark.operators.conflate import conflate

    a = demo.spark_layer_a(spark, sf_dir)
    ball = demo.spark_layer_b(spark, sf_dir).unionByName(
        demo.spark_layer_b2(spark, sf_dir)
    )
    m = conflate(a, ball)
    return m.select(
        "osm_id", "overture_id",
        F.round(F.col("lon"), 9).alias("lon"),
        F.round(F.col("lat"), 9).alias("lat"),
        "distance_m", "similarity",
    )


def q_closest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W3 + W2 over genuine multi-match groups (consolidated r4):
    closest-first rank-1 per element, joined with the closest-wins
    tag merge (per tag key, the value of the NEAREST match carrying
    it, emitted as a deterministic k=v string)."""
    from overmatch_spark.operators.enrich import (
        closest_match,
        merge_tags_closest_wins,
    )

    m = _multi_matches(spark, sf_dir)
    key = F.split(F.col("overture_id"), "/").getItem(1).cast("long")
    is2 = F.col("overture_id").startswith("ov2/")
    cat = F.element_at(
        F.array(*[F.lit(c) for c in _TAG_CATS]), (key % 4 + 1).cast("int")
    )
    tags = F.when(
        is2,
        F.map_from_arrays(
            F.array(F.lit("amenity"), F.lit("website")),
            F.array(
                F.lit("second_source"),
                F.concat(F.lit("https://ex"), key.cast("string")),
            ),
        ),
    ).otherwise(
        F.map_from_arrays(
            F.array(F.lit("amenity"), F.lit("ref")),
            F.array(cat, key.cast("string")),
        )
    )
    merged = merge_tags_closest_wins(m.withColumn("overture_tags", tags))
    merged = merged.select(
        "osm_id",
        F.array_join(
            F.transform(
                F.sort_array(F.map_entries(F.col("merged_tags"))),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            ";",
        ).alias("merged"),
    )
    cm = closest_match(m).select("osm_id", "overture_id", "distance_m")
    # left join: elements matched only by the first layer keep their
    # closest-match row with a NULL merged string
    return cm.join(merged, "osm_id", "left")


_OSM_CATS = ["restaurant", "bar", "cafe"]


def q_tag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21/F22/D3/W6: per-key tag diff classification between OSM-side
    tags and the merged (closest-wins) Overture tags + auto-apply
    flag."""
    from overmatch_spark import demo
    from overmatch_spark.operators.enrich import (
        auto_apply_keys,
        merge_tags_closest_wins,
        tag_diff,
    )

    m = _multi_matches(spark, sf_dir)
    key = F.split(F.col("overture_id"), "/").getItem(1).cast("long")
    is2 = F.col("overture_id").startswith("ov2/")
    cat = F.element_at(
        F.array(*[F.lit(c) for c in _TAG_CATS]), (key % 4 + 1).cast("int")
    )
    tags = F.when(
        is2,
        F.map_from_arrays(
            F.array(F.lit("amenity"), F.lit("website")),
            F.array(
                F.lit("second_source"),
                F.concat(F.lit("https://ex"), key.cast("string")),
            ),
        ),
    ).otherwise(
        F.map_from_arrays(
            F.array(F.lit("amenity"), F.lit("ref")),
            F.array(cat, key.cast("string")),
        )
    )
    merged = merge_tags_closest_wins(m.withColumn("overture_tags", tags))

    a = demo.spark_layer_a(spark, sf_dir).filter(
        F.col("name").isNotNull() & (F.col("name") != "")
    )
    akey = F.split(F.col("osm_id"), "/").getItem(1).cast("long")
    osm_tags = a.select(
        "osm_id",
        F.map_from_arrays(
            F.array(F.lit("amenity"), F.lit("phone")),
            F.array(
                F.element_at(
                    F.array(*[F.lit(c) for c in _OSM_CATS]),
                    (akey % 3 + 1).cast("int"),
                ),
                F.lit("+1-202-555-0199"),
            ),
        ).alias("tags"),
    )
    d = auto_apply_keys(tag_diff(osm_tags, merged))
    return d.select("osm_id", "key", "status", "auto_apply")


def q_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/F14/F15 + F9/F10/F11/F12 + F23 at customer grain
    (consolidated r4 so every row fits the driver's 50-query window):
    WKT point parse, OSM id format/parse round-trip, vertex-array
    centroid, names.rules := NULL nested mutate (match.py:269-272),
    update_time repair inside sources[] (match.py:278-284), struct
    flatten (enrich_...py:108-126), symmetric Hausdorff distance, and
    the F12 recursive float->Decimal coercion (load_matches.py:44-61)
    probed through a nested struct<double, array<double>> and emitted
    as the fixed-scale decimal string repr (dec_repr)."""
    from overmatch_spark import demo
    from overmatch_spark import expressions as X
    from overmatch_spark.operators import structs

    c = demo.load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    wkt = F.concat(
        F.lit("POINT("), (key % 360 - 180).cast("string"), F.lit(" "),
        (key % 170 - 85).cast("string"), F.lit(")"),
    )
    wlon, wlat = structs.parse_wkt_point(wkt)
    xs = F.array(
        key.cast("double"), (key + 1).cast("double"), (key + 5).cast("double")
    )
    ys = F.array(
        (key * 2).cast("double"), (key * 2 + 3).cast("double"),
        (key * 2 + 9).cast("double"),
    )
    cx, cy = structs.centroid(xs, ys)
    osm_id = structs.osm_id_format(F.lit("node"), key)
    t, num = structs.osm_id_parse(osm_id)
    names = F.struct(
        demo._vocab_name(key).alias("primary"),
        F.concat(F.lit("rule-"), key.cast("string")).alias("rules"),
    )
    ut = (
        F.when(key % 3 == 0, F.lit("2025-04-01T00:00:00.000"))
        .otherwise(F.lit("2025-04-02T12:30:15.000Z"))
    )
    sources = F.array(
        F.struct(F.lit("datasetA").alias("dataset"), ut.alias("update_time")),
        F.struct(
            F.lit("datasetB").alias("dataset"),
            F.lit("2024-01-05T00:00:00.000").alias("update_time"),
        ),
    )
    hxa = F.array(key.cast("double"), (key + 10).cast("double"),
                  (key + 3).cast("double"))
    hya = F.array((key * 2).cast("double"), (key * 2 + 4).cast("double"),
                  (key * 2 + 11).cast("double"))
    hxb = F.array((key + 1).cast("double"), (key + 7).cast("double"))
    hyb = F.array((key * 2 + 2).cast("double"), (key * 2 + 5).cast("double"))
    df = c.select(
        key.alias("id"), wlon.alias("wlon"), wlat.alias("wlat"),
        cx.alias("cx"), cy.alias("cy"),
        t.alias("osm_type"), num.alias("osm_num"),
        structs.null_rules(names).alias("names"),
        structs.repair_update_time(sources).alias("sources"),
        F.round(X.hausdorff(hxa, hya, hxb, hyb), 6).alias("hausdorff_m"),
        # F12 probe (load_matches.py:44-61): nested doubles, rounded to
        # <= the target scale so the fixed-scale decimal repr is exact
        F.struct(
            F.round(F.col("c_custkey") / 7, 1).alias("a"),
            F.array(F.round(F.col("c_custkey") / 3, 1)).alias("ys"),
        ).alias("dec_probe"),
    )
    df = structs.floats_to_decimal(df, precision=18, scale=6,
                                   cols=["dec_probe"])
    df = structs.flatten_struct(df, "names")
    return df.select(
        "id", "wlon", "wlat", "cx", "cy", "osm_type", "osm_num",
        "names_primary", "names_rules",
        F.col("sources")[0]["update_time"].alias("ut0"),
        F.col("sources")[1]["update_time"].alias("ut1"),
        "hausdorff_m",
        F.concat(
            F.col("dec_probe")["a"].cast("string"), F.lit("|"),
            F.col("dec_probe")["ys"][0].cast("string"),
        ).alias("dec_repr"),
    )


def q_det_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: seeded deterministic shuffle, emitted as (id, position)."""
    from pyspark.sql import Window

    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import h60

    c = demo.load(spark, sf_dir, "customer")
    key_s = F.col("c_custkey").cast("string")
    rank_key = h60(F.concat(key_s, F.lit(":42")))
    w = Window.orderBy(rank_key.asc(), F.col("c_custkey").asc())
    return c.select(
        F.col("c_custkey").alias("id"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# round-2 queries: io formats, serving/resume joins, nested structs,
# wide projection, dedup clustering, ANN multi-probe, error budget
# ---------------------------------------------------------------------------

def q_geojson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 + S1/S2 consolidated r4 (was geojson_features +
    geojson_scan): render one GeoJSON Feature string per match
    (enrich_matches_with_dynamodb.py:398-404), assemble them into a
    FeatureCollection file, scan it back (the reference loads these
    via geopandas at match.py:89-110), and RE-RENDER each feature
    from the parsed values. Lossless round-trip => output equals the
    original sink rendering, so one oracle row checks the sink bytes
    AND the scan. (A FeatureCollection is inherently one JSON doc, so
    the file assembly is a single-file driver write — the at-scale
    sink is the JSONL/GeoJSONSeq path, q jsonl_roundtrip.)"""
    import os

    from overmatch_spark.operators.io import (
        geojson_point_feature,
        read_geojson_features,
    )

    m = _matches_df(spark, sf_dir)
    key = F.split(F.col("overture_id"), "/").getItem(1).cast("long")
    props = F.concat(
        F.lit('{"osm_id":"'), F.col("osm_id"), F.lit('","ok":'),
        key.cast("string"), F.lit("}"),
    )
    feats = m.select(
        geojson_point_feature(F.col("lon"), F.col("lat"), key, props).alias(
            "feature"
        )
    )
    fc_text = feats.agg(
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.array_join(F.array_sort(F.collect_list("feature")), ","),
            F.lit("]}"),
        ).alias("fc")
    ).collect()[0][0]
    path = os.path.join(_scratch_dir("overmatch_gjrt_"), "fc.geojson")
    with open(path, "w") as fh:
        fh.write(fc_text)
    got = read_geojson_features(spark, path, "osm_id: string, ok: long")
    reprops = F.concat(
        F.lit('{"osm_id":"'), F.col("osm_id"), F.lit('","ok":'),
        F.col("ok").cast("string"), F.lit("}"),
    )
    return got.select(
        "osm_id",
        geojson_point_feature(
            F.col("lon"), F.col("lat"), F.col("ok"), reprops
        ).alias("feature"),
    )


def q_osmchange_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7: osmChange <modify> XML assembly (xml.ts:5-84), tags in
    sorted key order."""
    from overmatch_spark import demo
    from overmatch_spark.operators.structs import osm_change_xml

    c = demo.load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    tags = F.map_from_arrays(
        F.array(F.lit("amenity"), F.lit("name")),
        F.array(
            F.element_at(
                F.array(*[F.lit(x) for x in _TAG_CATS]), (key % 4 + 1).cast("int")
            ),
            demo._vocab_name(key),
        ),
    )
    xml = osm_change_xml(
        key, key % 9 + 1, key % 170 - 85, key % 360 - 180, tags
    )
    return c.select(key.alias("id"), xml.alias("xml"))


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/K1: JSONL sink + malformed-tolerant scan round-trip through
    a real directory (match.py:494-496, api/load_matches.py:21-41)."""
    import os
    import tempfile

    from overmatch_spark import demo
    from overmatch_spark.operators.io import read_jsonl, write_jsonl

    c = demo.load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    df = c.select(
        key.alias("id"),
        F.when(key % 11 == 3, F.lit(None)).otherwise(demo._vocab_name(key)).alias(
            "name"
        ),
        (key * 17 % 1000).alias("val"),
    )
    # per-call unique dir: concurrent harness runs must not race on a
    # shared fixed path
    path = os.path.join(_scratch_dir("overmatch_jsonl_"), "roundtrip")
    write_jsonl(df, path)
    return read_jsonl(spark, path, schema="id long, name string, val long")


def q_csv_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 + S7/A5 consolidated r4: delimited taxonomy scan
    (get_categories.py:12-39, file synthesized deterministically from
    the nation table) cross-joined with the 1-row lexicographic
    latest-release max (get_latest_overture_release.py:4-10)."""
    import os

    import pyarrow.parquet as pq

    from overmatch_spark import demo
    from overmatch_spark.operators.io import latest_release, read_csv_taxonomy

    t = pq.read_table(f"{sf_dir}/nation.parquet").to_pydict()
    d = _scratch_dir("overmatch_tax_")
    with open(os.path.join(d, "tax.csv"), "w") as f:
        f.write("code;category;region\n")
        for k, nm, r in sorted(
            zip(t["n_nationkey"], t["n_name"], t["n_regionkey"])
        ):
            f.write(f"{k};{nm};r{r}\n")
    tax = read_csv_taxonomy(spark, d)
    o = demo.load(spark, sf_dir, "orders")
    rel = F.concat(
        F.lit("2025-"),
        F.lpad((F.col("o_orderkey") % 12 + 1).cast("string"), 2, "0"),
        F.lit(".0"),
    )
    latest = latest_release(o.select(rel.alias("release")))
    return tax.select(
        F.col("code").cast("long").alias("code"), "category", "region"
    ).crossJoin(F.broadcast(latest))


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (r4) — TWO oracle-checked variants:

      - pq_flat: corpus rides the candidate scan as 4-bit-per-
        subvector codes only (pinned PQ_CODEBOOKS artifact, 64x
        compression — at 10^12 vectors raw floats cannot live in
        memory), probes broadcast their ADC lookup tables, the
        deterministic ADC shortlist re-ranks by exact cosine via an
        id-keyed join back to the raw vectors.
      - ivfpq_clustered_np1 (r5, the r4-verdict ask): the COMPOSED
        IVF+PQ stack (FAISS-IVFPQ shape — list pruning AND code
        compression at once, the production 10^12-vector retrieval
        shape) over the deterministic clustered view with its
        analytic centers, nprobe=1."""
    from overmatch_spark import demo
    from overmatch_spark.operators.ann import (
        clustered_centers,
        clustered_view,
        ivfpq_topk,
        pq_topk,
        reference_pq_codebooks,
    )

    e = demo.load(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    flat = pq_topk(
        e, probes, "embedding", "vec_id", reference_pq_codebooks(),
        k=5, shortlist=20,
    ).withColumn("variant", F.lit("pq_flat"))
    # half corpus (same budget trick as the ivf64_np8 variant): the
    # per-row code/LUT expressions are wide, and the oracle suite has
    # a wall window to respect
    ec = e.filter(F.col("vec_id") % 2 == 0).select(
        "vec_id",
        clustered_view(
            F.col("embedding").cast("array<double>"), F.col("vec_id")
        ).alias("embedding"),
    )
    probes_c = ec.filter(F.col("vec_id") < 5)
    comp = ivfpq_topk(
        ec, probes_c, "embedding", "vec_id", clustered_centers(),
        reference_pq_codebooks(), k=5, nprobe=1, shortlist=20,
    ).withColumn("variant", F.lit("ivfpq_clustered_np1"))
    return flat.unionByName(comp)


def q_probe_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: serving-path point lookup — broadcast-semi-join the request
    id set against grouped matches (api/main.py:321-367)."""
    from overmatch_spark import demo
    from overmatch_spark.operators.enrich import group_matches, probe_ids

    m = _matches_df(spark, sf_dir)
    g = group_matches(m).select("osm_id", "match_count")
    a = demo.spark_layer_a(spark, sf_dir)
    akey = F.split(F.col("osm_id"), "/").getItem(1).cast("long")
    ids = a.filter(akey % 7 == 0).select("osm_id")
    return probe_ids(g, ids)


def q_skip_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/D1/D4: resume anti-join — elements whose key already reached
    the sink are skipped (api/load_matches.py:176-183)."""
    from overmatch_spark import demo
    from overmatch_spark.operators.seen import skip_existing

    m = _matches_df(spark, sf_dir)
    a = demo.spark_layer_a(spark, sf_dir).select("osm_id")
    return skip_existing(a, m, "osm_id")


def q_auto_zoom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: deterministic auto max-zoom from the match count (the
    tippecanoe -zg stand-in, operators/tiles.py:auto_max_zoom) as a
    one-row aggregate."""
    m = _matches_df(spark, sf_dir)
    n = F.count("*")
    z = (
        F.lit(10)
        + F.when(n > 1000, 2).otherwise(0)
        + F.when(n > 100_000, 2).otherwise(0)
        + F.when(n > 10_000_000, 2).otherwise(0)
    )
    return m.agg(z.cast("long").alias("max_zoom"))


def q_category_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/P10: pinned category->OSM-tag map incl. the
    missing->'unknown'->empty default, rendered as a sorted k=v
    string."""
    from overmatch_spark import demo
    from overmatch_spark.operators.tags import category_tags

    c = demo.load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    cat = (
        F.when(key % 6 == 5, F.lit(None))
        .when(key % 6 == 4, F.lit("unknown"))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(x) for x in _TAG_CATS]), (key % 4 + 1).cast("int")
            )
        )
    )
    rendered = F.array_join(
        F.transform(
            F.sort_array(F.map_entries(category_tags(cat))),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        ";",
    )
    return c.select(key.alias("id"), rendered.alias("tags"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated r4 (was dedup_clusters + dedup_keep_best):
    near-dup pairs -> connected components (min-label propagation;
    deterministic cluster_id = component min) with BOTH survivor
    policies side by side — survivor_min (keep smallest doc_id) and
    survivor_best (keep the cluster's longest text, ties -> smallest
    doc_id; keeps the original over its truncated near-dup)."""
    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    d = demo.load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    trunc = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.size(words) - 2), " ").alias("text"),
    )
    corpus = d.unionByName(trunc)
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id", bands=8, rows_per_band=2,
        jaccard_threshold=0.5,
    )
    base = dedup_clusters(pairs, nodes=corpus.select("doc_id")).select(
        "doc_id", "cluster_id", F.col("survivor").alias("survivor_min")
    )
    best = dedup_clusters(
        pairs,
        nodes=corpus.select("doc_id", F.length("text").alias("score")),
        score_col="score",
    ).select("doc_id", F.col("survivor").alias("survivor_best"))
    return base.join(best, "doc_id")


def q_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call corpus dedup (pairs -> clusters -> keep-longest
    survivors -> surviving rows): truncated near-dups lose to their
    longer originals; all original columns survive."""
    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import dedup_corpus

    d = demo.load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    trunc = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.size(words) - 2), " ").alias("text"),
    )
    corpus = d.unionByName(trunc).withColumn(
        "score", F.length("text").cast("double")
    )
    return dedup_corpus(
        corpus, "text", "doc_id", bands=8, rows_per_band=2,
        jaccard_threshold=0.5, score_col="score",
    )


def q_dedup_first_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-arrival-wins exact dedup (the batch twin of
    streaming/dedup_stream): duplicates injected with later
    arrival times must lose to the original."""
    from overmatch_spark import demo
    from overmatch_spark.streaming.dedup_stream import dedup_batch

    d = demo.load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(dup).withColumn(
        "ts", (F.col("doc_id") % 500000) * 10 + (F.col("doc_id") >= 500000).cast("long")
    )
    return dedup_batch(corpus, "text", "ts")


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic radius join (public API): all (a, b) pairs within
    120 m — the cell-join machinery without matcher semantics. The
    demo grid's >=145.5 m cross-pair isolation makes the oracle a
    closed-form key equi-join at this radius."""
    from overmatch_spark import demo
    from overmatch_spark.operators.conflate import spatial_join

    a = demo.spark_layer_a(spark, sf_dir)
    b = demo.spark_layer_b(spark, sf_dir)
    return spatial_join(a, b, radius_m=120.0)


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (rolling word k-gram
    hashes, window-min selection, stop-fingerprint df cap): docs
    sharing >= 5 fingerprints — catches long shared passages, not
    just whole-doc similarity."""
    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import winnow_pairs

    d = (
        demo.load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 250)
        .select("doc_id", "text")
    )
    words = F.split(F.col("text"), " ")
    trunc = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.size(words) - 2), " ").alias("text"),
    )
    corpus = d.unionByName(trunc)
    return winnow_pairs(corpus, "text", "doc_id", k=4, w=4, min_shared=5,
                        max_df=8)


_IMAGE_FEATURES_N = 60


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: decode + per-image features over the binary image
    column (raw/qlossy codec), distributed via mapInPandas. The
    oracle replays the identical per-image numpy computation
    single-node (the codec is deterministic — VERDICT r2 #5), so this
    row verifies the whole Spark plumbing: binary round-trip, Arrow
    batching, partition invariance of per-image math."""
    from overmatch_spark.fixtures import make_images
    from overmatch_spark.operators.multimodal import extract_features

    pdf = make_images(_IMAGE_FEATURES_N)
    images = spark.createDataFrame(pdf).repartition(8)
    return extract_features(images)


def _image_features_oracle_sql() -> str:
    """Single-node numpy replay of extract_features as a DuckDB VALUES
    literal (repr round-trips doubles exactly)."""
    from overmatch_spark.fixtures import make_images
    from overmatch_spark.images import decode

    rows = []
    for r in make_images(_IMAGE_FEATURES_N).itertuples(index=False):
        px = decode(r.bytes, r.w, r.h, r.fmt).astype("float64")
        rows.append(
            f"('{r.image_id}', {round(float(px[:, :, 0].mean()), 9)!r}, "
            f"{round(float(px[:, :, 1].mean()), 9)!r}, "
            f"{round(float(px[:, :, 2].mean()), 9)!r}, "
            f"{round(float(px.mean(axis=2).std()), 9)!r}, "
            f"{float(r.w) / float(r.h)!r})"
        )
    values = ",\n              ".join(rows)
    return f"""
        SELECT * FROM (VALUES
              {values}
        ) AS t(image_id, mean_r, mean_g, mean_b, std_gray, aspect)
    """


def _phash_corpus_rows() -> list[tuple[str, int]]:
    """Deterministic phash corpus: each fixture image plus a variant
    whose phash flips 1, 3, or 5 distinct bits (by index class) —
    hamming 1/3 pairs must be found at k=3, hamming-5 must not, and
    unrelated images differ by ~32 bits."""
    from overmatch_spark.fixtures import make_images

    rows: list[tuple[str, int]] = []
    pdf = make_images(_IMAGE_FEATURES_N, with_bytes=False)
    for j, r in enumerate(pdf.itertuples(index=False)):
        rows.append((r.image_id, int(r.phash)))
        nb = (1, 3, 5)[j % 3]
        mask = 0
        for t in range(nb):
            mask |= 1 << ((j * 7 + t * 11) % 64)
        u = (int(r.phash) & 0xFFFFFFFFFFFFFFFF) ^ mask
        signed = u - (1 << 64) if u >= (1 << 63) else u
        rows.append((r.image_id + "/v", signed))
    return rows


def q_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal dedup: image near-dup pairs by 64-bit perceptual-
    hash hamming <= 3, exact pigeonhole blocking (bytes never join)."""
    from overmatch_spark.operators.multimodal import phash_near_dups

    corpus = spark.createDataFrame(
        _phash_corpus_rows(), "image_id string, phash long"
    ).repartition(8)
    return phash_near_dups(corpus, "phash", "image_id", k=3)


def _phash_near_dups_oracle_sql() -> str:
    values = ",\n              ".join(
        f"('{i}', CAST({p} AS BIGINT))" for i, p in _phash_corpus_rows()
    )
    return f"""
        WITH t AS (
          SELECT * FROM (VALUES
              {values}
          ) AS v(image_id, phash)
        )
        SELECT a.image_id AS id_a, b.image_id AS id_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM t a JOIN t b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """


def q_image_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal curation: the canonical training-data filter joins
    PIXEL features (distributed decode via mapInPandas) with CAPTION
    text quality (pure Catalyst) and keeps rows passing both — the
    cross-modal composition a 10^12-image pipeline runs before
    training. Payload bytes stay scan-side; only features join."""
    from overmatch_spark.fixtures import make_images
    from overmatch_spark.operators.multimodal import extract_features
    from overmatch_spark.operators.text_analysis import (
        quality_score,
        token_count,
    )

    pdf = make_images(_IMAGE_FEATURES_N)
    images = spark.createDataFrame(pdf).repartition(8)
    feats = extract_features(images)
    caps = images.select("image_id", "caption")
    return (
        feats.join(caps, "image_id")
        .select(
            "image_id", "std_gray", "aspect",
            token_count(F.col("caption")).alias("caption_tokens"),
            quality_score(F.col("caption")).alias("caption_quality"),
        )
        .filter(
            (F.col("std_gray") >= 43.0) & (F.col("caption_quality") >= 0.5)
        )
    )


def _image_curation_oracle_sql() -> str:
    """Pixel features from the numpy replay (VALUES literals, same
    discipline as image_features); caption metrics via the
    text_analysis SQL twins over caption literals."""
    from overmatch_spark.fixtures import make_images
    from overmatch_spark.images import decode
    from overmatch_spark.operators import text_analysis as ta

    rows = []
    for r in make_images(_IMAGE_FEATURES_N).itertuples(index=False):
        px = decode(r.bytes, r.w, r.h, r.fmt).astype("float64")
        rows.append(
            f"('{r.image_id}', '{r.caption}', "
            f"{round(float(px.mean(axis=2).std()), 9)!r}, "
            f"{float(r.w) / float(r.h)!r})"
        )
    values = ",\n              ".join(rows)
    return f"""
        WITH imgs AS (
          SELECT * FROM (VALUES
              {values}
          ) AS t(image_id, caption, std_gray, aspect)
        )
        SELECT image_id, std_gray, aspect,
               {ta.sql_token_count('caption')} AS caption_tokens,
               {ta.sql_quality_score('caption')} AS caption_quality
        FROM imgs
        WHERE std_gray >= 43.0 AND {ta.sql_quality_score('caption')} >= 0.5
    """


def _fake_videos() -> list[tuple[str, bytes]]:
    """Deterministic video containers: RAWV (raw RGB frames) AND real
    ISO-BMFF MP4 with Motion-JPEG samples (kernels/mp4.py mux + the
    in-tree JPEG codec) — one binary column, per-row dispatch."""
    from overmatch_spark.images import (
        encode_video,
        encode_video_mp4,
        gen_pixels,
    )

    rows = []
    for i in range(8):
        vid = f"vid/{i:04d}"
        n = 5 + (i % 4) * 3
        w, h = (8, 6) if i % 2 == 0 else (4, 4)
        frames = [gen_pixels(f"{vid}#{j}", w, h) for j in range(n)]
        rows.append((vid, encode_video(frames, fps=24)))
    for i in range(4):
        vid = f"mp4/{i:04d}"
        n = 4 + i * 2
        w, h = 16, 8
        frames = [gen_pixels(f"{vid}#{j}", w, h) for j in range(n)]
        rows.append((vid, encode_video_mp4(frames, fps=24)))
    return rows


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: distributed video demux + constant-time frame
    seek (every 3rd frame) over RAWV + real MP4/MJPEG containers;
    frames reported by content hash so the oracle replays the demux
    AND the jpeg sample decode single-node (bit-for-bit)."""
    from overmatch_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        _fake_videos(), "video_id string, bytes binary"
    ).repartition(4)
    return sample_frames(df, every_n=3).select(
        "video_id", "frame_idx", "w", "h",
        F.md5(F.col("bytes")).alias("frame_md5"),
    )


def _video_frames_oracle_sql() -> str:
    import hashlib

    from overmatch_spark.images import gen_pixels

    rows = []
    for i in range(8):
        vid = f"vid/{i:04d}"
        n = 5 + (i % 4) * 3
        w, h = (8, 6) if i % 2 == 0 else (4, 4)
        for idx in range(0, n, 3):
            px = gen_pixels(f"{vid}#{idx}", w, h)
            md5 = hashlib.md5(px.tobytes()).hexdigest()
            rows.append(f"('{vid}', {idx}, {w}, {h}, '{md5}')")
    # mp4 rows: single-node replay of the full sample path (jpeg
    # encode at mux time -> jpeg decode at sampling time) — the
    # distributed demux+decode must match bit-for-bit
    from overmatch_spark.kernels.jpeg import jpeg_decode_rgb, jpeg_encode_rgb

    for i in range(4):
        vid = f"mp4/{i:04d}"
        n = 4 + i * 2
        w, h = 16, 8
        for idx in range(0, n, 3):
            px = gen_pixels(f"{vid}#{idx}", w, h)
            dec = jpeg_decode_rgb(jpeg_encode_rgb(px, quality=98))
            md5 = hashlib.md5(dec.tobytes()).hexdigest()
            rows.append(f"('{vid}', {idx}, {w}, {h}, '{md5}')")
    values = ",\n              ".join(rows)
    return f"""
        SELECT * FROM (VALUES
              {values}
        ) AS t(video_id, frame_idx, w, h, frame_md5)
    """


def _fake_audios() -> list[tuple[str, bytes]]:
    """Deterministic RAWA PCM clips (id-derived sine waves)."""
    import numpy as np

    from overmatch_spark.images import encode_audio

    rows = []
    for i in range(10):
        aid = f"aud/{i:04d}"
        n = 800 + i * 160
        t = np.arange(n)
        f0 = 200.0 + 55.0 * i
        pcm = ((9000 + 500 * i) * np.sin(2 * np.pi * f0 * t / 16000.0)).astype(
            np.int16
        )
        rows.append((aid, encode_audio(pcm, 16000)))
    return rows


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: distributed PCM DSP (RMS / zero-crossing rate /
    FFT spectral centroid / peak) over the RAWA container, rounded to
    6 dp for engine portability (FFT reductions can differ in the
    last ulp across processes, same as image means)."""
    from overmatch_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        _fake_audios(), "audio_id string, bytes binary"
    ).repartition(4)
    return audio_features(df).select(
        "audio_id", "sample_rate",
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
        F.round("spectral_centroid_hz", 6).alias("spectral_centroid_hz"),
        F.round("peak", 6).alias("peak"),
    )


def _audio_features_oracle_sql() -> str:
    """Single-node numpy replay; DuckDB round(x, 6) matches Spark's
    F.round for the non-negative feature values."""
    import numpy as np

    from overmatch_spark.images import decode_audio

    rows = []
    for aid, buf in _fake_audios():
        rate, pcm = decode_audio(buf)
        x = pcm.astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(x * x)))
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(x.size, d=1.0 / rate)
        centroid = float((freqs * mag).sum() / float(mag.sum()))
        peak = float(np.abs(x).max())
        rows.append(
            f"('{aid}', {rate}, round({rms!r}, 6), round({zcr!r}, 6), "
            f"round({centroid!r}, 6), round({peak!r}, 6))"
        )
    values = ",\n              ".join(rows)
    return f"""
        SELECT * FROM (VALUES
              {values}
        ) AS t(audio_id, sample_rate, rms, zcr, spectral_centroid_hz, peak)
    """


def q_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming<=3 near-dup retrieval via exact pigeonhole
    blocking (4 signature blocks; any pair within hamming 3 shares a
    block) over a corpus with injected one-word-append variants."""
    from overmatch_spark import demo
    from overmatch_spark.operators.dedup import simhash_hamming_pairs

    d = demo.load(spark, sf_dir, "documents").select("doc_id", "text")
    var = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    corpus = d.unionByName(var)
    return simhash_hamming_pairs(corpus, "text", "doc_id", k=3)


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 extension: gap-based sessionization of the events stream
    (30-min inactivity closes a session), in its batch-parity window-
    function form. The streaming form of the SAME rule runs via
    applyInPandasWithState (streaming/sessions.py) and is equality-
    tested against this batch form."""
    from overmatch_spark.streaming.sessions import sessionize_batch

    from overmatch_spark import demo

    e = demo.load(spark, sf_dir, "events")
    s = sessionize_batch(e, gap_us=1_800_000_000)
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )


def q_checkpointed_conflate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: the batched resumable pipeline (spatial-bucket units,
    idempotent per-bucket overwrite, atomic lineage commits) must
    produce EXACTLY the plain conflation's matches — the checkpointing
    is physical, never semantic. Runs the real job against a fresh
    work dir and returns its result."""
    import tempfile

    from overmatch_spark import demo
    from overmatch_spark.operators.checkpoint import ConflationJob

    a = demo.spark_layer_a(spark, sf_dir)
    b = demo.spark_layer_b(spark, sf_dir)
    job = ConflationJob(
        spark, _scratch_dir("overmatch_ckpt_"), n_buckets=8
    )
    job.prepare(a, b)
    job.run()
    m = job.result()
    return m.select(
        "osm_id",
        "overture_id",
        F.round(F.col("lon"), 9).alias("lon"),
        F.round(F.col("lat"), 9).alias("lat"),
        "distance_m",
        "similarity",
    )


def q_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: the streaming engine's tumbling-window aggregation
    (watermark + window), run in its batch-parity form over `events`
    so DuckDB can replay it (date_trunc hour). The same code path is
    streaming-tested in tests/test_io_streaming.py."""
    from overmatch_spark import demo
    from overmatch_spark.streaming.ingest import windowed_event_counts

    e = demo.load(spark, sf_dir, "events")
    out = windowed_event_counts(e)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        F.col("n").cast("long").alias("n"),
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5, three variant-labelled dials in one row set
    (consolidated r4; adds the production k=64 quantizer and the
    clustered-geometry fixture the r3 verdict asked for):
      - ivf16_np2: the r1 oracle quantizer (16 lists, nprobe=2);
      - ivf64_np8: the PRODUCTION dial's pinned k=64 artifact
        (nprobe=8; corpus halved to vec_id%2=0 to bound the DuckDB
        twin's lambda cost — the quantizer math is identical);
      - clustered_np1: ivf over the deterministic CLUSTERED view of
        the same embeddings (ann.clustered_view) with its analytic
        16-center quantizer — the geometry where list pruning
        actually pays (nprobe=1 = 1/16 of the lists).
    Corpus partitioned by nearest-centroid id (at rest the table's
    partition key -> partition pruning); probes scan nprobe lists and
    re-rank by exact cosine."""
    from overmatch_spark import demo
    from overmatch_spark.operators.ann import (
        clustered_centers,
        clustered_view,
        ivf_topk,
        reference_ivf_centroids,
    )

    e = demo.load(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    v16 = ivf_topk(
        e, probes, "embedding", "vec_id", reference_ivf_centroids(16),
        k=5, nprobe=2,
    ).withColumn("variant", F.lit("ivf16_np2"))

    e_half = e.filter(F.col("vec_id") % 2 == 0)
    v64 = ivf_topk(
        e_half, probes.filter(F.col("vec_id") % 2 == 0), "embedding",
        "vec_id", reference_ivf_centroids(64), k=5, nprobe=8,
    ).withColumn("variant", F.lit("ivf64_np8"))

    ec = e.select(
        "vec_id",
        clustered_view(
            F.col("embedding").cast("array<double>"), F.col("vec_id")
        ).alias("embedding"),
    )
    vc = ivf_topk(
        ec, ec.filter(F.col("vec_id") < 5), "embedding", "vec_id",
        clustered_centers(), k=5, nprobe=1,
    ).withColumn("variant", F.lit("clustered_np1"))
    return v16.unionByName(v64).unionByName(vc)


def q_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: error-budget run — failing rows are dropped and counted as
    data (exactly-once), the run aborts only over budget
    (match.py:464-469)."""
    from overmatch_spark import demo
    from overmatch_spark.operators.errors import run_with_error_budget

    d = demo.load(spark, sf_dir, "documents").select("doc_id")

    def proc(pdf):
        bad = pdf["doc_id"] % 97 == 0
        out = pdf[~bad][["doc_id"]].copy()
        out["status"] = "ok"
        return out, int(bad.sum())

    res, _ = run_with_error_budget(
        spark, d, proc, "doc_id long, status string", max_errors=10**9
    )
    return res


def q_wide_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: the reference's 15-column wide projection with ::JSON casts
    and the full filter chain — bbox prefilter, category IN-list,
    addresses[0].country, operating_status, confidence threshold,
    boundary PIP (build_query.py:59-105)."""
    from overmatch_spark import demo
    from overmatch_spark import expressions as X

    c = demo.load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    xa, ya = demo._grid_xy(key)
    xi = xa.cast("long")
    yi = ya.cast("long")
    cat = F.element_at(
        F.array(*[F.lit(x) for x in _TAG_CATS]), (key % 4 + 1).cast("int")
    )
    j = {"ignoreNullFields": "false"}
    places = c.select(
        key.alias("key"),
        xa.alias("xa"),
        ya.alias("ya"),
        F.concat(F.lit("pl/"), key.cast("string")).alias("id"),
        (key % 10).cast("long").alias("version"),
        F.concat(
            F.lit("POINT("), xi.cast("string"), F.lit(" "), yi.cast("string"),
            F.lit(")"),
        ).alias("geometry"),
        F.struct(
            (xi - 5).alias("xmin"), (yi - 5).alias("ymin"),
            (xi + 5).alias("xmax"), (yi + 5).alias("ymax"),
        ).alias("bbox"),
        cat.alias("basic_category"),
        F.struct(
            cat.alias("primary"),
            F.array(F.lit("food"), F.lit("poi")).alias("alternate"),
        ).alias("categories"),
        ((key % 1000).cast("double") / 1000.0).alias("confidence"),
        F.struct(
            demo._vocab_name(key).alias("primary"),
            F.lit(None).cast("string").alias("rules"),
        ).alias("names"),
        F.array(
            F.struct(
                F.concat((key % 900 + 100).cast("string"), F.lit(" Main St"))
                .alias("freeform"),
                F.when(key % 5 < 4, F.lit("US")).otherwise(F.lit("CA"))
                .alias("country"),
            )
        ).alias("addresses"),
        F.array(
            F.concat(F.lit("https://ex"), key.cast("string"), F.lit(".com"))
        ).alias("websites"),
        F.array(F.concat(F.lit("social/"), key.cast("string"))).alias("socials"),
        F.array(F.concat(F.lit("mail"), key.cast("string"), F.lit("@ex.com")))
        .alias("emails"),
        F.array(
            F.concat(F.lit("+1-202-555-"), (key % 9000 + 1000).cast("string"))
        ).alias("phones"),
        F.struct(
            F.concat(F.lit("brand"), (key % 50).cast("string")).alias("name")
        ).alias("brand"),
        F.array(
            F.struct(
                F.lit("datasetA").alias("dataset"),
                F.lit("2025-04-02T12:30:15Z").alias("update_time"),
            )
        ).alias("sources"),
        F.when(key % 10 == 7, F.lit("closed")).otherwise(F.lit("open"))
        .alias("operating_status"),
    )
    filtered = places.filter(
        (F.col("bbox")["xmin"] > F.lit(demo.X0))
        & (F.col("bbox")["xmax"] < F.lit(demo.X0 + 200_000))
        & (F.col("categories")["primary"].isin("restaurant", "cafe"))
        & (F.col("addresses")[0]["country"] == "US")
        & (F.col("operating_status") == "open")
        & (F.col("confidence") >= 0.05)
        & X.pip(F.col("xa"), F.col("ya"), demo.PIP_POLY)
    )
    return filtered.select(
        "id",
        "version",
        "geometry",
        F.to_json(F.col("bbox"), j).alias("bbox"),
        "basic_category",
        F.to_json(F.col("categories"), j).alias("categories"),
        "confidence",
        F.to_json(F.col("names"), j).alias("names"),
        F.to_json(F.col("addresses"), j).alias("addresses"),
        F.to_json(F.col("websites"), j).alias("websites"),
        F.to_json(F.col("socials"), j).alias("socials"),
        F.to_json(F.col("emails"), j).alias("emails"),
        F.to_json(F.col("phones"), j).alias("phones"),
        F.to_json(F.col("brand"), j).alias("brand"),
        F.to_json(F.col("sources"), j).alias("sources"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries (the driver's correctness harness verifies
    the first 50): the r3 dict had 58, so 8 rows silently aged out of
    the evidence window. Consolidated r4 by MERGING near-duplicate
    rows (struct_ops+struct_nested+hausdorff -> struct_roundtrip,
    closest_match+merge_tags -> closest_merge, seen_upsert+seen_replay
    -> seen_store, text_stats+lang_quality_summary -> text_analysis,
    dedup_clusters+dedup_keep_best -> dedup_clusters,
    geojson_features+geojson_scan -> geojson_roundtrip,
    ann_lsh+ann_multiprobe -> ann_lsh_topk, ann_ivf16+new ivf64+new
    clustered fixture -> ann_ivf_topk) — every operator keeps oracle
    evidence, nothing is silently unverified."""
    return {
        "conflate_matches": q_conflate_matches,
        "conflate_stats": q_conflate_stats,
        "grouped_matches": q_grouped_matches,
        "knn_fallback": q_knn_fallback,
        "checkpointed_conflate": q_checkpointed_conflate,
        "tile_counts_z12": q_tile_counts_z12,
        "tile_bounds_roundtrip": q_tile_bounds_roundtrip,
        "pip_filter": q_pip_filter,
        "match_quality": q_match_quality,
        "tag_transform": q_tag_transform,
        "enrich_marked_counts": q_enrich_marked_counts,
        "seen_store": q_seen_store,
        "tile_density_drop": q_tile_density_drop,
        "exact_dedup": q_exact_dedup,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "simhash_hamming": q_simhash_hamming,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_near_dups": q_embedding_near_dups,
        "ann_brute_topk": q_ann_brute_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "text_analysis": q_text_analysis,
        "closest_merge": q_closest_merge,
        "struct_roundtrip": q_struct_roundtrip,
        "det_shuffle": q_det_shuffle,
        "tag_diff": q_tag_diff,
        "geojson_roundtrip": q_geojson_roundtrip,
        "osmchange_xml": q_osmchange_xml,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "csv_taxonomy": q_csv_taxonomy,
        "ann_pq_topk": q_ann_pq_topk,
        "probe_lookup": q_probe_lookup,
        "skip_existing": q_skip_existing,
        "auto_zoom": q_auto_zoom,
        "category_tags": q_category_tags,
        "dedup_clusters": q_dedup_clusters,
        "image_features": q_image_features,
        "image_curation": q_image_curation,
        "video_frames": q_video_frames,
        "audio_features": q_audio_features,
        "phash_near_dups": q_phash_near_dups,
        "winnow_pairs": q_winnow_pairs,
        "spatial_join": q_spatial_join,
        "dedup_first_arrival": q_dedup_first_arrival,
        "dedup_corpus": q_dedup_corpus,
        "windowed_counts": q_windowed_counts,
        "event_sessions": q_event_sessions,
        "error_budget": q_error_budget,
        "wide_projection": q_wide_projection,
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
        "checkpointed_conflate": f"""
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
                       ORDER BY {X.sql_rint(f'({dist_ab}) * 1000')}, b.id
                     ) AS rn
              FROM unmatched u CROSS JOIN layer_b b
            )
            SELECT osm_id, overture_id, {X.sql_round1('dist')} AS distance_m
            FROM cand WHERE rn = 1
        """,
        "tile_counts_z12": f"""
            {matches_cte}
            SELECT {X.sql_tile_x('lon', 12)} AS tx,
                   {X.sql_tile_y('lat', 12)} AS ty,
                   CAST(count(*) AS BIGINT) AS n
            FROM matches GROUP BY 1, 2
        """,
        **_oracle_sql_extended(),
        **_oracle_sql_round2(),
    }


def _oracle_sql_extended() -> dict[str, str]:
    from overmatch_spark import demo
    from overmatch_spark import expressions as X
    from overmatch_spark.operators import dedup as dd
    from overmatch_spark.operators import tags
    from overmatch_spark.operators import text_analysis as ta

    layers = demo.sql_layers_cte()
    matches_cte = f"{layers},{demo.SQL_MATCHES}"

    # --- pip_filter ---
    px = X.sql_merc_x("lon")
    py = X.sql_merc_y("lat")
    pip_sql = f"""
        {layers}
        SELECT osm_id FROM layer_a
        WHERE {X.sql_pip(px, py, demo.PIP_POLY)}
    """

    # --- match_quality ---
    mq = X.sql_match_quality("similarity", "distance_m")
    quality_sql = f"""
        {matches_cte}
        SELECT osm_id, overture_id, round({mq}, 6) AS quality FROM matches
    """

    # --- tag_transform (inputs synthesized identically to the Spark side) ---
    website = (
        "CASE WHEN key % 5 = 0 THEN concat('HTTPS://WWW.Example', CAST(key AS VARCHAR), "
        "'.COM/Menu?utm_source=fb&page=', CAST(key % 7 AS VARCHAR)) "
        "WHEN key % 5 = 1 THEN concat('http://Foo', CAST(key AS VARCHAR), "
        "'.com/Home?ref=abc&id=9&x=1') "
        "WHEN key % 5 = 2 THEN concat('https://www.doordash.com/store/', CAST(key AS VARCHAR)) "
        "WHEN key % 5 = 3 THEN concat('https://Bar', CAST(key % 100 AS VARCHAR), "
        "'.COM/a/B?hsa_cam=2&_ga=1') END"
    )
    phone = (
        "CASE WHEN key % 4 = 0 THEN concat('(202) 555-', CAST(key % 9000 + 1000 AS VARCHAR)) "
        "WHEN key % 4 = 1 THEN concat('+1-800-555-', CAST(key % 9000 + 1000 AS VARCHAR)) "
        "WHEN key % 4 = 2 THEN concat('202.555.', CAST(key % 9000 + 1000 AS VARCHAR)) END"
    )
    addr = (
        "CASE WHEN key % 3 = 0 THEN concat(CAST(key % 900 + 100 AS VARCHAR), ' Main Street Northwest') "
        "WHEN key % 3 = 1 THEN concat(CAST(key % 99 + 1 AS VARCHAR), ' Oak Avenue') END"
    )
    tag_sql = f"""
        WITH syn AS (
          SELECT c_custkey AS key, {website} AS website, {phone} AS phone,
                 {addr} AS addr
          FROM customer
        )
        SELECT key AS id,
               {tags.sql_clean_website('website')} AS website_clean,
               {tags.sql_drop_toll_free(tags.sql_normalize_phone('phone'))} AS phone_norm,
               {tags.sql_parse_housenumber('addr')} AS housenumber,
               {tags.sql_parse_street('addr')} AS street
        FROM syn
    """

    # --- seen tables (shared) ---
    seen_cte = """
        osm_seen AS (
          SELECT concat('node/', CAST(c_custkey AS VARCHAR)) AS element_id,
                 CAST((c_custkey * 11) % 3000 AS BIGINT) AS first_seen,
                 CAST((c_custkey * 11) % 3000 + c_custkey % 100 AS BIGINT) AS last_seen
          FROM customer WHERE c_custkey % 3 = 0
        ),
        ov_seen AS (
          SELECT concat('ov/', CAST(c_custkey AS VARCHAR)) AS element_id,
                 CAST((c_custkey * 17) % 3000 AS BIGINT) AS first_seen,
                 CAST((c_custkey * 17) % 3000 + c_custkey % 90 AS BIGINT) AS last_seen
          FROM customer WHERE c_custkey % 5 < 2
        )
    """
    enrich_sql = f"""
        {matches_cte},
        {seen_cte}
        SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN o.element_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS osm_marked_count,
               CAST(sum(CASE WHEN v.element_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS overture_marked_count,
               CAST(sum(CASE WHEN o.element_id IS NOT NULL AND v.element_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_marked_count
        FROM matches m
        LEFT JOIN osm_seen o ON m.osm_id = o.element_id
        LEFT JOIN ov_seen v ON m.overture_id = v.element_id
    """
    seen_store_sql = f"""
        WITH {seen_cte.strip()},
        batch AS (
          SELECT concat('node/', CAST(c_custkey AS VARCHAR)) AS element_id,
                 CAST((c_custkey * 13) % 3000 + 500 AS BIGINT) AS seen_at
          FROM customer WHERE c_custkey % 2 = 0
        ),
        unioned AS (
          SELECT element_id, first_seen, last_seen FROM osm_seen
          UNION ALL
          SELECT element_id, seen_at, seen_at FROM batch
        ),
        replay_batches AS (
          SELECT concat('node/', CAST(c_custkey AS VARCHAR)) AS element_id,
                 CAST((c_custkey * (7 + i)) % 3000 + 100 * i AS BIGINT) AS seen_at
          FROM customer, (VALUES (0), (1), (2)) AS t(i)
          WHERE c_custkey % 3 = i OR c_custkey % 5 = i
        )
        SELECT element_id, min(first_seen) AS first_seen,
               max(last_seen) AS last_seen, 'upsert' AS src
        FROM unioned GROUP BY element_id
        UNION ALL
        SELECT element_id, min(seen_at) AS first_seen,
               max(seen_at) AS last_seen, 'replay' AS src
        FROM replay_batches GROUP BY element_id
    """

    # --- tile density drop ---
    drop_rank = dd.sql_h60("CAST(match_id AS VARCHAR)")
    tile_drop_sql = f"""
        {matches_cte},
        ids AS (
          SELECT *, CAST(row_number() OVER (ORDER BY osm_id, overture_id) AS BIGINT)
                 AS match_id
          FROM matches
        ),
        tiled AS (
          SELECT match_id, 14 AS z,
                 {X.sql_tile_x('lon', 14)} AS x,
                 {X.sql_tile_y('lat', 14)} AS y
          FROM ids
        )
        SELECT match_id, z, x, y,
               (row_number() OVER (
                  PARTITION BY z, x, y ORDER BY {drop_rank}, match_id
                ) <= 3) AS kept
        FROM tiled
    """

    # --- dedup family ---
    exact_sql = """
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents
        ),
        ranked AS (
          SELECT doc_id, md5(text) AS content_hash,
                 row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM corpus
        )
        SELECT doc_id, content_hash FROM ranked WHERE rn = 1
    """

    sh = dd.sql_shingles("text", 3)
    sig_items = ", ".join(dd.sql_minhash_sig_item("th", j) for j in range(16))
    minhash_cte = f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000,
                 array_to_string(list_slice(string_split(text, ' '), 1,
                   len(string_split(text, ' ')) - 2), ' ')
          FROM documents
        ),
        shing AS (SELECT doc_id, {sh} AS sh FROM corpus),
        hashed AS (SELECT doc_id, sh, {dd.sql_minhash_token_hashes('sh')} AS th FROM shing),
        sig AS (SELECT doc_id, sh, [{sig_items}] AS sig FROM hashed),
        banded AS (
          SELECT doc_id, sh, band,
                 concat(CAST(sig[band * 2 + 1] AS VARCHAR), ',',
                        CAST(sig[band * 2 + 2] AS VARCHAR)) AS key
          FROM sig, (SELECT unnest(range(8)) AS band)
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        ),
        scored AS (
          SELECT id_a, id_b,
                 round(
                   CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
                   / (CAST(len(a.sh) + len(b.sh) AS DOUBLE)
                      - CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)),
                 9) AS jaccard
          FROM cand JOIN shing a ON a.doc_id = id_a JOIN shing b ON b.doc_id = id_b
        )"""
    minhash_sql = f"""
        {minhash_cte}
        SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
    """

    simhash_sql = f"""
        WITH shing AS (SELECT doc_id, {sh} AS sh FROM documents),
        toks AS (SELECT doc_id, {dd.sql_token_hashes('sh')} AS th FROM shing),
        sigs AS (SELECT doc_id, {dd.sql_simhash_from_hashes('th')} AS simhash FROM toks),
        ranked AS (
          SELECT doc_id, simhash,
                 row_number() OVER (PARTITION BY simhash ORDER BY doc_id) AS rn
          FROM sigs
        )
        SELECT doc_id, simhash FROM ranked WHERE rn = 1
    """

    grams = (
        "list_distinct(list_transform(range(1, greatest(length(text) - 1, 2)), "
        "i -> substr(text, i, 3)))"
    )
    ngram_sql = f"""
        WITH g AS (SELECT doc_id, {grams} AS gr FROM documents),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gr AS ga, b.gr AS gb
          FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 2 = 0
        )
        SELECT id_a, id_b,
               round(
                 CAST(len(list_filter(ga, x -> list_contains(gb, x))) AS DOUBLE)
                 / (CAST(len(ga) + len(gb) AS DOUBLE)
                    - CAST(len(list_filter(ga, x -> list_contains(gb, x))) AS DOUBLE)),
               9) AS jaccard3
        FROM pairs
    """

    planes8 = dd.hyperplanes(8, 64)
    bucket8 = dd.sql_embedding_bucket("v", planes8)
    cosab = dd.sql_cosine("a.v", "b.v")
    embdup_sql = f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bk AS (SELECT vec_id, v, {bucket8} AS bucket FROM e)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({cosab}, 9) AS cos_sim
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round({cosab}, 9) >= 0.2
    """

    cospc = dd.sql_cosine("p.v", "c.v")
    ann_brute_sql = f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        scored AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                 round({cospc}, 9) AS cos_sim
          FROM e p, e c
          WHERE p.vec_id < 5 AND c.vec_id != p.vec_id
        ),
        ranked AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id
                 ) AS BIGINT) AS rank
          FROM scored
        )
        SELECT probe_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """

    text_analysis_sql = f"""
        WITH t AS (
          SELECT doc_id,
                 {ta.sql_token_count('text')} AS n_tokens,
                 {ta.sql_bpe_ish_token_estimate('text')} AS n_tokens_bpe,
                 {ta.sql_lang_id('text')} AS pred_lang,
                 {ta.sql_quality_score('text')} AS quality,
                 {ta.sql_fingerprint('text')} AS fp
          FROM documents
        )
        SELECT doc_id, n_tokens, n_tokens_bpe, pred_lang, quality, fp,
               CAST(count(*) OVER (PARTITION BY pred_lang) AS BIGINT)
                 AS lang_n,
               round(avg(quality) OVER (PARTITION BY pred_lang), 6)
                 AS lang_avg_quality
        FROM t
    """

    multi = demo.sql_layers_cte_multi()
    cats_sql = "[" + ", ".join(f"'{c}'" for c in _TAG_CATS) + "]"
    closest_merge_sql = f"""
        {multi},{demo.SQL_MATCHES},{demo.SQL_MATCHES2.lstrip().lstrip(',')}
        , all_m AS (
          SELECT * FROM matches UNION ALL SELECT * FROM matches2
        ),
        ranked AS (
          SELECT osm_id, overture_id, distance_m,
                 row_number() OVER (
                   PARTITION BY osm_id ORDER BY distance_m, overture_id
                 ) AS rn
          FROM all_m
        ),
        k2 AS (
          SELECT m2.osm_id,
                 CAST(string_split(m2.overture_id, '/')[2] AS BIGINT) AS key,
                 m1.osm_id IS NOT NULL AS has_b1
          FROM matches2 m2 LEFT JOIN matches m1 ON m1.osm_id = m2.osm_id
        ),
        merged AS (
          SELECT osm_id,
                 CASE WHEN has_b1 THEN
                   concat('amenity=', {cats_sql}[CAST(key % 4 AS INTEGER) + 1],
                          ';ref=', CAST(key AS VARCHAR),
                          ';website=https://ex', CAST(key AS VARCHAR))
                 ELSE
                   concat('amenity=second_source;website=https://ex',
                          CAST(key AS VARCHAR))
                 END AS merged
          FROM k2
        )
        SELECT r.osm_id, r.overture_id, r.distance_m, g.merged
        FROM ranked r LEFT JOIN merged g ON g.osm_id = r.osm_id
        WHERE r.rn = 1
    """

    from overmatch_spark.operators import structs

    wkt_in = (
        "concat('POINT(', CAST(c_custkey % 360 - 180 AS VARCHAR), ' ', "
        "CAST(c_custkey % 170 - 85 AS VARCHAR), ')')"
    )
    wlon, wlat = structs.sql_parse_wkt_point("wkt")
    cx, cy = structs.sql_centroid("xs", "ys")
    vocab = demo.SQL_VOCAB_NAME
    struct_roundtrip_sql = f"""
        WITH base AS (
          SELECT c_custkey AS id, c_custkey AS key, {wkt_in} AS wkt,
                 [CAST(c_custkey AS DOUBLE), CAST(c_custkey + 1 AS DOUBLE),
                  CAST(c_custkey + 5 AS DOUBLE)] AS xs,
                 [CAST(c_custkey * 2 AS DOUBLE), CAST(c_custkey * 2 + 3 AS DOUBLE),
                  CAST(c_custkey * 2 + 9 AS DOUBLE)] AS ys,
                 concat('node/', CAST(c_custkey AS VARCHAR)) AS osm_id,
                 [CAST(c_custkey AS DOUBLE), CAST(c_custkey + 10 AS DOUBLE),
                  CAST(c_custkey + 3 AS DOUBLE)] AS xa,
                 [CAST(c_custkey * 2 AS DOUBLE), CAST(c_custkey * 2 + 4 AS DOUBLE),
                  CAST(c_custkey * 2 + 11 AS DOUBLE)] AS ya,
                 [CAST(c_custkey + 1 AS DOUBLE), CAST(c_custkey + 7 AS DOUBLE)] AS xb,
                 [CAST(c_custkey * 2 + 2 AS DOUBLE),
                  CAST(c_custkey * 2 + 5 AS DOUBLE)] AS yb
          FROM customer
        )
        SELECT id, {wlon} AS wlon, {wlat} AS wlat,
               {cx} AS cx, {cy} AS cy,
               string_split(osm_id, '/')[1] AS osm_type,
               CAST(string_split(osm_id, '/')[2] AS BIGINT) AS osm_num,
               {vocab} AS names_primary,
               CAST(NULL AS VARCHAR) AS names_rules,
               CASE WHEN key % 3 = 0 THEN '2025-04-01T00:00:00Z'
                    ELSE '2025-04-02T12:30:15.000Z' END AS ut0,
               '2024-01-05T00:00:00Z' AS ut1,
               round({X.sql_hausdorff('xa', 'ya', 'xb', 'yb')}, 6)
                 AS hausdorff_m,
               concat(
                 CAST(CAST(round(key / 7.0, 1) AS DECIMAL(18,6)) AS VARCHAR),
                 '|',
                 CAST(CAST(round(key / 3.0, 1) AS DECIMAL(18,6)) AS VARCHAR)
               ) AS dec_repr
        FROM base
    """
    det_shuffle_sql = f"""
        SELECT c_custkey AS id,
               CAST(row_number() OVER (
                 ORDER BY {dd.sql_h60("concat(CAST(c_custkey AS VARCHAR), ':42')")},
                          c_custkey
               ) AS BIGINT) AS pos
        FROM customer
    """

    osm_cats_sql = "[" + ", ".join(f"'{c}'" for c in _OSM_CATS) + "]"
    tag_diff_sql = f"""
        {multi},{demo.SQL_MATCHES},{demo.SQL_MATCHES2.lstrip().lstrip(',')}
        , base AS (
          SELECT a.osm_id, a.key AS k,
                 (m1.osm_id IS NOT NULL) AS has1,
                 (m2.osm_id IS NOT NULL) AS has2
          FROM layer_a a
          LEFT JOIN (SELECT DISTINCT osm_id FROM matches) m1
            ON m1.osm_id = a.osm_id
          LEFT JOIN (SELECT DISTINCT osm_id FROM matches2) m2
            ON m2.osm_id = a.osm_id
          WHERE a.name IS NOT NULL AND a.name != ''
        )
        SELECT osm_id, 'amenity' AS key,
               CASE WHEN NOT has2 THEN 'osm_only'
                    WHEN has1 AND {osm_cats_sql}[CAST(k % 3 AS INTEGER) + 1]
                         = {cats_sql}[CAST(k % 4 AS INTEGER) + 1] THEN 'same'
                    ELSE 'different' END AS status,
               FALSE AS auto_apply
        FROM base
        UNION ALL
        SELECT osm_id, 'phone', 'osm_only', TRUE FROM base
        UNION ALL
        SELECT osm_id, 'ref', 'overture_only', FALSE FROM base
        WHERE has2 AND has1
        UNION ALL
        SELECT osm_id, 'website', 'overture_only', TRUE FROM base
        WHERE has2
    """

    blon_min, blat_min, blon_max, blat_max = X.sql_tile_bounds("tx", "ty", 12)
    tile_bounds_sql = f"""
        {matches_cte},
        t AS (
          SELECT osm_id, lon, lat,
                 {X.sql_tile_x('lon', 12)} AS tx,
                 {X.sql_tile_y('lat', 12)} AS ty
          FROM matches
        )
        SELECT osm_id, tx, ty,
               round({blon_min}, 9) AS lon_min,
               round({blat_min}, 9) AS lat_min,
               (lon >= {blon_min} AND lon < {blon_max}
                AND lat > {blat_min} AND lat <= {blat_max}) AS contained
        FROM t
    """

    return {
        "closest_merge": closest_merge_sql,
        "tag_diff": tag_diff_sql,
        "tile_bounds_roundtrip": tile_bounds_sql,
        "struct_roundtrip": struct_roundtrip_sql,
        "det_shuffle": det_shuffle_sql,
        "pip_filter": pip_sql,
        "match_quality": quality_sql,
        "tag_transform": tag_sql,
        "enrich_marked_counts": enrich_sql,
        "seen_store": seen_store_sql,
        "tile_density_drop": tile_drop_sql,
        "exact_dedup": exact_sql,
        "minhash_pairs": minhash_sql,
        "simhash": simhash_sql,
        "ngram_jaccard": ngram_sql,
        "embedding_near_dups": embdup_sql,
        "ann_brute_topk": ann_brute_sql,
        "text_analysis": text_analysis_sql,
        "dedup_clusters": f"""
            {minhash_cte.replace("WITH corpus", "WITH RECURSIVE corpus", 1)},
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM scored WHERE jaccard >= 0.5
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM scored WHERE jaccard >= 0.5
            ),
            comp(node, label) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.src, c.label FROM edges e JOIN comp c ON c.node = e.dst
            ),
            labels AS (SELECT node, min(label) AS cluster_id FROM comp GROUP BY node),
            clustered AS (
              SELECT c.doc_id,
                     coalesce(l.cluster_id, c.doc_id) AS cluster_id,
                     CAST(length(c.text) AS DOUBLE) AS score
              FROM corpus c LEFT JOIN labels l ON l.node = c.doc_id
            )
            SELECT doc_id, cluster_id,
                   cluster_id = doc_id AS survivor_min,
                   (row_number() OVER (
                      PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC
                    ) = 1) AS survivor_best
            FROM clustered
        """,
        "dedup_corpus": f"""
            {minhash_cte.replace("WITH corpus", "WITH RECURSIVE corpus", 1)},
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM scored WHERE jaccard >= 0.5
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM scored WHERE jaccard >= 0.5
            ),
            comp(node, label) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.src, c.label FROM edges e JOIN comp c ON c.node = e.dst
            ),
            labels AS (SELECT node, min(label) AS cluster_id FROM comp GROUP BY node),
            clustered AS (
              SELECT c.doc_id, c.text,
                     coalesce(l.cluster_id, c.doc_id) AS cluster_id,
                     CAST(length(c.text) AS DOUBLE) AS score
              FROM corpus c LEFT JOIN labels l ON l.node = c.doc_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC
              ) AS rn FROM clustered
            )
            SELECT doc_id, text, score FROM ranked WHERE rn = 1
        """,
        "image_features": _image_features_oracle_sql(),
        "image_curation": _image_curation_oracle_sql(),
        "video_frames": _video_frames_oracle_sql(),
        "audio_features": _audio_features_oracle_sql(),
        "phash_near_dups": _phash_near_dups_oracle_sql(),
        "spatial_join": f"""
            {layers}
            SELECT a.osm_id AS a_id, b.id AS b_id,
                   {X.sql_round1(X.sql_planar_distance(X.sql_merc_x('a.lon'), X.sql_merc_y('a.lat'), X.sql_merc_x('b.lon'), X.sql_merc_y('b.lat')))} AS distance_m
            FROM layer_a a JOIN layer_b b ON a.key = b.key
            WHERE {X.sql_planar_distance(X.sql_merc_x('a.lon'), X.sql_merc_y('a.lat'), X.sql_merc_x('b.lon'), X.sql_merc_y('b.lat'))} <= 120.0
        """,
        "dedup_first_arrival": """
            WITH corpus AS (
              SELECT doc_id, text, doc_id * 10 AS ts FROM documents
              UNION ALL
              SELECT doc_id + 500000, text, doc_id * 10 + 1
              FROM documents WHERE doc_id % 3 = 0
            ),
            ranked AS (
              SELECT doc_id, text, ts, md5(text) AS content_hash,
                     row_number() OVER (
                       PARTITION BY md5(text) ORDER BY ts, doc_id
                     ) AS rn
              FROM corpus
            )
            SELECT doc_id, text, ts, content_hash FROM ranked WHERE rn = 1
        """,
        "winnow_pairs": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 250
              UNION ALL
              SELECT doc_id + 100000,
                     array_to_string(list_slice(string_split(text, ' '), 1,
                       len(string_split(text, ' ')) - 2), ' ')
              FROM documents WHERE doc_id < 250
            ),
            gh AS (
              SELECT doc_id, {dd.sql_winnow_gram_hashes('text', 4)} AS h
              FROM corpus
            ),
            fps0 AS (
              SELECT doc_id, unnest({dd.sql_winnow_mins('h', 4)}) AS fp
              FROM gh
            ),
            keep AS (
              SELECT fp FROM fps0 GROUP BY fp HAVING count(*) <= 8
            ),
            fps AS (SELECT f.doc_id, f.fp FROM fps0 f JOIN keep USING (fp))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING count(*) >= 5
        """,
    }


def _event_sessions_sql() -> str:
    from overmatch_spark.streaming.sessions import sql_sessionize_batch

    return f"""
        WITH {sql_sessionize_batch().strip()}
        SELECT user_id, session_idx,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts_us) AS first_us,
               max(ts_us) AS last_us
        FROM sessions GROUP BY user_id, session_idx
    """


def _oracle_sql_round2() -> dict[str, str]:
    from overmatch_spark import demo
    from overmatch_spark import expressions as X
    from overmatch_spark.operators import dedup as dd
    from overmatch_spark.operators.io import sql_geojson_point_feature

    layers = demo.sql_layers_cte()
    matches_cte = f"{layers},{demo.SQL_MATCHES}"
    cats_sql = "[" + ", ".join(f"'{c}'" for c in _TAG_CATS) + "]"
    syn = "syn AS (SELECT c_custkey AS key FROM customer)"
    vocab = demo.SQL_VOCAB_NAME

    key_sql = "CAST(string_split(overture_id, '/')[2] AS BIGINT)"
    props_sql = (
        "concat('{\"osm_id\":\"', osm_id, '\",\"ok\":', "
        f"CAST({key_sql} AS VARCHAR), '}}')"
    )
    geojson_sql = f"""
        {matches_cte}
        SELECT osm_id,
               {sql_geojson_point_feature('lon', 'lat', key_sql, props_sql)}
                 AS feature
        FROM matches
    """

    osmchange_sql = f"""
        WITH {syn}
        SELECT key AS id,
          concat('<osmChange version="0.6"><modify><node id="',
                 CAST(key AS VARCHAR),
                 '" version="', CAST(key % 9 + 1 AS VARCHAR),
                 '" lat="', CAST(key % 170 - 85 AS VARCHAR),
                 '" lon="', CAST(key % 360 - 180 AS VARCHAR), '">',
                 '<tag k="amenity" v="',
                 replace(replace(replace(replace(
                     {cats_sql}[CAST(key % 4 AS INTEGER) + 1],
                     '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                     '"', '&quot;'), '"/>',
                 '<tag k="name" v="',
                 replace(replace(replace(replace({vocab},
                     '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                     '"', '&quot;'), '"/>',
                 '</node></modify></osmChange>') AS xml
        FROM syn
    """

    jsonl_sql = f"""
        WITH {syn}
        SELECT key AS id,
               CASE WHEN key % 11 = 3 THEN NULL ELSE {vocab} END AS name,
               CAST(key * 17 % 1000 AS BIGINT) AS val
        FROM syn
    """

    csv_sql = """
        SELECT CAST(n_nationkey AS BIGINT) AS code,
               n_name AS category,
               concat('r', CAST(n_regionkey AS VARCHAR)) AS region,
               (SELECT max(concat('2025-',
                       lpad(CAST(o_orderkey % 12 + 1 AS VARCHAR), 2, '0'),
                       '.0')) FROM orders) AS latest
        FROM nation
    """

    probe_lookup_sql = f"""
        {matches_cte}
        SELECT osm_id, CAST(count(*) AS BIGINT) AS match_count
        FROM matches
        WHERE osm_id IN (SELECT osm_id FROM layer_a WHERE key % 7 = 0)
        GROUP BY osm_id
    """

    skip_existing_sql = f"""
        {matches_cte}
        SELECT osm_id FROM layer_a
        WHERE osm_id NOT IN (SELECT osm_id FROM matches)
    """

    auto_zoom_sql = f"""
        {matches_cte}
        SELECT CAST(10
                 + (CASE WHEN count(*) > 1000 THEN 2 ELSE 0 END)
                 + (CASE WHEN count(*) > 100000 THEN 2 ELSE 0 END)
                 + (CASE WHEN count(*) > 10000000 THEN 2 ELSE 0 END)
               AS BIGINT) AS max_zoom
        FROM matches
    """

    category_tags_sql = f"""
        WITH {syn}
        SELECT key AS id,
          CASE WHEN key % 6 = 5 OR key % 6 = 4 THEN ''
               WHEN key % 4 = 0 THEN 'amenity=restaurant'
               WHEN key % 4 = 1 THEN 'amenity=bar'
               WHEN key % 4 = 2 THEN 'amenity=cafe;cuisine=coffee_shop'
               ELSE 'shop=bakery' END AS tags
        FROM syn
    """

    planes6 = dd.hyperplanes(6, 64)
    bucket6 = dd.sql_embedding_bucket("v", planes6)
    mp = dd.sql_multiprobe_buckets("v", planes6, 2)
    ann_lsh_sql = f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bk AS (SELECT vec_id, v, {bucket6} AS bucket FROM e),
        sp AS (
          SELECT vec_id AS probe_id, v AS pv, bucket
          FROM bk WHERE vec_id < 5
        ),
        s_scored AS (
          SELECT sp.probe_id, c.vec_id AS cand_id,
                 round({dd.sql_cosine('sp.pv', 'c.v')}, 9) AS cos_sim
          FROM bk c JOIN sp ON c.bucket = sp.bucket
          WHERE c.vec_id != sp.probe_id
        ),
        s_ranked AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id
                 ) AS BIGINT) AS rank
          FROM s_scored
        ),
        pb AS (
          SELECT vec_id AS probe_id, v AS pv, unnest({mp}) AS bucket
          FROM e WHERE vec_id < 5
        ),
        m_scored AS (
          SELECT pb.probe_id, c.vec_id AS cand_id,
                 round({dd.sql_cosine('pb.pv', 'c.v')}, 9) AS cos_sim
          FROM bk c JOIN pb ON c.bucket = pb.bucket
          WHERE c.vec_id != pb.probe_id
        ),
        m_ranked AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id
                 ) AS BIGINT) AS rank
          FROM m_scored
        )
        SELECT probe_id, cand_id, cos_sim, rank, 'lsh' AS variant
        FROM s_ranked WHERE rank <= 5
        UNION ALL
        SELECT probe_id, cand_id, cos_sim, rank, 'multiprobe' AS variant
        FROM m_ranked WHERE rank <= 5
    """

    error_budget_sql = """
        SELECT doc_id, 'ok' AS status FROM documents WHERE doc_id % 97 != 0
    """

    from overmatch_spark.operators.ann import (
        clustered_centers,
        reference_ivf_centroids,
        reference_pq_codebooks,
        sql_clustered_view,
        sql_ivf_assign,
        sql_ivf_probe_list,
        sql_pq_adc,
        sql_pq_codes,
        sql_pq_lut,
    )

    pq_cb = reference_pq_codebooks()
    ann_pq_sql = f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        coded AS (
          SELECT vec_id AS cand_id, {sql_pq_codes('v', pq_cb)} AS codes FROM e
        ),
        pr AS (
          SELECT vec_id AS probe_id, v AS pv, {sql_pq_lut('v', pq_cb)} AS lut
          FROM e WHERE vec_id < 5
        ),
        scored AS (
          SELECT pr.probe_id, coded.cand_id,
                 {sql_pq_adc('codes', 'lut', len(pq_cb))} AS adc
          FROM coded, pr WHERE coded.cand_id != pr.probe_id
        ),
        short AS (
          SELECT probe_id, cand_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY probe_id ORDER BY adc, cand_id
            ) AS srank FROM scored
          ) WHERE srank <= 20
        ),
        rer AS (
          SELECT s.probe_id, s.cand_id,
                 round({dd.sql_cosine('pr2.pv', 'c2.v')}, 9) AS cos_sim
          FROM short s
          JOIN e c2 ON c2.vec_id = s.cand_id
          JOIN (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 5) pr2
            ON pr2.pid = s.probe_id
        ),
        ecq AS (
          SELECT vec_id, {sql_clustered_view('v', 'vec_id')} AS v FROM e
          WHERE vec_id % 2 = 0
        ),
        qcoded AS (
          SELECT vec_id AS cand_id,
                 {sql_ivf_assign('v', clustered_centers())} AS ivf,
                 {sql_pq_codes('v', pq_cb)} AS codes
          FROM ecq
        ),
        qpr AS (
          SELECT vec_id AS probe_id, v AS pv,
                 {sql_pq_lut('v', pq_cb)} AS lut,
                 unnest({sql_ivf_probe_list('v', clustered_centers(), 1)}) AS ivf
          FROM ecq WHERE vec_id < 5
        ),
        qscored AS (
          SELECT qpr.probe_id, qcoded.cand_id,
                 {sql_pq_adc('codes', 'lut', len(pq_cb))} AS adc
          FROM qcoded JOIN qpr ON qcoded.ivf = qpr.ivf
          WHERE qcoded.cand_id != qpr.probe_id
        ),
        qshort AS (
          SELECT probe_id, cand_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY probe_id ORDER BY adc, cand_id
            ) AS srank FROM qscored
          ) WHERE srank <= 20
        ),
        qrer AS (
          SELECT s.probe_id, s.cand_id,
                 round({dd.sql_cosine('pr2.pv', 'c2.v')}, 9) AS cos_sim
          FROM qshort s
          JOIN ecq c2 ON c2.vec_id = s.cand_id
          JOIN (SELECT vec_id AS pid, v AS pv FROM ecq WHERE vec_id < 5) pr2
            ON pr2.pid = s.probe_id
        )
        SELECT probe_id, cand_id, cos_sim, rank, 'pq_flat' AS variant
        FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id
                 ) AS BIGINT) AS rank
          FROM rer
        ) WHERE rank <= 5
        UNION ALL
        SELECT probe_id, cand_id, cos_sim, rank,
               'ivfpq_clustered_np1' AS variant
        FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id
                 ) AS BIGINT) AS rank
          FROM qrer
        ) WHERE rank <= 5
    """

    cents16 = reference_ivf_centroids(16)
    cents64 = reference_ivf_centroids(64)
    centsc = clustered_centers()
    ann_ivf_sql = f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        c16 AS (SELECT vec_id, v, {sql_ivf_assign('v', cents16)} AS ivf FROM e),
        p16 AS (
          SELECT vec_id AS probe_id, v AS pv,
                 unnest({sql_ivf_probe_list('v', cents16, 2)}) AS ivf
          FROM e WHERE vec_id < 5
        ),
        s16 AS (
          SELECT p16.probe_id, c16.vec_id AS cand_id,
                 round({dd.sql_cosine('p16.pv', 'c16.v')}, 9) AS cos_sim
          FROM c16 JOIN p16 ON c16.ivf = p16.ivf
          WHERE c16.vec_id != p16.probe_id
        ),
        r16 AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id
                 ) AS BIGINT) AS rank
          FROM s16
        ),
        eh AS (SELECT * FROM e WHERE vec_id % 2 = 0),
        c64 AS (SELECT vec_id, v, {sql_ivf_assign('v', cents64)} AS ivf FROM eh),
        p64 AS (
          SELECT vec_id AS probe_id, v AS pv,
                 unnest({sql_ivf_probe_list('v', cents64, 8)}) AS ivf
          FROM eh WHERE vec_id < 5
        ),
        s64 AS (
          SELECT p64.probe_id, c64.vec_id AS cand_id,
                 round({dd.sql_cosine('p64.pv', 'c64.v')}, 9) AS cos_sim
          FROM c64 JOIN p64 ON c64.ivf = p64.ivf
          WHERE c64.vec_id != p64.probe_id
        ),
        r64 AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id
                 ) AS BIGINT) AS rank
          FROM s64
        ),
        ec AS (
          SELECT vec_id, {sql_clustered_view('v', 'vec_id')} AS v FROM e
        ),
        cc AS (SELECT vec_id, v, {sql_ivf_assign('v', centsc)} AS ivf FROM ec),
        pc AS (
          SELECT vec_id AS probe_id, v AS pv,
                 unnest({sql_ivf_probe_list('v', centsc, 1)}) AS ivf
          FROM ec WHERE vec_id < 5
        ),
        sc AS (
          SELECT pc.probe_id, cc.vec_id AS cand_id,
                 round({dd.sql_cosine('pc.pv', 'cc.v')}, 9) AS cos_sim
          FROM cc JOIN pc ON cc.ivf = pc.ivf
          WHERE cc.vec_id != pc.probe_id
        ),
        rc AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id
                 ) AS BIGINT) AS rank
          FROM sc
        )
        SELECT probe_id, cand_id, cos_sim, rank, 'ivf16_np2' AS variant
        FROM r16 WHERE rank <= 5
        UNION ALL
        SELECT probe_id, cand_id, cos_sim, rank, 'ivf64_np8' AS variant
        FROM r64 WHERE rank <= 5
        UNION ALL
        SELECT probe_id, cand_id, cos_sim, rank, 'clustered_np1' AS variant
        FROM rc WHERE rank <= 5
    """

    sh3 = dd.sql_shingles("text", 3)
    blocks_case = " ".join(
        f"WHEN {i} THEN {dd.sql_simhash_block('sig', i, 15, 4)}"
        for i in range(4)
    )
    simhash_hamming_sql = f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text || ' zq' FROM documents
        ),
        shing AS (SELECT doc_id, {sh3} AS sh FROM corpus),
        toks AS (SELECT doc_id, {dd.sql_token_hashes('sh')} AS th FROM shing),
        sigs AS (SELECT doc_id, {dd.sql_simhash_from_hashes('th')} AS sig FROM toks),
        blocks AS (
          SELECT doc_id, sig, bi,
                 CASE bi {blocks_case} END AS bv
          FROM sigs, (SELECT unnest(range(4)) AS bi)
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                          l.sig AS sa, r.sig AS sb
          FROM blocks l JOIN blocks r
            ON l.bi = r.bi AND l.bv = r.bv AND l.doc_id < r.doc_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """

    from overmatch_spark.demo import GRID_COLS, SPACING, X0, Y0

    wide_syn = f"""
        syn AS (
          SELECT c_custkey AS key,
            CAST({X0} + {SPACING} * (c_custkey % {GRID_COLS})
                 + ((c_custkey * 7919) % 51 - 25) AS BIGINT) AS xi,
            CAST({Y0} + {SPACING} * CAST((c_custkey - c_custkey % {GRID_COLS})
                 / {GRID_COLS} AS BIGINT)
                 + ((c_custkey * 104729) % 51 - 25) AS BIGINT) AS yi
          FROM customer
        )
    """
    cat = f"{cats_sql}[CAST(key % 4 AS INTEGER) + 1]"
    pip = X.sql_pip("CAST(xi AS DOUBLE)", "CAST(yi AS DOUBLE)", demo.PIP_POLY)
    wide_sql = f"""
        WITH {wide_syn.strip()}
        SELECT
          concat('pl/', CAST(key AS VARCHAR)) AS id,
          CAST(key % 10 AS BIGINT) AS version,
          concat('POINT(', CAST(xi AS VARCHAR), ' ', CAST(yi AS VARCHAR), ')')
            AS geometry,
          to_json({{'xmin': xi - 5, 'ymin': yi - 5,
                    'xmax': xi + 5, 'ymax': yi + 5}})::VARCHAR AS bbox,
          {cat} AS basic_category,
          to_json({{'primary': {cat}, 'alternate': ['food', 'poi']}})::VARCHAR
            AS categories,
          CAST(key % 1000 AS DOUBLE) / 1000.0 AS confidence,
          to_json({{'primary': {vocab}, 'rules': CAST(NULL AS VARCHAR)}})::VARCHAR
            AS names,
          to_json([{{'freeform': concat(CAST(key % 900 + 100 AS VARCHAR), ' Main St'),
                     'country': CASE WHEN key % 5 < 4 THEN 'US' ELSE 'CA' END}}])::VARCHAR
            AS addresses,
          to_json([concat('https://ex', CAST(key AS VARCHAR), '.com')])::VARCHAR
            AS websites,
          to_json([concat('social/', CAST(key AS VARCHAR))])::VARCHAR AS socials,
          to_json([concat('mail', CAST(key AS VARCHAR), '@ex.com')])::VARCHAR
            AS emails,
          to_json([concat('+1-202-555-', CAST(key % 9000 + 1000 AS VARCHAR))])::VARCHAR
            AS phones,
          to_json({{'name': concat('brand', CAST(key % 50 AS VARCHAR))}})::VARCHAR
            AS brand,
          to_json([{{'dataset': 'datasetA',
                     'update_time': '2025-04-02T12:30:15Z'}}])::VARCHAR AS sources
        FROM syn
        WHERE xi - 5 > {X0} AND xi + 5 < {X0 + 200_000}
          AND {cat} IN ('restaurant', 'cafe')
          AND (CASE WHEN key % 5 < 4 THEN 'US' ELSE 'CA' END) = 'US'
          AND (CASE WHEN key % 10 = 7 THEN 'closed' ELSE 'open' END) = 'open'
          AND CAST(key % 1000 AS DOUBLE) / 1000.0 >= 0.05
          AND {pip}
    """

    return {
        "geojson_roundtrip": geojson_sql,
        "osmchange_xml": osmchange_sql,
        "jsonl_roundtrip": jsonl_sql,
        "csv_taxonomy": csv_sql,
        "ann_pq_topk": ann_pq_sql,
        "probe_lookup": probe_lookup_sql,
        "skip_existing": skip_existing_sql,
        "auto_zoom": auto_zoom_sql,
        "category_tags": category_tags_sql,
        "ann_lsh_topk": ann_lsh_sql,
        "ann_ivf_topk": ann_ivf_sql,
        "error_budget": error_budget_sql,
        "simhash_hamming": simhash_hamming_sql,
        "windowed_counts": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                     AS window_start,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        """,
        "event_sessions": _event_sessions_sql(),
        "wide_projection": wide_sql,
    }
