"""Sources/sinks (SURVEY.md §2.1).

The engine's canonical sink is parquet/Iceberg, but the reference's
interchange formats are JSONL and GeoJSON:
  K1 JSONL sink   — match.py:494-496 (pandas to_json lines)
  S10 JSONL scan  — api/load_matches.py:21-41 (skip blank/malformed)
  K2 GeoJSON sink — enrich_matches_with_dynamodb.py:398-404
GeoJSON features are assembled with explicit string concat (not
to_json) so the byte format is engine-portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_jsonl(df: DataFrame, path: str) -> None:
    """K1: line-delimited JSON (Spark's json writer is JSONL)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S10: JSONL scan; PERMISSIVE mode tolerates malformed lines the
    way the reference's try/except json.loads loop does."""
    r = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def geojson_point_feature(
    lon, lat, feature_id, props_json
) -> F.Column:
    """K2: a GeoJSON Feature string for a point. Explicit concat so
    the bytes are deterministic (fixed key order, %.9f-free: raw
    double repr is engine-specific, so coordinates are rounded to 9
    decimals and rendered via format_number-free casting)."""
    return F.concat(
        F.lit('{"type":"Feature","id":'),
        feature_id.cast("string"),
        F.lit(',"geometry":{"type":"Point","coordinates":['),
        F.round(lon, 9).cast("decimal(13,9)").cast("string"),
        F.lit(","),
        F.round(lat, 9).cast("decimal(12,9)").cast("string"),
        F.lit(']},"properties":'),
        props_json,
        F.lit("}"),
    )


def sql_geojson_point_feature(lon: str, lat: str, feature_id: str,
                              props_json: str) -> str:
    return (
        "concat('{\"type\":\"Feature\",\"id\":', "
        f"CAST({feature_id} AS VARCHAR), "
        "',\"geometry\":{\"type\":\"Point\",\"coordinates\":[', "
        f"CAST(CAST(round({lon}, 9) AS DECIMAL(13,9)) AS VARCHAR), ',', "
        f"CAST(CAST(round({lat}, 9) AS DECIMAL(12,9)) AS VARCHAR), "
        "']},\"properties\":', "
        f"{props_json}, "
        "'}')"
    )


def read_geojson_features(
    spark: SparkSession, path: str, properties_schema: str
) -> DataFrame:
    """S1/S2: GeoJSON FeatureCollection scan -> one row per feature
    with Point lon/lat + typed properties (the reference loads these
    via geopandas at match.py:89-110). multiLine JSON + explode."""
    schema = (
        "type string, features array<struct<"
        "type: string, "
        f"properties: struct<{properties_schema}>, "
        "geometry: struct<type: string, coordinates: array<double>>>>"
    )
    fc = spark.read.option("multiLine", "true").schema(schema).json(path)
    f = fc.select(F.explode("features").alias("f"))
    return f.select(
        F.col("f.properties.*"),
        F.col("f.geometry.coordinates")[0].alias("lon"),
        F.col("f.geometry.coordinates")[1].alias("lat"),
    )


def read_csv_taxonomy(spark: SparkSession, path: str, sep: str = ";") -> DataFrame:
    """S6: delimited taxonomy scan (get_categories.py:12-39)."""
    return spark.read.option("header", "true").option("sep", sep).csv(path)


def latest_release(df: DataFrame, col: str = "release") -> DataFrame:
    """S7/A5: lexicographic max of release prefixes
    (get_latest_overture_release.py:4-10)."""
    return df.agg(F.max(col).alias("latest"))


# ---------------------------------------------------------------------------
# Bucketed layout (co-located joins at rest)
# ---------------------------------------------------------------------------

def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    path: str,
    sort_col: str | None = None,
) -> None:
    """Persist a table BUCKETED on a join key — the at-rest layout
    that lets Spark skip the shuffle on that side of every subsequent
    equi-join on the key (plan-checked in tests: the bucketed scan
    feeds the join with NO Exchange above it). This is the storage
    half of the conflation plan at 100 TB: the corpus layer lives
    bucketed by cell id (with Iceberg, a bucket partition transform),
    so each nightly conflation run shuffles ONLY the probe side.
    `sort_col` additionally sorts within buckets (sort-merge joins
    then skip the sort too). The table stays registered in the
    session catalog after this call (that registration IS the bucket
    metadata — a plain path read loses it); `DROP TABLE` when done,
    the caller owns the data path."""
    w = df.write.mode("overwrite").format("parquet").option("path", path)
    if sort_col is not None:
        w = w.bucketBy(num_buckets, bucket_col).sortBy(sort_col)
    else:
        w = w.bucketBy(num_buckets, bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table registered by write_bucketed (the bucket
    metadata lives in the catalog — a plain parquet path read would
    lose it and reintroduce the shuffle)."""
    return spark.table(table)


def read_sparql_results(
    spark: SparkSession, path: str, id_prefix: str = "https://www.openstreetmap.org/"
) -> DataFrame:
    """S3 (offline half): W3C SPARQL-results-JSON scan -> OSM layer.

    The reference fetches its OSM layer from a QLever SPARQL endpoint
    and post-processes the standard results document
    (`/root/reference/scripts/get_osm_ids.py:40-116`): strip the OSM
    URI prefix from ?id, parse the ?centroid POINT WKT, carry ?name
    and the OPTIONAL ?housenumber. Only the network GET is out of
    scope in this sandbox; THIS function is the entire
    response-processing pipeline, declaratively — multiLine JSON scan
    -> explode(results.bindings) -> regexp WKT parse — over a results
    document stored locally (one file per endpoint page at scale;
    Spark parallelizes across files).

    Bindings missing ?centroid or ?name (SPARQL allows unbound vars)
    are dropped, matching the reference's len(result)>=3 guard."""
    schema = (
        "head struct<vars: array<string>>, "
        "results struct<bindings: array<struct<"
        "id: struct<type: string, value: string>, "
        "name: struct<type: string, value: string>, "
        "housenumber: struct<type: string, value: string>, "
        "centroid: struct<type: string, value: string>>>>"
    )
    doc = spark.read.option("multiLine", "true").schema(schema).json(path)
    b = doc.select(F.explode("results.bindings").alias("b"))
    wkt = F.col("b.centroid.value")
    return (
        b.filter(
            F.col("b.id.value").isNotNull()
            & F.col("b.name.value").isNotNull()
            & wkt.isNotNull()
        )
        .select(
            F.regexp_replace(
                F.col("b.id.value"), "^" + id_prefix, ""
            ).alias("osm_id"),
            F.col("b.name.value").alias("name"),
            F.col("b.housenumber.value").alias("housenumber"),
            F.regexp_extract(wkt, r"POINT\(([-0-9.eE+]+) ", 1)
            .cast("double")
            .alias("lon"),
            F.regexp_extract(wkt, r" ([-0-9.eE+]+)\)", 1)
            .cast("double")
            .alias("lat"),
        )
    )
