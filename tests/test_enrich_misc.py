"""Coverage for the smaller serving/tiling/io operators (J7, A1, W4,
S6, F20) not otherwise exercised by the oracle harness."""

import pandas as pd
from pyspark.sql import functions as F


def _matches(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "osm_id": ["node/1", "node/1", "node/2", "node/3"],
                "overture_id": ["ov/a", "ov/b", "ov/c", "ov/d"],
                "distance_m": [5.0, 50.0, 12.0, 90.0],
                "similarity": [1.0, 0.8, 0.7, 0.6],
            }
        )
    )


class TestEnrichMisc:
    def test_group_matches_shape(self, spark):
        from overmatch_spark.operators.enrich import group_matches

        g = group_matches(_matches(spark)).toPandas().set_index("osm_id")
        assert g.loc["node/1", "match_count"] == 2
        # collected structs sorted by (distance_m, ...) — closest first
        assert g.loc["node/1", "matches"][0]["overture_id"] == "ov/a"

    def test_probe_ids_broadcast_semi(self, spark):
        from overmatch_spark.operators.enrich import group_matches, probe_ids

        g = group_matches(_matches(spark))
        req = spark.createDataFrame(
            pd.DataFrame({"osm_id": ["node/2", "node/9"]})
        )
        got = probe_ids(g, req).toPandas()
        assert got["osm_id"].tolist() == ["node/2"]

    def test_with_quality_bounds(self, spark):
        from overmatch_spark.operators.enrich import with_quality

        q = with_quality(_matches(spark)).toPandas()
        assert (q["quality"] >= 0).all() and (q["quality"] <= 100).all()
        # exact formula spot-check: sim=1.0, d=5 -> 60 + 40*0.95 = 98
        assert abs(q.loc[0, "quality"] - 98.0) < 1e-9

    def test_auto_max_zoom_thresholds(self, spark):
        from overmatch_spark.operators.tiles import auto_max_zoom

        assert auto_max_zoom(_matches(spark)) == 10  # 4 features
        big = spark.range(0, 2000).withColumn("x", F.lit(1))
        assert auto_max_zoom(big) == 12

    def test_read_csv_taxonomy(self, spark, tmp_path):
        from overmatch_spark.operators.io import read_csv_taxonomy

        p = tmp_path / "tax.csv"
        p.write_text("code;label\nrestaurant;Restaurant\ncafe;Cafe\n")
        got = read_csv_taxonomy(spark, str(p)).toPandas()
        assert got["code"].tolist() == ["restaurant", "cafe"]

    def test_tag_diff_and_auto_apply(self, spark):
        from overmatch_spark.operators.enrich import auto_apply_keys, tag_diff

        osm = spark.createDataFrame(
            pd.DataFrame({"osm_id": ["node/1"]})
        ).withColumn(
            "tags",
            F.create_map(
                F.lit("amenity"), F.lit("cafe"), F.lit("name"), F.lit("X")
            ),
        )
        merged = spark.createDataFrame(
            pd.DataFrame({"osm_id": ["node/1"]})
        ).withColumn(
            "merged_tags",
            F.create_map(
                F.lit("amenity"), F.lit("restaurant"),
                F.lit("website"), F.lit("https://x"),
            ),
        )
        d = auto_apply_keys(tag_diff(osm, merged)).toPandas().set_index("key")
        assert d.loc["amenity", "status"] == "different"
        assert d.loc["name", "status"] == "osm_only"
        assert d.loc["website", "status"] == "overture_only"
        assert bool(d.loc["website", "auto_apply"]) is True
        assert bool(d.loc["amenity", "auto_apply"]) is False
        # W6: "different" rows sort before same-key lexicographic
        assert d.index.tolist()[0] == "amenity"
