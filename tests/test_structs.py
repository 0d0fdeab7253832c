"""F9/F10/F11/K7/W5 struct & misc operator tests."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

NAMES_T = StructType(
    [StructField("primary", StringType()), StructField("rules", StringType())]
)
SOURCES_T = ArrayType(
    StructType(
        [
            StructField("dataset", StringType()),
            StructField("update_time", StringType()),
        ]
    )
)


class TestStructs:
    def test_null_rules(self, spark):
        from overmatch_spark.operators.structs import null_rules

        df = spark.createDataFrame(
            [(("Cafe X", "keep"),)],
            StructType([StructField("names", NAMES_T)]),
        )
        got = df.select(null_rules(F.col("names")).alias("n")).collect()[0]["n"]
        assert got["primary"] == "Cafe X" and got["rules"] is None

    def test_repair_update_time(self, spark):
        from overmatch_spark.operators.structs import repair_update_time

        df = spark.createDataFrame(
            [([("meta", "2024-05-01T00:00:00.000"), ("osm", "2024-05-02T10:11:12Z")],)],
            StructType([StructField("sources", SOURCES_T)]),
        )
        got = df.select(repair_update_time(F.col("sources")).alias("s")).collect()[0][
            "s"
        ]
        assert got[0]["update_time"] == "2024-05-01T00:00:00Z"
        assert got[1]["update_time"] == "2024-05-02T10:11:12Z"

    def test_flatten_struct(self, spark):
        from overmatch_spark.operators.structs import flatten_struct

        df = spark.createDataFrame(
            [(("A", "r1"),)], StructType([StructField("names", NAMES_T)])
        )
        got = flatten_struct(df, "names").toPandas()
        assert list(got.columns) == ["names_primary", "names_rules"]
        assert got["names_primary"][0] == "A"

    def test_osm_change_xml(self, spark):
        from overmatch_spark.operators.structs import osm_change_xml

        df = spark.createDataFrame(
            pd.DataFrame(
                {"id": [42], "v": [3], "lat": ["38.9"], "lon": ["-77.0"]}
            )
        ).withColumn(
            "tags",
            F.create_map(
                F.lit("website"), F.lit("https://x.com"),
                F.lit("amenity"), F.lit("cafe"),
            ),
        )
        got = df.select(
            osm_change_xml(
                F.col("id"), F.col("v"), F.col("lat"), F.col("lon"), F.col("tags")
            ).alias("x")
        ).collect()[0]["x"]
        assert got == (
            '<osmChange version="0.6"><modify><node id="42" version="3" '
            'lat="38.9" lon="-77.0">'
            '<tag k="amenity" v="cafe"/><tag k="website" v="https://x.com"/>'
            "</node></modify></osmChange>"
        )

    def test_osm_change_xml_escapes_attributes(self, spark):
        """Quotes/ampersands/angle brackets are common in OSM names;
        the reference escapes them via xmlbuilder2, so the engine must
        emit well-formed attribute values too."""
        import xml.etree.ElementTree as ET

        from overmatch_spark.operators.structs import osm_change_xml

        df = spark.createDataFrame(
            pd.DataFrame(
                {"id": [7], "v": [1], "lat": ["1.0"], "lon": ["2.0"]}
            )
        ).withColumn(
            "tags",
            F.create_map(
                F.lit("name"), F.lit('Bob\'s "Bar" & <Grill>'),
                F.lit("k&k"), F.lit("a<b"),
            ),
        )
        got = df.select(
            osm_change_xml(
                F.col("id"), F.col("v"), F.col("lat"), F.col("lon"), F.col("tags")
            ).alias("x")
        ).collect()[0]["x"]
        assert 'v="Bob&#39;s &quot;Bar&quot; &amp; &lt;Grill&gt;"'.replace(
            "&#39;", "'"
        ) in got
        assert '<tag k="k&amp;k" v="a&lt;b"/>' in got
        # the proof: a standard XML parser accepts it and round-trips
        # the original values
        node = ET.fromstring(got).find("modify/node")
        tags = {t.get("k"): t.get("v") for t in node.findall("tag")}
        assert tags == {
            "name": 'Bob\'s "Bar" & <Grill>',
            "k&k": "a<b",
        }

    def test_parse_wkt_point_numeric_forms(self, spark):
        """F13 handles the numeric forms real serializers emit —
        scientific notation and signed/bare-decimal coords — and
        rejects malformed tokens (NULL, not a bogus parse)."""
        from overmatch_spark.operators.structs import parse_wkt_point

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "wkt": [
                        "POINT(1e-05 47.6097)",
                        "POINT(+1.5E+2 .5)",
                        "POINT(-77.03 38.9)",
                        "POINT(1.2.3 4)",
                        "garbage",
                    ]
                }
            )
        )
        lon, lat = parse_wkt_point(F.col("wkt"))
        rows = df.select(lon.alias("lon"), lat.alias("lat")).collect()
        assert (rows[0]["lon"], rows[0]["lat"]) == (1e-05, 47.6097)
        assert (rows[1]["lon"], rows[1]["lat"]) == (150.0, 0.5)
        assert (rows[2]["lon"], rows[2]["lat"]) == (-77.03, 38.9)
        assert rows[3]["lon"] is None and rows[4]["lon"] is None

    def test_deterministic_shuffle_stable(self, spark):
        from overmatch_spark.operators.structs import deterministic_shuffle

        df = spark.createDataFrame(
            pd.DataFrame({"id": [str(i) for i in range(50)]})
        )
        o1 = [r["id"] for r in deterministic_shuffle(df, 42, "id").collect()]
        o2 = [
            r["id"]
            for r in deterministic_shuffle(df.repartition(7), 42, "id").collect()
        ]
        assert o1 == o2  # stable across partitionings
        assert o1 != sorted(o1, key=int)  # actually shuffled


class TestFloatsToDecimal:
    """F12 (load_matches.py:44-61): recursive float->Decimal coercion."""

    def _frame(self, spark):
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            MapType,
        )

        schema = StructType(
            [
                StructField("id", IntegerType()),
                StructField("d", DoubleType()),
                StructField("arr", ArrayType(DoubleType())),
                StructField(
                    "st",
                    StructType(
                        [
                            StructField("x", DoubleType()),
                            StructField("tag", StringType()),
                            StructField("ys", ArrayType(DoubleType())),
                        ]
                    ),
                ),
                StructField("m", MapType(StringType(), DoubleType())),
                StructField("s", StringType()),
            ]
        )
        rows = [
            (1, 1.5, [0.25, 2.0], (7.125, "a", [3.5]), {"k": 9.75}, "keep"),
            (2, None, None, None, None, None),
        ]
        return spark.createDataFrame(rows, schema)

    def test_recursive_coercion_and_values(self, spark):
        from decimal import Decimal

        from overmatch_spark.operators.structs import floats_to_decimal

        out = floats_to_decimal(self._frame(spark), precision=18, scale=6)
        sch = {f.name: f.dataType.simpleString() for f in out.schema.fields}
        assert sch["d"] == "decimal(18,6)"
        assert sch["arr"] == "array<decimal(18,6)>"
        assert sch["st"] == (
            "struct<x:decimal(18,6),tag:string,ys:array<decimal(18,6)>>"
        )
        assert sch["m"] == "map<string,decimal(18,6)>"
        assert sch["id"] == "int" and sch["s"] == "string"  # untouched
        r1, r2 = out.orderBy("id").collect()
        assert r1["d"] == Decimal("1.500000")
        assert r1["arr"] == [Decimal("0.250000"), Decimal("2.000000")]
        assert r1["st"]["x"] == Decimal("7.125000")
        assert r1["st"]["tag"] == "a"
        assert r1["st"]["ys"] == [Decimal("3.500000")]
        assert r1["m"]["k"] == Decimal("9.750000")
        # nulls at every level survive (withField keeps struct nullness)
        assert r2["d"] is None and r2["arr"] is None
        assert r2["st"] is None and r2["m"] is None

    def test_cols_limit_and_rounding(self, spark):
        from decimal import Decimal

        from overmatch_spark.operators.structs import floats_to_decimal

        out = floats_to_decimal(
            self._frame(spark), precision=10, scale=1, cols=["d"]
        )
        sch = {f.name: f.dataType.simpleString() for f in out.schema.fields}
        assert sch["d"] == "decimal(10,1)"
        assert sch["arr"] == "array<double>"  # outside cols -> untouched
        # half-away-from-zero, like DuckDB's double->DECIMAL cast
        row = (
            floats_to_decimal(
                spark.range(1).select(
                    F.lit(-7.25).alias("neg"), F.lit(7.25).alias("pos")
                ),
                precision=10,
                scale=1,
            )
            .collect()[0]
        )
        assert row["neg"] == Decimal("-7.3") and row["pos"] == Decimal("7.3")
