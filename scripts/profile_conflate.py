"""Scratch profiler: conflate phase isolation at sf0.1 (bench input
shape: persisted derived layers). Not part of the driver contract.

Rows timed via noop (guide §1.4), each min-of-2 after a JIT pass:
  join    — cover explode + cell equi-join only
  dist    — + planar distance filter
  full    — whole operator (adds Arrow similarity UDF + hn filter)
Optionally sweeps res (CONFLATE_RES_SWEEP=16,17,18).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from window_probe import alu_ops

from overmatch_spark import demo
from overmatch_spark import expressions as X
from overmatch_spark.operators.conflate import conflate
from overmatch_spark.session import get_spark
from overmatch_spark.udfs import indel_sim


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed_min2(label, make):
    runs = []
    for _ in range(3):
        t0 = time.time()
        run_noop(make())
        runs.append(round(time.time() - t0, 2))
    print(f"{label}: min {min(runs[1:])} runs {runs} alu {alu_ops():.1f}",
          flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "conflate-profile", cpus=cpus,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k")
    ).repartition(2 * cpus)
    a = demo.spark_layer_a(spark, sf_dir, None, "k", df=li).persist()
    b = demo.spark_layer_b(spark, sf_dir, None, "k", df=li).persist()
    a.count(), b.count()

    warm = (
        spark.range(0, 20_000 * cpus, 1, 2 * cpus)
        .withColumn("s", F.col("id").cast("string"))
        .withColumn("w", indel_sim(F.col("s"), F.col("s")))
    )
    run_noop(warm)
    print(f"alu: {alu_ops():.2f}", flush=True)

    res = 17
    buffer_m = 100.0

    def join_only(with_dist):
        aa = a.filter(
            F.col("name").isNotNull() & (F.col("name") != "")
        ).select(
            "osm_id",
            F.col("name").alias("a_name"),
            F.col("housenumber").alias("a_housenumber"),
            X.merc_x(F.col("lon")).alias("ax"),
            X.merc_y(F.col("lat")).alias("ay"),
        ).withColumn(
            "cell",
            F.explode(X.cover_cells(F.col("ax"), F.col("ay"), res, buffer_m)),
        )
        bb = b.select(
            F.col("id").alias("overture_id"),
            F.col("name").alias("b_name"),
            F.col("housenumber").alias("b_housenumber"),
            F.col("lon").alias("b_lon"),
            F.col("lat").alias("b_lat"),
            X.merc_x(F.col("lon")).alias("bx"),
            X.merc_y(F.col("lat")).alias("by"),
        ).withColumn("cell", X.cell_of(F.col("bx"), F.col("by"), res))
        cand = aa.join(bb, ["cell"], "inner")
        if with_dist:
            d = X.planar_distance(F.col("ax"), F.col("ay"),
                                  F.col("bx"), F.col("by"))
            cand = cand.withColumn("dist", d).filter(
                F.col("dist") <= F.lit(buffer_m))
        return cand

    timed_min2("join only", lambda: join_only(False))
    timed_min2("join+dist", lambda: join_only(True))
    timed_min2("full conflate", lambda: conflate(a, b))
    for r in (int(x) for x in
              os.environ.get("CONFLATE_RES_SWEEP", "").split(",") if x):
        timed_min2(f"full conflate res={r}", lambda r=r: conflate(a, b, res=r))
    spark.stop()


if __name__ == "__main__":
    main()
