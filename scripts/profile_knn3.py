"""Full per-phase kNN timing, warm, with the bench config.

Usage: python scripts/profile_knn3.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = "/root/testdata/sf0.1"
    cpus = 32

    from overmatch_spark import expressions as X
    from overmatch_spark.operators.conflate import conflate
    from overmatch_spark.operators.knn import _best_per_probe, _dynamic_cover
    from overmatch_spark.session import get_spark
    from overmatch_spark.udfs import indel_sim
    from bench import bench_layers

    spark = get_spark(
        "knn-profile3",
        cpus=cpus,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    a, b = bench_layers(spark, sf_dir, cpus)
    warm = (
        spark.range(0, 20_000 * cpus, 1, 2 * cpus)
        .withColumn("s", F.col("id").cast("string"))
        .withColumn("w", indel_sim(F.col("s"), F.col("s")))
    )
    run_noop(warm)
    m = conflate(a, b).persist()
    m.count()

    res0, coarse_res = 16, 13
    edge0 = X.cell_edge_m(res0)
    edge_c = X.cell_edge_m(coarse_res)

    T = {}
    t0 = time.time()
    probes = (
        a.filter(F.col("name").isNotNull() & (F.col("name") != ""))
        .join(m.select("osm_id"), "osm_id", "left_anti")
        .select(
            "osm_id",
            X.merc_x(F.col("lon")).alias("ax"),
            X.merc_y(F.col("lat")).alias("ay"),
        )
        .persist()
    )
    probes.count()
    T["probes"] = time.time() - t0

    bb = b.select(
        F.col("id").alias("overture_id"),
        X.merc_x(F.col("lon")).alias("bx"),
        X.merc_y(F.col("lat")).alias("by"),
    )
    t0 = time.time()
    probe1 = probes.withColumn(
        "cell",
        F.explode(
            F.array(
                *[
                    X.cell_id(
                        X.cell_ix(F.col("ax"), res0) + F.lit(dx),
                        X.cell_iy(F.col("ay"), res0) + F.lit(dy),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ),
    )
    build1 = bb.withColumn("cell", X.cell_of(F.col("bx"), F.col("by"), res0))
    cand1 = probe1.join(build1, "cell").withColumn(
        "dist",
        X.planar_distance(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
    )
    best1 = _best_per_probe(cand1).persist()
    best1.count()
    T["phase1"] = time.time() - t0

    t0 = time.time()
    done1 = best1.filter(F.col("dist") <= F.lit(edge0)).persist()
    done1.count()
    stragglers = probes.join(done1.select("osm_id"), "osm_id", "left_anti").persist()
    ns = stragglers.count()
    T["stragglers"] = time.time() - t0

    build2 = bb.withColumn("ccell", X.cell_of(F.col("bx"), F.col("by"), coarse_res))
    t0 = time.time()
    hints = best1.filter(F.col("dist") > F.lit(edge0)).select(
        "osm_id", (F.col("dist") + F.lit(0.002)).alias("ub")
    )
    hinted = stragglers.join(hints, "osm_id")
    bounded = hinted.filter(F.col("ub") <= F.lit(4.0 * edge_c)).persist()
    nb = bounded.count()
    cand2a = (
        bounded.withColumn(
            "ccell",
            F.explode(
                _dynamic_cover(F.col("ax"), F.col("ay"), F.col("ub"), coarse_res)
            ),
        )
        .join(build2, "ccell")
        .withColumn(
            "dist",
            X.planar_distance(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
        )
        .filter(F.col("dist") <= F.col("ub"))
    )
    n2a = cand2a.count()
    done2a = _best_per_probe(cand2a)
    run_noop(done2a)
    T["phase2a"] = time.time() - t0

    t0 = time.time()
    strag2 = stragglers.join(bounded.select("osm_id"), "osm_id", "left_anti")
    hist = build2.groupBy("ccell").agg(F.count("*").alias("n"))
    ix = F.shiftright(F.col("ccell"), 30)
    iy = F.col("ccell") - F.shiftleft(ix, 30).cast("long")
    cells = hist.select(
        "ccell",
        (ix * F.lit(edge_c) - F.lit(X.ORIGIN_M)).alias("xlo"),
        ((ix + 1) * F.lit(edge_c) - F.lit(X.ORIGIN_M)).alias("xhi"),
        (F.lit(X.ORIGIN_M) - (iy + 1) * F.lit(edge_c)).alias("ylo"),
        (F.lit(X.ORIGIN_M) - iy * F.lit(edge_c)).alias("yhi"),
    )
    pc = strag2.crossJoin(F.broadcast(cells))
    ddx = F.greatest(F.lit(0.0), F.col("xlo") - F.col("ax"), F.col("ax") - F.col("xhi"))
    ddy = F.greatest(F.lit(0.0), F.col("ylo") - F.col("ay"), F.col("ay") - F.col("yhi"))
    mindist = F.sqrt(ddx * ddx + ddy * ddy)
    mxx = F.greatest(F.abs(F.col("xlo") - F.col("ax")), F.abs(F.col("xhi") - F.col("ax")))
    mxy = F.greatest(F.abs(F.col("ylo") - F.col("ay")), F.abs(F.col("yhi") - F.col("ay")))
    maxdist = F.sqrt(mxx * mxx + mxy * mxy)
    pc = pc.withColumn("mind", mindist).withColumn("maxd", maxdist)
    w = Window.partitionBy("osm_id")
    chosen = pc.withColumn("ub", F.min("maxd").over(w)).filter(
        F.col("mind") <= F.col("ub") + F.lit(0.002)
    ).select("osm_id", "ax", "ay", "ccell")
    cand2 = chosen.join(build2, "ccell").withColumn(
        "dist",
        X.planar_distance(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
    )
    done2 = _best_per_probe(cand2)
    run_noop(done2)
    T["phase2b"] = time.time() - t0

    t0 = time.time()
    out = (
        done1.unionByName(done2a)
        .unionByName(done2)
        .select("osm_id", "overture_id", X.round1(F.col("dist")).alias("distance_m"))
    )
    run_noop(out)
    T["final_union"] = time.time() - t0

    print(f"stragglers={ns} bounded={nb} cand2a={n2a}")
    for k, v in T.items():
        print(f"{k}: {v:.1f}s")
    print(f"total: {sum(T.values()):.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
