"""Stage-by-stage kNN profiling under the exact bench config.

Usage: python scripts/profile_knn.py [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from overmatch_spark import expressions as X
    from overmatch_spark.operators.conflate import conflate
    from overmatch_spark.operators import knn
    from overmatch_spark.session import get_spark
    from overmatch_spark.udfs import indel_sim
    from bench import bench_layers

    spark = get_spark(
        "knn-profile",
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
    print("matches:", m.count(), flush=True)

    t0 = time.time()
    probes = (
        a.filter(F.col("name").isNotNull() & (F.col("name") != ""))
        .join(m.select("osm_id").distinct(), "osm_id", "left_anti")
        .select(
            "osm_id",
            X.merc_x(F.col("lon")).alias("ax"),
            X.merc_y(F.col("lat")).alias("ay"),
        )
        .persist()
    )
    n_probes = probes.count()
    print(f"probes: {n_probes}  ({time.time()-t0:.1f}s)", flush=True)

    bb = b.select(
        F.col("id").alias("overture_id"),
        X.merc_x(F.col("lon")).alias("bx"),
        X.merc_y(F.col("lat")).alias("by"),
    )

    res0 = 16
    edge0 = X.cell_edge_m(res0)
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
    n_cand1 = cand1.count()
    t_cand1 = time.time() - t0
    print(f"phase1 candidates: {n_cand1}  ({t_cand1:.1f}s)", flush=True)

    t0 = time.time()
    best1 = knn._best_per_probe(cand1).persist()
    nb1 = best1.count()
    print(f"best1: {nb1}  ({time.time()-t0:.1f}s)", flush=True)

    done1 = best1.filter(F.col("dist") <= F.lit(edge0))
    print("done1:", done1.count(), flush=True)
    stragglers = probes.join(done1.select("osm_id"), "osm_id", "left_anti")
    print("stragglers:", stragglers.count(), flush=True)

    t0 = time.time()
    out = knn.knn_fallback(a, bb.select(F.col("overture_id").alias("id"),
                                        F.col("bx"), F.col("by")), m) if False else None
    # full operator timing, end to end (fresh, as bench does)
    t0 = time.time()
    run_noop(knn.knn_fallback(a, b, m))
    print(f"knn_fallback e2e: {time.time()-t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
