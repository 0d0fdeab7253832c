"""Isolate why simple kNN stages are slow under the bench config.

Times the probes anti-join and phase-1 join under config variations.
Usage: python scripts/profile_knn2.py [variant]
  variant: base | nocoalesce | parts64 | broadcast
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    sf_dir = "/root/testdata/sf0.1"
    cpus = 32

    from overmatch_spark import expressions as X
    from overmatch_spark.operators.conflate import conflate
    from overmatch_spark.session import get_spark
    from overmatch_spark.udfs import indel_sim
    from bench import bench_layers

    conf = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    if variant == "nocoalesce":
        conf["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
    if variant == "noaqe":
        conf["spark.sql.adaptive.enabled"] = "false"

    spark = get_spark("knn-profile2", cpus=cpus, extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    a, b = bench_layers(spark, sf_dir, cpus)

    warm = (
        spark.range(0, 20_000 * cpus, 1, 2 * cpus)
        .withColumn("s", F.col("id").cast("string"))
        .withColumn("w", indel_sim(F.col("s"), F.col("s")))
    )
    run_noop(warm)

    m = conflate(a, b).persist()
    t0 = time.time()
    print("matches:", m.count(), f"({time.time()-t0:.1f}s)", flush=True)

    # --- step 1: the probes anti-join ---
    t0 = time.time()
    named = a.filter(F.col("name").isNotNull() & (F.col("name") != ""))
    mid = m.select("osm_id").distinct()
    if variant == "broadcast":
        probes0 = named.join(F.broadcast(mid), "osm_id", "left_anti")
    else:
        probes0 = named.join(mid, "osm_id", "left_anti")
    probes = probes0.select(
        "osm_id",
        X.merc_x(F.col("lon")).alias("ax"),
        X.merc_y(F.col("lat")).alias("ay"),
    ).persist()
    n = probes.count()
    print(f"probes: {n} ({time.time()-t0:.1f}s)", flush=True)

    # --- step 2: named-only anti-join without trig ---
    t0 = time.time()
    p2 = named.select("osm_id").join(mid, "osm_id", "left_anti")
    run_noop(p2)
    print(f"anti-join only: ({time.time()-t0:.1f}s)", flush=True)

    # --- step 3: trig only ---
    t0 = time.time()
    p3 = named.select(X.merc_x(F.col("lon")).alias("ax"))
    run_noop(p3)
    print(f"trig only: ({time.time()-t0:.1f}s)", flush=True)

    # --- step 4: phase-1 join ---
    res0 = 16
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
    bb = b.select(
        F.col("id").alias("overture_id"),
        X.merc_x(F.col("lon")).alias("bx"),
        X.merc_y(F.col("lat")).alias("by"),
    )
    build1 = bb.withColumn("cell", X.cell_of(F.col("bx"), F.col("by"), res0))
    cand1 = probe1.join(build1, "cell").withColumn(
        "dist",
        X.planar_distance(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
    )
    from overmatch_spark.operators.knn import _best_per_probe

    best1 = _best_per_probe(cand1)
    run_noop(best1)
    print(f"phase1 join+best: ({time.time()-t0:.1f}s)", flush=True)
    print("conf:", variant, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
