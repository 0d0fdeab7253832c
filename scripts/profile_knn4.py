"""Timing of the NEW knn_fallback: e2e twice (variance), then with
the coarse-res chooser pinned (isolate its cost), under bench config.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = "/root/testdata/sf0.1"
    cpus = 32

    from overmatch_spark.operators.conflate import conflate
    from overmatch_spark.operators import knn
    from overmatch_spark.session import get_spark
    from overmatch_spark.udfs import indel_sim
    from bench import bench_layers

    spark = get_spark(
        "knn-profile4",
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

    for i in range(2):
        t0 = time.time()
        run_noop(knn.knn_fallback(a, b, m))
        print(f"knn e2e run{i}: {time.time()-t0:.1f}s", flush=True)

    # pin the chooser
    orig = knn._choose_coarse_res
    knn._choose_coarse_res = lambda b0, cr, mx: cr
    t0 = time.time()
    run_noop(knn.knn_fallback(a, b, m))
    print(f"knn e2e (chooser pinned): {time.time()-t0:.1f}s", flush=True)
    knn._choose_coarse_res = orig

    spark.stop()


if __name__ == "__main__":
    main()
