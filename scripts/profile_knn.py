"""kNN profiler under the exact bench config: e2e wall time for N
repeated runs (run 0 includes one-time JIT/codegen; later runs are
steady-state), optionally with the coarse-res chooser pinned.

Usage: python scripts/profile_knn.py [sf_dir] [runs] [--pin-coarse]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    runs = int(args[1]) if len(args) > 1 else 2
    cpus = 32

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

    if "--pin-coarse" in sys.argv:
        knn._choose_coarse_res = lambda b0, cr, mx: cr

    for i in range(runs):
        t0 = time.time()
        run_noop(knn.knn_fallback(a, b, m))
        print(f"knn e2e run{i}: {time.time()-t0:.1f}s", flush=True)
        knn.release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
