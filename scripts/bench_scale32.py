"""19.2M-feature (32x) conflation scale row, min-of-3 + window-probe
discipline (VERDICT r3 #6: same methodology as the 600k headline).

Runs OUTSIDE the driver bench: a single 19.2M conflation takes
60-260 s depending on the host window, which would blow bench.py's
wall budget; bench.py carries the 8x (4.8M) min-of-2 row as the
per-round reproducible scale check and this script records the 32x
record in BENCH/BASELINE.md. Probe fields make the window quality
part of the artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from window_probe import probe


def main():
    from overmatch_spark import demo
    from overmatch_spark.operators.conflate import conflate
    from overmatch_spark.session import get_spark
    from overmatch_spark.udfs import indel_sim

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    probe_before = probe(mb=32)

    spark = get_spark(
        "overmatch-scale32",
        cpus=cpus,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    mult = 32
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k0"))
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        .select((F.col("k0") * F.lit(mult) + F.col("rep")).alias("k"))
        .repartition(2 * cpus)
    )
    # persisted input layers — same input-materialization rationale as
    # bench.py's headline: timed runs scan materialized input bytes,
    # not the synthetic 20-expression derivation
    a = demo.spark_layer_a(spark, sf_dir, None, "k", df=li).persist()
    b = demo.spark_layer_b(spark, sf_dir, None, "k", df=li).persist()
    warm = (
        spark.range(0, 20_000 * cpus, 1, 2 * cpus)
        .withColumn("s", F.col("id").cast("string"))
        .withColumn("w", indel_sim(F.col("s"), F.col("s")))
    )
    warm.write.format("noop").mode("overwrite").save()
    n = a.count()
    b.count()

    runs = []
    for i in range(3):
        t0 = time.time()
        conflate(a, b).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 2))
        print(f"run{i}: {runs[-1]}s", file=sys.stderr, flush=True)
    spark.stop()
    probe_after = probe(mb=32)

    best = min(runs)
    result = {
        "features": n,
        "runs": runs,
        "sec": best,
        "throughput_features_per_sec": round(n / best, 1),
        "cpus": cpus,
        "probe_before": probe_before,
        "probe_after": probe_after,
        "good_cpu_window": bool(
            probe_before["alu_mops"] > 24 and probe_after["alu_mops"] > 24
        ),
    }
    print(json.dumps(result))
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"""
## 19.2M-feature (32x) scale row — min-of-3, window-probed

Same conflation (J1-J5), lineitem keys x32 = {n:,} features,
local[{cpus}]. Runs {runs} -> best {best} s
({result["throughput_features_per_sec"]:,} features/s). Probe before
{probe_before} / after {probe_after}
(clean window = alu > 24 Mops on both: {result["good_cpu_window"]}).

Raw: `{json.dumps(result)}`
"""
        )
    print("appended BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
