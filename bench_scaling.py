"""Scaling-efficiency evidence (BASELINE.json north_rule): the same
conflation job at two parallelism levels — local[8] (N) vs local[32]
(4N) — on the same input, reporting throughput at both plus the
scaling efficiency. The sandbox stand-in for N vs 4N executors per
the driver instruction; writes BENCH/BASELINE.md.

Usage: python bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from overmatch_spark.session import get_spark
from overmatch_spark import demo
from overmatch_spark.operators.conflate import conflate
from overmatch_spark.udfs import indel_sim

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]
spark = get_spark("scaling-%d" % cpus, cpus=cpus,
    extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"})
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
    (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k")
).repartition(2 * cpus)
a = demo.spark_layer_a(spark, sf_dir, None, "k", df=li)
b = demo.spark_layer_b(spark, sf_dir, None, "k", df=li)
warm = (spark.range(0, 20000 * cpus, 1, 2 * cpus)
        .withColumn("s", F.col("id").cast("string"))
        .withColumn("w", indel_sim(F.col("s"), F.col("s"))))
warm.write.format("noop").mode("overwrite").save()
n = a.count()
runs = []
for _ in range(2):
    t0 = time.time()
    conflate(a, b).write.format("noop").mode("overwrite").save()
    runs.append(time.time() - t0)
best = min(runs)
print(json.dumps({"cpus": cpus, "features": n, "sec": round(best, 3),
                  "runs": [round(r, 3) for r in runs],
                  "throughput": round(n / best, 1)}))
spark.stop()
"""


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, REPO=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), sf_dir],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    lo = run_level(8, sf_dir)
    hi = run_level(32, sf_dir)
    eff = (hi["throughput"] / lo["throughput"]) / (32 / 8)
    result = {"N": lo, "4N": hi, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — scaling evidence (north_rule criterion)

Same conflation job (J1-J5 over {lo["features"]} lineitem-derived
features at {sf_dir}), same input, two parallelism levels. local[8]
vs local[32] is the sandbox stand-in for N vs 4N executors (driver
instruction; no real cluster available here). Steady-state timing:
Python-worker pool warmed first, best of 2 runs.

| parallelism | wall (s) | throughput (features/s) |
|---|---|---|
| local[8]  (N)  | {lo["sec"]} | {lo["throughput"]} |
| local[32] (4N) | {hi["sec"]} | {hi["throughput"]} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target >= 0.8 per BASELINE.json north_rule).

Raw: `{json.dumps(result)}`
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
