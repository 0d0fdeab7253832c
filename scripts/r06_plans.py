"""Capture .explain('formatted') for every headline bench query into
plans/r06/<query>_<tag>.txt (tag = before/after). Same session config
as bench.py so the plans match what the driver times.

Usage: python scripts/r06_plans.py <tag>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from pyspark.sql import functions as F


def grab_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from overmatch_spark import demo
    from overmatch_spark import expressions as X
    from overmatch_spark.operators.conflate import conflate
    from overmatch_spark.operators.dedup import minhash_lsh_pairs
    from overmatch_spark.operators.knn import knn_fallback
    from overmatch_spark.session import get_spark

    spark = get_spark(
        "r06-plans", cpus=cpus,
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
    # conflate's plan is captured BEFORE the match table is persisted
    # (bench.py times conflate first, then caches it for the fan-out
    # queries) — once persist() is marked, CacheManager would swap the
    # equal subtree for the cache and hide the join plan
    m = conflate(a, b)
    plans = {}
    plans["conflate"] = grab_plan(m)
    # persisted + materialized like bench.py, so the downstream plans
    # reference the cache (InMemoryRelation) exactly as the driver's
    # timed runs do
    mp = m.persist()
    mp.count()
    plans["grouped"] = mp.groupBy("osm_id").agg(
        F.count("*").alias("match_count"), F.min("distance_m").alias("min_dist")
    )
    plans["tiles"] = (
        mp.select(
            X.tile_x(F.col("lon"), 14).alias("tx"),
            X.tile_y(F.col("lat"), 14).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n"))
    )
    caches: list = []
    plans["knn"] = knn_fallback(a, b, mp, res0=15, caches=caches)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs_dup = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    ).persist()
    docs_dup.count()
    mh_caches: list = []
    plans["minhash_dedup"] = minhash_lsh_pairs(
        docs_dup, "text", "doc_id", caches=mh_caches
    )

    for name, df in plans.items():
        p = df if isinstance(df, str) else grab_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        n_ex = p.count("Exchange")
        n_py = p.count("ArrowEvalPython") + p.count("BatchEvalPython")
        print(f"{name}: {len(p)} bytes, Exchange x{n_ex}, PythonEval x{n_py}"
              f" -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
