"""Per-round benchmark (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline workload: the conflation engine over layers derived from the
`lineitem` table (600k features at sf0.1 — the largest table), so the
numbers measure the real cell-join + Arrow-kernel path. A warm-up
pass runs first (Python-worker pool spin-up and parquet footer reads
are one-time cluster costs, not workload costs — measured ~18 s for
32 workers in this sandbox). Each headline query runs TWICE and the
min is reported: the first execution of a plan shape pays one-time
JVM JIT + codegen-compile costs (measured 3-6x inflation on this box)
that amortize to zero on any long-running cluster — steady-state is
the scale-relevant quantity. Operators that persist intermediates
(knn, minhash) RELEASE them between timed runs, so every timed run is
a full cold execution; knn additionally reports `knn_warm`, the
repeat execution against a populated cache set, as a separate field
(r3 advisory: cold and warm must not be conflated). Results are
materialized through Spark's noop sink (full execution, no collect
bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

BENCH_TABLE = ("lineitem", None)  # key derived below


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def _note(msg: str) -> None:
    """Phase marker on stderr (the driver parses stdout's JSON only)."""
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.time()

# Soft wall budget: in a clean window the full bench finishes in
# ~5-6 min, but this box's contended windows inflate single runs 3-5x
# (measured: one unsalted-skew run 11.5s clean -> 62.8s contended),
# which can push the total past the driver's wall limit and lose the
# ENTIRE artifact. Past the soft budget, repeat runs and secondary
# recall points are dropped (each drop is marked in the JSON) so the
# primary numbers always land.
SOFT_BUDGET_S = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "400"))


def over_budget() -> bool:
    return time.time() - _T0 > SOFT_BUDGET_S


_SCRIPTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
if _SCRIPTS_DIR not in sys.path:
    sys.path.insert(0, _SCRIPTS_DIR)


def probe_window() -> dict:
    """Light host-window probe recorded alongside the numbers: this
    shared box has contended windows (fsync 9->570 MB/s swings, ALU
    ~14 contended vs ~28 clean Mops), and absolute wall times taken in
    a bad window under-measure the engine. The probe makes the window
    quality visible IN the artifact instead of asking the reader to
    trust the timing conditions. One shared definition
    (window_probe.probe) keeps fields comparable across artifacts."""
    from window_probe import probe

    return probe(mb=32)


def bench_layers(spark, sf_dir, cpus):
    """Conflation layers derived from lineitem (unique key =
    l_orderkey*8 + l_linenumber), repartitioned because the driver's
    parquet is a single split."""
    from overmatch_spark import demo

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k")
    ).repartition(2 * cpus)
    li.createOrReplaceTempView("bench_keys")
    # persist the derived layers: the ~20-expression synthetic
    # derivation is INPUT MATERIALIZATION, not workload — on a real
    # deployment the layers are parquet tables and every query scans
    # the same bytes. Caching makes each timed query start from the
    # same materialized input instead of re-deriving it.
    a = demo.spark_layer_a(spark, sf_dir, None, "k", df=li).persist()
    b = demo.spark_layer_b(spark, sf_dir, None, "k", df=li).persist()
    return a, b


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from overmatch_spark import demo
    from overmatch_spark import expressions as X
    from overmatch_spark.operators.conflate import conflate
    from overmatch_spark.operators.knn import knn_fallback
    from overmatch_spark.session import get_spark
    from overmatch_spark.udfs import indel_sim

    # advisory shuffle size lowered so AQE keeps parallelism on this
    # (deliberately small) benchmark input; at production scale the
    # default 64m advisory is correct and this override is dropped
    # autoBroadcastJoinThreshold=-1: the bench layers are DERIVED from
    # a tiny parquet file, so Catalyst's size estimates are off by
    # ~100x and AQE mis-broadcasts a multi-million-row build side
    # (measured: driver OOM at 4.8M rows, and heavy anti-scaling from
    # single-threaded broadcast build + bandwidth-bound hash probes).
    # Explicit broadcast()/hints are unaffected. On real tables with
    # real stats the default threshold is correct.
    spark = get_spark(
        "overmatch-bench",
        cpus=cpus,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    a, b = bench_layers(spark, sf_dir, cpus)

    # ---- warm-up: spin up the Python worker pool on every core ----
    warm = (
        spark.range(0, 20_000 * cpus, 1, 2 * cpus)
        .withColumn("s", F.col("id").cast("string"))
        .withColumn("w", indel_sim(F.col("s"), F.col("s")))
    )
    run_noop(warm)
    n_features = a.count()

    times = {}

    def best_of(name, make_df, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.time()
            run_noop(make_df())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        _note(f"{name}: {times[name]}s")

    best_of("conflate", lambda: conflate(a, b))

    # downstream queries reuse a cached match table, as a real
    # pipeline would (compute once, fan out)
    m = conflate(a, b).persist()
    m.count()

    best_of(
        "grouped",
        lambda: m.groupBy("osm_id").agg(
            F.count("*").alias("match_count"), F.min("distance_m").alias("min_dist")
        ),
    )

    best_of(
        "tiles",
        lambda: m.select(
            X.tile_x(F.col("lon"), 14).alias("tx"),
            X.tile_y(F.col("lat"), 14).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n")),
    )

    from overmatch_spark.operators import knn as knn_mod

    # knn COLD and WARM reported separately (r3 advisory: best-of runs
    # sharing one caches list let Spark's CacheManager reuse run 1's
    # persisted intermediates, so the reported min was a warm partial
    # re-execution, not a fresh run). Cold = caches released between
    # runs, every run re-executes the full operator; warm = a repeat
    # execution against the populated cache set (the steady state of a
    # pipeline that calls the operator repeatedly in one session).
    # res0=15 (vs the conservative default 16): phase-1 exit radius
    # doubles, cutting the straggler fraction on this corpus density —
    # measured ~15% faster cold (output invariant to res0, golden- and
    # property-tested, incl. the odd-res0 ladder floor)
    knn_kwargs = {"res0": 15}
    knn_cold_runs = []
    for i in range(2):
        caches: list = []
        t0 = time.time()
        run_noop(knn_fallback(a, b, m, caches=caches, **knn_kwargs))
        knn_cold_runs.append(round(time.time() - t0, 3))
        if i == 0:
            knn_mod.release_caches(caches)  # next run is cold too
    times["knn"] = min(knn_cold_runs)
    _note(f"knn cold runs: {knn_cold_runs}")
    t0 = time.time()
    # reuses run 2's caches: steady-state repeat execution
    run_noop(knn_fallback(a, b, m, caches=caches, **knn_kwargs))
    knn_warm = round(time.time() - t0, 3)
    _note(f"knn warm: {knn_warm}s")
    knn_mod.release_caches(caches)

    # LLM-pipeline representative: MinHash+LSH near-dup pairs over the
    # documents table (banded candidate generation + exact-Jaccard
    # verify; band exchange carries ids only)
    from overmatch_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # input materialization, same rationale as the layers
    docs_dup = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    ).persist()
    docs_dup.count()
    # cold both runs: the persisted shingle/token-hash base is
    # OPERATOR work (r3 advisory), so it is released between runs
    mh_runs = []
    for i in range(2):
        mh_caches: list = []
        t0 = time.time()
        run_noop(minhash_lsh_pairs(docs_dup, "text", "doc_id", caches=mh_caches))
        mh_runs.append(round(time.time() - t0, 3))
        if i == 0:
            for df in mh_caches:
                df.unpersist()
    times["minhash_dedup"] = min(mh_runs)
    # warm twin (same policy as knn_warm): repeat against run 2's
    # cached shingle/token-hash base
    t0 = time.time()
    run_noop(minhash_lsh_pairs(docs_dup, "text", "doc_id", caches=mh_caches))
    minhash_warm = round(time.time() - t0, 3)
    for df in mh_caches:
        df.unpersist()
    _note(f"minhash cold runs: {mh_runs}, warm: {minhash_warm}")

    total = round(sum(times.values()), 3)

    # ---- scale rows: conflate-only at 8x and 32x features, min-of-2
    # with a window probe around them (VERDICT r3 #6: same discipline
    # as the headline) ----
    def scale_row(mult: int, runs_n: int):
        li_m = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select(
                (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k0")
            )
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .select((F.col("k0") * F.lit(mult) + F.col("rep")).alias("k"))
            .repartition(2 * cpus)
        )
        # persist the derived layers — the SAME input-materialization
        # rationale as the headline (bench_layers): on a real
        # deployment these are parquet tables and every timed run
        # scans the same bytes; deriving the ~20-expression synthetic
        # input inside the timed window would measure the fixture, not
        # the engine
        am = demo.spark_layer_a(spark, sf_dir, None, "k", df=li_m).persist()
        bm = demo.spark_layer_b(spark, sf_dir, None, "k", df=li_m).persist()
        am.count(), bm.count()
        runs = []
        for i in range(runs_n):
            t0 = time.time()
            run_noop(conflate(am, bm))
            runs.append(round(time.time() - t0, 3))
            _note(f"scale {mult}x run: {runs[-1]}s")
            if over_budget():
                break  # keep what we have; drop marked via runs list
        am.unpersist(), bm.unpersist()
        return runs

    probe_scale_before = probe_window()
    # 3 attempts: this host's contention bursts swing a single 8x run
    # 6s <-> 130s within a minute (measured); min-of-3 materially
    # improves the odds one run lands clean, and the over_budget
    # break keeps bad windows from eating the wall budget
    runs8 = scale_row(8, 3)
    n8, t8 = n_features * 8, min(runs8)
    probe_scale_after = probe_window()
    # the 19.2M-feature (32x) min-of-3 probe-gated record lives in
    # BENCH/BASELINE.md (scripts/bench_scale32.py — measured 260s in a
    # probe-documented degraded window here, which would blow the
    # driver bench's wall budget; the 8x row above is the per-round
    # reproducible scale check)

    # ---- skew row (north rule: salted-repartition for dense urban
    # cells): ~2.7% of BOTH layers piled into ONE ~300 m cell, conflate
    # with and without explicit hot-cell salting, same AQE config both
    # ways (output equality is property-tested in
    # test_conflate_golden.py::test_salt_invariance) ----
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
    )
    from bench_skew import skewed_layers

    from overmatch_spark.operators.conflate import detect_hot_cells

    sk_a, sk_b = skewed_layers(spark, sf_dir, cpus)
    # same input-materialization policy as every other timed row:
    # the timed runs scan persisted layer bytes, not the synthetic
    # derivation + hot remap
    sk_a, sk_b = sk_a.persist(), sk_b.persist()
    sk_a.count(), sk_b.count()
    sk_bb = sk_b.withColumn("x", X.merc_x(F.col("lon"))).withColumn(
        "y", X.merc_y(F.col("lat"))
    )
    # the hot-cell pre-pass is once-per-corpus-version work a real
    # pipeline amortizes, but its cost is REPORTED (skew_detect_sec)
    # so the salted path hides nothing the unsalted path skips
    t0 = time.time()
    hot = detect_hot_cells(sk_bb, res=17, threshold=1000)
    skew_detect = round(time.time() - t0, 3)
    skew_runs_n = 1 if over_budget() else 2
    skew_unsalted = min(
        _timed(lambda: run_noop(conflate(sk_a, sk_b)))
        for _ in range(skew_runs_n)
    )
    _note(f"skew unsalted: {skew_unsalted}s")
    skew_salted = min(
        _timed(
            lambda: run_noop(
                conflate(sk_a, sk_b, hot_cells=hot, salt_factor=16)
            )
        )
        for _ in range(skew_runs_n)
    )
    sk_a.unpersist(), sk_b.unpersist()

    # ---- ANN recall@5 vs brute force (multi-probe closes the LSH
    # recall cliff; VERDICT r1 #6) ----
    from overmatch_spark.operators.ann import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        multiprobe_topk,
        reference_ivf_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = e.filter(F.col("vec_id") < 50)
    truth = brute_force_topk(e, probes, "embedding", "vec_id", k=5).select(
        "probe_id", "cand_id"
    ).persist()
    n_truth = truth.count()

    def recall(df):
        hit = df.select("probe_id", "cand_id").join(
            truth, ["probe_id", "cand_id"], "left_semi"
        ).count()
        return round(hit / n_truth, 4)

    recall_lsh = recall(lsh_topk(e, probes, "embedding", "vec_id", k=5))
    recall_mp = recall(
        multiprobe_topk(e, probes, "embedding", "vec_id", k=5, extra=2)
    )
    recall_ivf = recall(
        ivf_topk(
            e, probes, "embedding", "vec_id", reference_ivf_centroids(),
            k=5, nprobe=2,
        )
    )
    # recall/cost curve (VERDICT r2 #3): candidate volume is
    # nprobe/k_lists of the corpus per probe; the driver embeddings
    # are near-isotropic (recall ~ 1.4-2.4x scan fraction), so the
    # documented >=0.8 dial is the k=64 quantizer at nprobe=32
    c64 = reference_ivf_centroids(64)
    curve = {}
    # primary point first (the documented >=0.8 dial), then the
    # secondary curve points — dropped past the soft budget
    points = [
        ("ivf64_np32", c64, 32),
        ("ivf16_np4", None, 4), ("ivf16_np8", None, 8),
        ("ivf64_np16", c64, 16), ("ivf64_np24", c64, 24),
    ]
    for tag, cents, npb in points:
        if curve and over_budget():
            curve["truncated_bad_window"] = True
            break
        cc = cents if cents is not None else reference_ivf_centroids()
        curve[tag] = {
            "recall_at5": recall(
                ivf_topk(e, probes, "embedding", "vec_id", cc, k=5, nprobe=npb)
            ),
            "scan_frac": round(npb / len(cc), 4),
        }

    # ---- PQ-ADC + exact re-rank: the memory-bounded retrieval stack
    # (corpus rides as 32-bit codes, 64x compression). The re-rank
    # shortlist FRACTION is the dial; two points make the curve ----
    from overmatch_spark.operators.ann import pq_topk, reference_pq_codebooks

    n_corpus = e.count()
    pq_curve = {}
    fracs = (0.10,) if over_budget() else (0.05, 0.10)
    for frac in fracs:
        sl = max(20, int(n_corpus * frac))
        pq_curve[f"rerank_{int(frac * 100)}pct"] = {
            "recall_at5": recall(
                pq_topk(
                    e, probes, "embedding", "vec_id",
                    reference_pq_codebooks(), k=5, shortlist=sl,
                )
            ),
            "shortlist": sl,
        }

    # ---- ANN on CLUSTERED geometry (VERDICT r3 #4): the driver
    # embeddings are near-isotropic, which provably bounds ANY
    # list-pruning index to recall ~ scan fraction; the deterministic
    # clustered view (ann.clustered_view — same vectors, shrunk to
    # noise around 16 analytic centers) shows the dial's real value
    # where real embedding corpora live: high recall at a small scan
    # fraction ----
    from overmatch_spark.operators.ann import clustered_centers, clustered_view

    ecv = e.select(
        "vec_id",
        clustered_view(
            F.col("embedding").cast("array<double>"), F.col("vec_id")
        ).alias("embedding"),
    )
    probes_c = ecv.filter(F.col("vec_id") < 50)
    truth_c = brute_force_topk(ecv, probes_c, "embedding", "vec_id", k=5).select(
        "probe_id", "cand_id"
    ).persist()
    n_truth_c = truth_c.count()
    hits_c = (
        ivf_topk(
            ecv, probes_c, "embedding", "vec_id", clustered_centers(),
            k=5, nprobe=1,
        )
        .select("probe_id", "cand_id")
        .join(truth_c, ["probe_id", "cand_id"], "left_semi")
        .count()
    )
    clustered_ann = {
        "recall_at5": round(hits_c / n_truth_c, 4),
        "scan_frac": round(1 / 16, 4),
    }
    # IVF+PQ composed (FAISS-IVFPQ shape): list pruning AND 64x code
    # compression at once, exact re-rank on the shortlist
    from overmatch_spark.operators.ann import ivfpq_topk

    if over_budget():
        ivfpq_clustered = {"skipped_bad_window": True}
    else:
        hits_ivfpq = (
            ivfpq_topk(
                ecv, probes_c, "embedding", "vec_id", clustered_centers(),
                reference_pq_codebooks(), k=5, nprobe=1, shortlist=50,
            )
            .select("probe_id", "cand_id")
            .join(truth_c, ["probe_id", "cand_id"], "left_semi")
            .count()
        )
        ivfpq_clustered = {
            "recall_at5": round(hits_ivfpq / n_truth_c, 4),
            "scan_frac": round(1 / 16, 4),
            "compression": "64x (32-bit PQ codes)",
        }
    truth_c.unpersist()
    _note("ann sections done")
    print(
        json.dumps(
            {
                "metric": "conflation e2e wall-time (headline: J1-J5 over "
                f"{n_features} features) + grouped/tiles/knn downstream",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": cpus,
                "features": n_features,
                "throughput_features_per_sec": round(
                    n_features / times["conflate"], 1
                ),
                "runs_per_query": 2,
                "timing": (
                    "min of 2; knn/minhash caches RELEASED between runs so "
                    "every timed run is cold (r3 advisory); knn_warm is the "
                    "separately-reported steady-state repeat against a "
                    "populated cache set"
                ),
                "knn_cold_runs": knn_cold_runs,
                "knn_warm": knn_warm,
                "minhash_cold_runs": mh_runs,
                "minhash_warm": minhash_warm,
                "conflate_8x_features": n8,
                "conflate_8x_sec": t8,
                "conflate_8x_runs": runs8,
                "conflate_8x_features_per_sec": round(n8 / t8, 1),
                "soft_budget_s": SOFT_BUDGET_S,
                "elapsed_s": round(time.time() - _T0, 1),
                "scale_probe_before": probe_scale_before,
                "scale_probe_after": probe_scale_after,
                "skew_hot_cells": len(hot),
                "skew_detect_sec": skew_detect,
                "skew_unsalted_sec": skew_unsalted,
                "skew_salted_sec": skew_salted,
                "ann_recall_at5_lsh": recall_lsh,
                "ann_recall_at5_multiprobe": recall_mp,
                "ann_recall_at5_ivf_nprobe2": recall_ivf,
                "ann_recall_curve": curve,
                "ann_dial_recall80": "ivf64 nprobe=32 (recall@5 ~0.88, scans 50% of lists)",
                "ann_pq_recall_curve": pq_curve,
                "ann_pq_note": (
                    "pq_topk: 4-bit/subvector codes (64x compression), "
                    "ADC shortlist + exact cosine re-rank; shortlist "
                    "fraction is the recall dial (isotropic corpus "
                    "bounds ADC signal like every pruning index here)"
                ),
                "ann_clustered_ivf16_np1": clustered_ann,
                "ann_clustered_ivfpq_np1": ivfpq_clustered,
                "ann_clustered_note": (
                    "same ivf_topk operator over the deterministic "
                    "clustered view (ann.clustered_view): recall@5 at "
                    "6.25% scan — the isotropic driver embeddings bound "
                    "any pruning index to recall ~ scan fraction, "
                    "clustered geometry is where the IVF dial pays"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
