"""kNN fallback (SURVEY.md J8 — north-rule extension).

The reference silently drops OSM rows with zero matches
(/root/reference/scripts/match.py:217,229); the north rule adds a
nearest-neighbor fallback for them. Two-phase exact algorithm:

  Phase 1 (bulk): dynamic exact cell cover of the (±edge/2) square at
  a fine resolution (avg ~4 cells/probe — half the shuffle volume of
  a 3x3 cover, same guarantee at radius edge/2). A found minimum
  d <= edge/2 − 2 mm is PROVABLY the global nearest (the cover
  contains the whole disk of radius edge/2, and the −2 mm slack keeps
  every candidate sharing the winner's mm-rounded tie-break key
  inside the cover), so the probe exits.

  Phase 2 (stragglers, ONE build join for both variants):
    2a (hinted) — each straggler's phase-1 candidate distance is a
    per-row upper bound: a dynamic-radius cover at a coarser
    resolution provably contains the true nearest.
    2b (hintless) — a COARSE-CELL HISTOGRAM of the build side
    (occupied cell -> bbox), small enough to broadcast, acts as the
    distributed analog of the reference's R-tree upper levels: each
    probe computes map-side the min/max possible distance to every
    occupied coarse cell and keeps only cells whose min-distance does
    not exceed its best upper bound.
  Both variants emit (probe, candidate-cell, ub) rows; the union
  joins the cached build side ONCE — the build table (id + 2 doubles
  + 2 cell keys) is derived and cached a single time and feeds phase
  1 and phase 2, so no phase re-scans or re-derives the corpus.

The coarse resolution self-tunes (escalates coarser) until the
occupied-cell histogram fits the broadcast budget — at planetary
scale a fixed resolution could exceed driver memory; the escalation
is a one-pass approx_count_distinct over the cached build table and
never changes results (resolution only shapes the physical search).

Naive ring-expansion to coarser cells is NOT used: at coarse
resolutions dense cells make the candidate fan-out quadratic (probes
x cell population) — measured as the difference between a 2e9-row
join and an 18M-row map-side prune at sf0.1.

Tie-break: (rint(dist*1000), id) — millimeter-rounded distance then
lexicographic id, so single-node oracles (numpy spec, DuckDB)
reproduce it without last-ulp ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from overmatch_spark import expressions as X

# mm-rounded tie-break keys differ by < 1 mm; 2 mm slack keeps every
# tied candidate inside any bound/cover derived from a winner
_TIE_SLACK_M = 0.002

# intermediates persisted by knn_fallback; the returned DataFrame is
# lazy and REQUIRES them at action time, so the operator cannot
# unpersist them itself — callers that invoke knn_fallback repeatedly
# in one session (benchmarks, loops) call release_caches() after the
# results are materialized
_PERSISTED: list = []


def release_caches() -> None:
    """Unpersist every intermediate cached by prior knn_fallback
    calls. Only call AFTER the returned DataFrames were materialized
    (or are no longer needed)."""
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def _best_per_probe(cand: DataFrame) -> DataFrame:
    """Exact min with the engine's tie-break rule."""
    return (
        cand.groupBy("osm_id")
        .agg(
            F.min(
                F.struct(
                    F.rint(F.col("dist") * F.lit(1000.0)).alias("dk"),
                    F.col("overture_id").alias("overture_id"),
                    F.col("dist").alias("dist"),
                )
            ).alias("best")
        )
        .select(
            "osm_id",
            F.col("best.overture_id").alias("overture_id"),
            F.col("best.dist").alias("dist"),
        )
    )


def _dynamic_cover(ax, ay, radius, res: int):
    """Exact per-row cell cover of the (x±radius, y±radius) square at
    `res`, with a per-row DYNAMIC radius column — F.sequence makes
    the cover exactly as wide as each probe needs."""
    ix_lo = X.cell_ix(ax - radius, res)
    ix_hi = X.cell_ix(ax + radius, res)
    iy_lo = X.cell_iy(ay + radius, res)
    iy_hi = X.cell_iy(ay - radius, res)
    return F.flatten(
        F.transform(
            F.sequence(ix_lo, ix_hi),
            lambda i: F.transform(
                F.sequence(iy_lo, iy_hi), lambda j: X.cell_id(i, j)
            ),
        )
    )


def _choose_coarse_res(b: DataFrame, coarse_res: int,
                       max_hist_cells: int) -> int:
    """Escalate the coarse resolution until the occupied-cell count
    fits the broadcast budget (one pass over the cached build side,
    all candidate resolutions estimated at once). The scan floor is
    resolution 2 — a 4x4 global grid, at most 16 occupied cells — so
    for any budget >= 16 some resolution ALWAYS fits (within
    approx_count_distinct's ~2-5% accuracy) rather than silently
    overshooting."""
    floor_res = 2
    if coarse_res <= floor_res:
        return coarse_res
    aggs = b.agg(
        *[
            F.approx_count_distinct(
                X.cell_of(F.col("bx"), F.col("by"), r)
            ).alias(f"r{r}")
            for r in range(floor_res, coarse_res + 1)
        ]
    ).first()
    for r in range(coarse_res, floor_res - 1, -1):
        if aggs[f"r{r}"] <= max_hist_cells:
            return r
    return floor_res


def knn_fallback(
    layer_a: DataFrame,
    layer_b: DataFrame,
    matches: DataFrame,
    res0: int = 16,
    coarse_res: int = 13,
    max_hist_cells: int = 300_000,
) -> DataFrame:
    """Nearest layer_b feature for every named layer_a row absent from
    `matches`. Returns (osm_id, overture_id, distance_m).

    Output is invariant to res0/coarse_res/max_hist_cells (they shape
    the physical search only — property- and oracle-tested)."""
    # probes feed phase 1, the straggler anti-join, and phase 2 —
    # persist (narrow: id + 2 doubles per unmatched row). No distinct
    # on the matched-id side: anti-join semantics dedup for free.
    probes = (
        layer_a.filter(F.col("name").isNotNull() & (F.col("name") != ""))
        .join(matches.select("osm_id"), "osm_id", "left_anti")
        .select(
            "osm_id",
            X.merc_x(F.col("lon")).alias("ax"),
            X.merc_y(F.col("lat")).alias("ay"),
        )
        .persist()
    )
    _PERSISTED.append(probes)
    # ONE cached build table (scanned/derived once, reused by every
    # phase; ccell added after the coarse resolution self-tunes)
    b0 = layer_b.select(
        F.col("id").alias("overture_id"),
        X.merc_x(F.col("lon")).alias("bx"),
        X.merc_y(F.col("lat")).alias("by"),
    ).persist()
    _PERSISTED.append(b0)
    coarse_res = _choose_coarse_res(b0, coarse_res, max_hist_cells)
    edge_c = X.cell_edge_m(coarse_res)
    b = b0.withColumn("cell", X.cell_of(F.col("bx"), F.col("by"), res0)).withColumn(
        "ccell", X.cell_of(F.col("bx"), F.col("by"), coarse_res)
    )

    # ---- phase 1: dynamic exact cover at radius edge/2 ----
    r1 = X.cell_edge_m(res0) / 2.0
    probe1 = probes.withColumn(
        "cell",
        F.explode(_dynamic_cover(F.col("ax"), F.col("ay"), F.lit(r1), res0)),
    )
    cand1 = probe1.join(b.select("cell", "overture_id", "bx", "by"), "cell").withColumn(
        "dist",
        X.planar_distance(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
    )
    # best1 feeds BOTH the provable-exit filter and the phase-2 hints;
    # persist it (tiny: <= one row per probe) so the phase-1 join is
    # not recomputed lazily for each consumer
    best1 = _best_per_probe(cand1).persist()
    _PERSISTED.append(best1)
    exit1 = F.lit(r1 - _TIE_SLACK_M)
    done1 = best1.filter(F.col("dist") <= exit1)
    stragglers = probes.join(done1.select("osm_id"), "osm_id", "left_anti")

    # ---- phase 2a: bounded dynamic-cover cells for hinted probes ----
    hints = best1.filter(F.col("dist") > exit1).select(
        "osm_id", (F.col("dist") + F.lit(_TIE_SLACK_M)).alias("ub")
    )
    hinted = stragglers.join(hints, "osm_id")
    bounded = hinted.filter(F.col("ub") <= F.lit(4.0 * edge_c))
    cells2a = bounded.select(
        "osm_id", "ax", "ay", "ub",
        F.explode(
            _dynamic_cover(F.col("ax"), F.col("ay"), F.col("ub"), coarse_res)
        ).alias("ccell"),
    )

    # ---- phase 2b: histogram-pruned cells for the rest ----
    rest = stragglers.join(bounded.select("osm_id"), "osm_id", "left_anti")
    hist = b.groupBy("ccell").agg(F.count("*").alias("n"))
    ix = F.shiftright(F.col("ccell"), 30)
    iy = F.col("ccell") - F.shiftleft(ix, 30).cast("long")
    cells = hist.select(
        "ccell",
        (ix * F.lit(edge_c) - F.lit(X.ORIGIN_M)).alias("xlo"),
        ((ix + 1) * F.lit(edge_c) - F.lit(X.ORIGIN_M)).alias("xhi"),
        (F.lit(X.ORIGIN_M) - (iy + 1) * F.lit(edge_c)).alias("ylo"),
        (F.lit(X.ORIGIN_M) - iy * F.lit(edge_c)).alias("yhi"),
    )
    pc = rest.crossJoin(F.broadcast(cells))
    ddx = F.greatest(F.lit(0.0), F.col("xlo") - F.col("ax"), F.col("ax") - F.col("xhi"))
    ddy = F.greatest(F.lit(0.0), F.col("ylo") - F.col("ay"), F.col("ay") - F.col("yhi"))
    mindist = F.sqrt(ddx * ddx + ddy * ddy)
    mxx = F.greatest(
        F.abs(F.col("xlo") - F.col("ax")), F.abs(F.col("xhi") - F.col("ax"))
    )
    mxy = F.greatest(
        F.abs(F.col("ylo") - F.col("ay")), F.abs(F.col("yhi") - F.col("ay"))
    )
    maxdist = F.sqrt(mxx * mxx + mxy * mxy)
    pc = pc.withColumn("mind", mindist).withColumn("maxd", maxdist)
    w = Window.partitionBy("osm_id")
    # ub = tightest cell max-distance (+ tie slack): the true nearest
    # and all its mm-key ties lie within it
    cells2b = (
        pc.withColumn("ub", F.min("maxd").over(w) + F.lit(_TIE_SLACK_M))
        .filter(F.col("mind") <= F.col("ub"))
        .select("osm_id", "ax", "ay", "ub", "ccell")
    )

    # ---- one build join resolves BOTH straggler variants exactly ----
    cand2 = (
        cells2a.unionByName(cells2b)
        .join(b.select("ccell", "overture_id", "bx", "by"), "ccell")
        .withColumn(
            "dist",
            X.planar_distance(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
        )
        .filter(F.col("dist") <= F.col("ub"))
    )
    done2 = _best_per_probe(cand2)

    return done1.unionByName(done2).select(
        "osm_id", "overture_id", X.round1(F.col("dist")).alias("distance_m")
    )
