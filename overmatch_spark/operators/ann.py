"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k (exact; one broadcast of the probe
set, no shuffle of the corpus). Scale path: hyperplane-LSH bucketing
(operators.dedup.embedding_bucket) so the corpus self-join only
touches same-bucket candidates; at 10^12 scale the bucket column
becomes the table's partition key and probes prune partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from overmatch_spark.operators.dedup import cosine, embedding_bucket, hyperplanes


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each probe. Probes are broadcast; the
    corpus is scanned once, no shuffle until the final per-probe
    top-k (a partial top-k would use F.max_by at scale)."""
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("pv"), F.col("cv")), 9))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cos_sim", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH
    bucket. Recall < 1 by design; the bucket fan-out (probing
    neighboring buckets by flipping low-margin bits) is the standard
    extension and slots in at the `bucket` join."""
    planes = hyperplanes(num_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", embedding_bucket(F.col("cv"), planes))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    ).withColumn("bucket", embedding_bucket(F.col("pv"), planes))
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("pv"), F.col("cv")), 9))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: trained coarse quantizer + cluster-pruned search
# ---------------------------------------------------------------------------

def reference_ivf_centroids(k: int = 16):
    """The repo's pinned IVF quantizers — CHECKED-IN trained artifacts
    (overmatch_spark/artifacts.py), so Spark queries and DuckDB
    oracles share identical centroid literals without any runtime
    dependency on the training file. k=16 is the oracle-checked
    quantizer; k=64 is the production dial (better list concentration
    at equal scan fraction — see BENCH/BASELINE.md recall curve).
    See artifacts.py for provenance, scripts/train_ivf_artifact.py
    for byte-exact regeneration."""
    from overmatch_spark.artifacts import IVF_CENTROIDS, IVF_CENTROIDS_64

    if k == 16:
        return IVF_CENTROIDS
    if k == 64:
        return IVF_CENTROIDS_64
    raise ValueError(f"no pinned quantizer with k={k}")

def train_ivf_centroids(
    vectors: list[list[float]], k: int = 16, iters: int = 5
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over a fixed training sample —
    driver-side numpy, so the centroids become plan LITERALS on any
    engine (the same discipline as dedup.hyperplanes). An IVF coarse
    quantizer is a trained artifact reused across queries/partitions;
    sample-based training is the standard practice at corpus scale.
    Init = first k sample vectors (id order), fixed iteration count —
    no randomness anywhere."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    C = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [[float(v) for v in row] for row in C]


def _sqdist(vec: Column, centroid: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(float(c)) for c in centroid]),
            lambda x, c: (x - c) * (x - c),
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def ivf_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """1-based id of the nearest centroid (ties -> lowest index, the
    same first-occurrence rule as DuckDB list_position)."""
    dists = F.array(*[_sqdist(vec, c) for c in centroids])
    return F.array_position(dists, F.array_min(dists)).cast("int")


def ivf_probe_lists(vec: Column, centroids: list[list[float]],
                    nprobe: int) -> Column:
    """The nprobe nearest centroid ids for a probe vector (sorted by
    (distance, id) — engine-portable determinism)."""
    pairs = F.array_sort(
        F.array(
            *[
                F.struct(
                    _sqdist(vec, c).alias("d"), F.lit(j + 1).alias("j")
                )
                for j, c in enumerate(centroids)
            ]
        )
    )
    return F.transform(F.slice(pairs, 1, nprobe), lambda s: s["j"])


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: the corpus is partitioned by nearest-centroid id
    (at rest this is the table's partition column — probes then prune
    partitions); each probe scans only its nprobe nearest inverted
    lists and re-ranks by exact cosine. Approximate like every IVF;
    recall is the nprobe dial."""
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("ivf", ivf_assign(F.col("cv"), centroids))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    ).withColumn(
        "ivf", F.explode(ivf_probe_lists(F.col("pv"), centroids, nprobe))
    )
    scored = (
        c.join(F.broadcast(p), "ivf")
        .filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("pv"), F.col("cv")), 9))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cos_sim", "rank")
    )


def clustered_view(vec: Column, id_expr: Column, n_clusters: int = 16,
                   spread: int = 4, amp: float = 6.0,
                   scale: float = 0.3) -> Column:
    """Deterministic CLUSTERED view of an embedding column: shrink the
    original (near-isotropic) vector to `scale` noise and add a
    one-hot cluster center (`amp` at coordinate cluster*spread, with
    cluster = id % n_clusters). Models the clustered geometry real
    embedding corpora have — where an IVF quantizer's list pruning
    actually pays (the driver's isotropic vectors provably bound any
    pruning index to recall ≈ scan fraction; see BENCH/BASELINE.md).
    Pure elementwise arithmetic -> identical doubles on any engine."""
    c = (id_expr % n_clusters).cast("int")
    return F.transform(
        vec,
        lambda x, i: x * F.lit(float(scale))
        + F.when(i == c * spread, F.lit(float(amp))).otherwise(F.lit(0.0)),
    )


def sql_clustered_view(vec: str, id_expr: str, n_clusters: int = 16,
                       spread: int = 4, amp: float = 6.0,
                       scale: float = 0.3) -> str:
    """DuckDB twin of clustered_view (1-based list indexing)."""
    return (
        f"list_transform(range(1, len({vec}) + 1), "
        f"i -> {vec}[i] * {float(scale)!r} "
        f"+ CASE WHEN i - 1 = (CAST({id_expr} AS INTEGER) % {n_clusters}) "
        f"* {spread} THEN {float(amp)!r} ELSE 0.0 END)"
    )


def clustered_centers(n_clusters: int = 16, dim: int = 64,
                      spread: int = 4, amp: float = 6.0) -> list[list[float]]:
    """The TRUE centers of the clustered fixture — the exact coarse
    quantizer for it (an IVF quantizer is an offline artifact; for a
    synthetic mixture the analytic centers are the trained result)."""
    return [
        [float(amp) if j == c * spread else 0.0 for j in range(dim)]
        for c in range(n_clusters)
    ]


def sql_sqdist(vec: str, centroid: list[float]) -> str:
    consts = "[" + ", ".join(f"{float(c)!r}" for c in centroid) + "]"
    return (
        f"list_reduce(list_transform(range(1, len({vec}) + 1), "
        f"i -> ({vec}[i] - ({consts})[i]) * ({vec}[i] - ({consts})[i])), "
        f"(s, x) -> s + x)"
    )


def sql_ivf_assign(vec: str, centroids: list[list[float]]) -> str:
    dists = "[" + ", ".join(sql_sqdist(vec, c) for c in centroids) + "]"
    return f"list_position({dists}, list_min({dists}))"


def sql_ivf_probe_list(vec: str, centroids: list[list[float]],
                       nprobe: int) -> str:
    pairs = "[" + ", ".join(
        f"{{'d': {sql_sqdist(vec, c)}, 'j': {j + 1}}}"
        for j, c in enumerate(centroids)
    ) + "]"
    return (
        f"list_transform(list_slice(list_sort({pairs}), 1, {nprobe}), "
        f"s -> s.j)"
    )


def multiprobe_buckets(vec: Column, planes: list[list[int]],
                       extra: int) -> Column:
    """Array of LSH buckets to probe: the base bucket plus `extra`
    single-bit flips of the LOWEST-|margin| hyperplanes — the buckets
    whose sign decision was least certain are exactly the ones a true
    neighbor most plausibly fell into (standard multi-probe LSH). All
    buckets are distinct (distinct single-bit flips), so no candidate
    is scored twice. Margin ties break on plane index for engine-
    portable determinism."""
    dots = [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in hp]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        for hp in planes
    ]
    base = None
    for j, d in enumerate(dots):
        term = (d > 0).cast("long") * F.lit(1 << j).cast("long")
        base = term if base is None else base + term
    margins = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(d).alias("m"), F.lit(j).alias("j"))
                for j, d in enumerate(dots)
            ]
        )
    )
    powers = F.array(*[F.lit(1 << kk).cast("long") for kk in range(len(planes))])
    flips = F.transform(
        F.slice(margins, 1, extra),
        lambda s: base.bitwiseXOR(F.element_at(powers, s["j"] + 1)),
    )
    return F.concat(F.array(base), flips)


def multiprobe_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
    extra: int = 2,
) -> DataFrame:
    """LSH top-k with multi-probe: each probe also searches the
    `extra` neighboring buckets reached by flipping its lowest-margin
    sign bits, closing most of single-bucket LSH's recall cliff for
    (extra+1)x the candidate volume — the corpus side is untouched
    (still one bucket per vector, still partition-prunable at scale)."""
    planes = hyperplanes(num_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", embedding_bucket(F.col("cv"), planes))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    ).withColumn(
        "bucket", F.explode(multiprobe_buckets(F.col("pv"), planes, extra))
    )
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("pv"), F.col("cv")), 9))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed ANN with exact re-rank
# ---------------------------------------------------------------------------

def reference_pq_codebooks():
    """The repo's pinned PQ codebooks (m=8 subvectors x k*=16
    codewords x 8 dims): CHECKED-IN trained artifacts
    (overmatch_spark/artifacts.py, scripts/train_pq_artifact.py for
    byte-exact regeneration). At 10^12-vector scale raw float32
    embeddings (256 B/vec) cannot live in memory; PQ codes (32
    bits/vec here, 64x compression) can — the corpus stores codes,
    search runs asymmetric-distance (ADC) against a per-probe lookup
    table, and only a tiny shortlist touches raw vectors for the
    exact re-rank."""
    from overmatch_spark.artifacts import PQ_CODEBOOKS

    return PQ_CODEBOOKS


def pq_encode(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-subvector nearest-codeword ids (1-based, ties -> lowest,
    the same first-occurrence rule as ivf_assign / DuckDB
    list_position). The stored representation of a corpus vector."""
    dsub = len(codebooks[0][0])
    codes = []
    for j, cb in enumerate(codebooks):
        sub = F.slice(vec, j * dsub + 1, dsub)
        dists = F.array(*[_sqdist(sub, c) for c in cb])
        codes.append(F.array_position(dists, F.array_min(dists)).cast("int"))
    return F.array(*codes)


def pq_lut(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-probe ADC lookup table: lut[j][c] = ||q_j - C_j[c]||^2.
    Computed ONCE per probe (m x k* doubles), so the candidate join
    only does m array lookups + a fixed-order sum per pair."""
    dsub = len(codebooks[0][0])
    return F.array(
        *[
            F.array(
                *[_sqdist(F.slice(vec, j * dsub + 1, dsub), c) for c in cb]
            )
            for j, cb in enumerate(codebooks)
        ]
    )


def pq_adc(codes: Column, lut: Column, m: int) -> Column:
    """Asymmetric PQ distance: sum_j lut[j][codes[j]] — a fixed-order
    explicit sum so any engine reproduces the exact double."""
    terms = [
        F.element_at(F.element_at(lut, j + 1), F.element_at(codes, j + 1))
        for j in range(m)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 20,
) -> DataFrame:
    """PQ-ADC top-k with exact cosine re-rank: the corpus rides the
    candidate scan as 4-bit codes ONLY (at rest, `codes` is the
    stored column and raw vectors live in a separate id-keyed table);
    each probe broadcasts its m x k* ADC lookup table; the ADC
    shortlist (deterministic (adc, cand_id) order) then joins raw
    vectors BY ID for the exact re-rank — the standard
    memory-bounded retrieval stack at 10^12-vector scale.

    PROBE-BATCH BOUND (inherent to flat PQ, not a defect): every
    probe broadcasts one ~1 KB LUT and the ADC scan touches ALL
    corpus codes once per probe batch — cost is
    O(|probes| x |corpus|) code lookups and the broadcast is
    O(|probes| KB). Fine for bounded probe batches (ad-hoc queries,
    re-rank tails, <= ~10k probes); LARGE probe sets belong on
    ivfpq_topk, whose inverted-list pruning bounds the scan to
    nprobe/k_lists of the codes per probe."""
    m = len(codebooks)
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    coded = c.select("cand_id", pq_encode(F.col("cv"), codebooks).alias("codes"))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    ).withColumn("lut", pq_lut(F.col("pv"), codebooks))
    scored = (
        coded.join(F.broadcast(p.select("probe_id", "lut")))
        .filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn("adc", pq_adc(F.col("codes"), F.col("lut"), m))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc").asc(), F.col("cand_id").asc()
    )
    short = (
        scored.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= shortlist)
        .select("probe_id", "cand_id")
    )
    rer = (
        short.join(c, "cand_id")
        .join(p.select("probe_id", "pv"), "probe_id")
        .withColumn("cos_sim", F.round(cosine(F.col("pv"), F.col("cv")), 9))
    )
    w2 = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cos_sim", "rank")
    )


def sql_pq_codes(vec: str, codebooks: list[list[list[float]]]) -> str:
    """DuckDB twin of pq_encode (1-based list_slice/list_position)."""
    dsub = len(codebooks[0][0])
    parts = []
    for j, cb in enumerate(codebooks):
        sub = f"list_slice({vec}, {j * dsub + 1}, {(j + 1) * dsub})"
        dists = "[" + ", ".join(sql_sqdist(sub, c) for c in cb) + "]"
        parts.append(f"CAST(list_position({dists}, list_min({dists})) AS INTEGER)")
    return "[" + ", ".join(parts) + "]"


def sql_pq_lut(vec: str, codebooks: list[list[list[float]]]) -> str:
    """DuckDB twin of pq_lut."""
    dsub = len(codebooks[0][0])
    rows = []
    for j, cb in enumerate(codebooks):
        sub = f"list_slice({vec}, {j * dsub + 1}, {(j + 1) * dsub})"
        rows.append("[" + ", ".join(sql_sqdist(sub, c) for c in cb) + "]")
    return "[" + ", ".join(rows) + "]"


def sql_pq_adc(codes: str, lut: str, m: int) -> str:
    """DuckDB twin of pq_adc (same fixed-order sum)."""
    return " + ".join(f"({lut}[{j + 1}])[({codes})[{j + 1}]]" for j in range(m))


def ivfpq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 20,
) -> DataFrame:
    """IVF + PQ composed — the standard memory-bounded ANN stack
    (FAISS IVFPQ shape): the corpus is stored as (inverted-list id,
    PQ codes) — list id is the partition key at rest (partition
    pruning), codes are 32 bits/vector — so the candidate scan
    touches only nprobe lists and never a raw vector; the ADC
    shortlist re-ranks by exact cosine via the id-keyed join back to
    raw storage. Both quantizers are pinned offline artifacts."""
    m = len(codebooks)
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    coded = c.select(
        "cand_id",
        ivf_assign(F.col("cv"), centroids).alias("ivf"),
        pq_encode(F.col("cv"), codebooks).alias("codes"),
    )
    p = (
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).cast("array<double>").alias("pv"),
        )
        .withColumn("lut", pq_lut(F.col("pv"), codebooks))
        .withColumn(
            "ivf", F.explode(ivf_probe_lists(F.col("pv"), centroids, nprobe))
        )
    )
    scored = (
        coded.join(F.broadcast(p.select("probe_id", "lut", "ivf")), "ivf")
        .filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn("adc", pq_adc(F.col("codes"), F.col("lut"), m))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc").asc(), F.col("cand_id").asc()
    )
    short = (
        scored.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= shortlist)
        .select("probe_id", "cand_id")
    )
    rer = (
        short.join(c, "cand_id")
        .join(
            probes.select(
                F.col(id_col).alias("probe_id"),
                F.col(vec_col).cast("array<double>").alias("pv"),
            ),
            "probe_id",
        )
        .withColumn("cos_sim", F.round(cosine(F.col("pv"), F.col("cv")), 9))
    )
    w2 = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cos_sim", "rank")
    )
