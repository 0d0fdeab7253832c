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
