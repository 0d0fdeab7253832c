"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's own operator set (its dedup surface is only
the anti-join resume, D1/J9), a 10^12-row corpus engine needs
content dedup. All variants below are DataFrame combinators whose
hashes are engine-portable (md5-derived 60-bit ints), so every one of
them has an exact DuckDB oracle.

Scale notes:
  - exact_dedup: one shuffle on the content hash.
  - minhash_lsh: the classic shingle -> minhash -> band -> bucket
    self-join. Candidate generation is |bands| shuffles of (band_key);
    verification (exact Jaccard) touches only bucket-colliding pairs.
  - simhash: one 60-bit signature per doc, bucket by signature
    (optionally by rotated prefixes for hamming<=k).
  - embedding LSH: random-hyperplane sign buckets (hyperplanes are
    Python-side md5-derived constants — identical plan constants on
    any engine), cosine verification inside buckets only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Portable hashing: 60-bit int from md5 (identical in Spark & DuckDB)
# ---------------------------------------------------------------------------

def h60(col: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_h60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content; one shuffle on the
    content hash (the hash, not the text, is the shuffle key — at
    corpus scale the payload stays put until the winner is known)."""
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Word shingles
# ---------------------------------------------------------------------------

def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles; docs shorter than k words contribute
    the whole text as one shingle."""
    words = F.split(text, " ")
    n = F.size(words)
    kgrams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    return F.array_distinct(F.when(n >= k, kgrams).otherwise(F.array(text)))


def sql_shingles(text: str, k: int = 3) -> str:
    words = f"string_split({text}, ' ')"
    return (
        f"list_distinct(CASE WHEN len({words}) >= {k} THEN "
        f"list_transform(range(1, len({words}) - {k - 2}), "
        f"i -> array_to_string(list_slice({words}, i, i + {k - 1}), ' ')) "
        f"ELSE [{text}] END)"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

# Minhash permutation space: largest prime < 2^30. a*h + b stays
# under 2^60 for h, a, b < P — exact int64 arithmetic in BOTH engines
# (DuckDB BIGINT errors on overflow rather than wrapping, so the
# bound is what makes the SQL twin byte-identical, not just close).
P_MINHASH = 1_073_741_789


def _minhash_perm_consts(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) permutation constants — md5-derived
    plan literals, identical on any engine/host (a_j != 0)."""
    import hashlib

    out = []
    for j in range(num_hashes):
        a = (
            int(hashlib.md5(f"minhash-a-{j}".encode()).hexdigest()[:15], 16)
            % (P_MINHASH - 1)
        ) + 1
        b = int(
            hashlib.md5(f"minhash-b-{j}".encode()).hexdigest()[:15], 16
        ) % P_MINHASH
        out.append((a, b))
    return out


def minhash_token_hashes(sh: Column) -> Column:
    """ONE portable md5 per shingle, reduced into the permutation
    space. The num_hashes minhash values are then cheap integer
    permutations of these — not num_hashes separate string hashes
    per shingle (the naive form costs 16 md5s per shingle; this is
    the classic universal-hashing minhash and is ~10x cheaper in the
    kernel)."""
    return F.transform(sh, lambda t: h60(t) % F.lit(P_MINHASH))


def minhash_signature_from_hashes(th: Column, num_hashes: int) -> Column:
    """Array of num_hashes minhash values from a token-hash array:
    min over tokens of (a_j * h + b_j) mod P."""

    def perm_min(a: int, b: int) -> Column:
        # single-arg lambda: pyspark dispatches higher-order-function
        # lambdas by parameter count, so constants must be closed
        # over, not passed as defaulted parameters
        return F.array_min(
            F.transform(
                th, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(P_MINHASH)
            )
        )

    return F.array(
        *[perm_min(a, b) for a, b in _minhash_perm_consts(num_hashes)]
    )


def minhash_signature(sh: Column, num_hashes: int) -> Column:
    """Array of num_hashes minhash values over a shingle array.
    Prefer materializing minhash_token_hashes once (as
    minhash_lsh_pairs does) so the md5 runs once per shingle."""
    return minhash_signature_from_hashes(minhash_token_hashes(sh), num_hashes)


def sql_minhash_token_hashes(sh: str) -> str:
    return f"list_transform({sh}, t -> ({sql_h60('t')} % {P_MINHASH}))"


def sql_minhash_sig_item(th: str, j: int) -> str:
    a, b = _minhash_perm_consts(j + 1)[j]
    return (
        f"list_min(list_transform({th}, "
        f"h -> ({a} * h + {b}) % {P_MINHASH}))"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.7,
    shingle_k: int = 3,
    caches: list | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded minhash, verified with
    exact shingle Jaccard. Returns (id_a, id_b, jaccard) with
    id_a < id_b.

    `caches`: when given, the (doc_id, shingles, token-hashes) base
    is persisted into it (caller unpersists after materializing) so
    the shingle/string work runs ONCE instead of once per consumer
    (signature + each verify side). Without it the attach sides
    recompute only the shingles (column pruning drops the hashes)."""
    num_hashes = bands * rows_per_band
    # Scale-adaptive parallelism floor: the shingle + per-shingle md5
    # pass is the operator's dominant map-side compute, and it runs at
    # the INPUT's partitioning — a small parquet scan (or narrow
    # union) arrives in 1-2 partitions, serializing the whole pass on
    # 1-2 cores (measured: ~32x underuse at sf0.1). Repartitioning a
    # small input up to the default parallelism costs one tiny
    # round-robin exchange of raw text; inputs already wider than the
    # core count (the 100 TB case) are left untouched, so no payload
    # shuffle is ever added at scale.
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    base = src.select(
        F.col("doc_id"),
        shingles(F.col(text_col), shingle_k).alias("sh"),
    ).withColumn("th", minhash_token_hashes(F.col("sh")))
    if caches is not None:
        base = base.persist()
        caches.append(base)
    sig = base.withColumn(
        "sig", minhash_signature_from_hashes(F.col("th"), num_hashes)
    )

    # Candidate generation carries ONLY (band, key, doc_id): the
    # shingle arrays must NOT ride the band self-join — that would
    # shuffle every doc's shingles `bands` times. They are re-attached
    # by id-join below, exactly once per side (the same attach_payload
    # discipline as conflate.py).
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    left = banded.select("band", "key", F.col("doc_id").alias("id_a"))
    right = banded.select("band", "key", F.col("doc_id").alias("id_b"))
    cand_ids = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    # exact-Jaccard verification: shingles attached by id, once
    sh_a = base.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    cand = cand_ids.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / union, 9))
        .filter(F.col("jaccard") >= F.lit(jaccard_threshold))
        .select("id_a", "id_b", "jaccard")
    )


def dedup_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.7,
    shingle_k: int = 3,
    score_col: str | None = None,
    caches: list | None = None,
) -> DataFrame:
    """The one-call corpus dedup a pipeline user actually runs:
    MinHash+LSH near-dup pairs -> connected components -> survivor
    per cluster (min-id, or keep-best via `score_col` on `df`) ->
    the SURVIVING ROWS of `df`, all columns intact. Composes the
    verified operators; the survivor semi-join carries ids only, so
    payload columns never shuffle."""
    pairs = minhash_lsh_pairs(
        df, text_col, id_col,
        bands=bands, rows_per_band=rows_per_band,
        jaccard_threshold=jaccard_threshold, shingle_k=shingle_k,
        caches=caches,
    )
    if score_col is not None:
        nodes = df.select(F.col(id_col).alias("doc_id"), F.col(score_col))
    else:
        nodes = df.select(F.col(id_col).alias("doc_id"))
    clusters = dedup_clusters(pairs, nodes=nodes, score_col=score_col)
    survivors = clusters.filter(F.col("survivor")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(survivors, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling k-gram hashes + window-min selection)
# ---------------------------------------------------------------------------

def winnow_hashes(text: Column, k: int = 4, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    the MOSS scheme) over WORD k-grams: hash every ORDERED k-gram
    (position matters — unlike `shingles`, no distinct before
    windowing), then keep the minimum hash of each sliding window of
    w consecutive grams — any shared span of >= k + w - 1 words
    between two documents is GUARANTEED to share a fingerprint.
    Returns the sorted distinct fingerprint array (~n_words/w values
    per doc). MOSS instantiates this over char grams; corpus
    pipelines use word grams (an order of magnitude fewer hash
    positions for the same guarantee granularity). Docs shorter than
    k words contribute the whole text as one gram; fewer than w
    grams form one window.

    Convenience single-expression form — for anything beyond a few
    rows, STAGE it (winnow_gram_hashes into a materialized column,
    then winnow_mins) as winnow_pairs does; see winnow_mins on the
    quadratic re-evaluation otherwise."""
    return winnow_mins(winnow_gram_hashes(text, k), w)


def winnow_gram_hashes(text: Column, k: int = 4) -> Column:
    """Ordered word k-gram hash array (the rolling-hash stream)."""
    words = F.split(text, " ")
    nw = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), nw - F.lit(k - 1))),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    return F.transform(grams, lambda g: h60(g) % F.lit(P_MINHASH))


def winnow_mins(hashes: Column, w: int = 4) -> Column:
    """Window-min selection over a gram-hash array column. Feed a
    MATERIALIZED column (winnow_pairs stages it with withColumn):
    Catalyst does not CSE array subexpressions across higher-order
    lambdas, so inlining the gram hashing here re-evaluates the whole
    O(n*k) stream once per window — O(n^2*k) per doc (measured ~5x
    on the gate corpus; DuckDB behaves identically, hence the staged
    CTE in the SQL twin)."""
    nwin = F.greatest(F.lit(1), F.size(hashes) - F.lit(w - 1))
    mins = F.transform(
        F.sequence(F.lit(1), nwin),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    return F.array_sort(F.array_distinct(mins))


def sql_winnow_gram_hashes(text: str, k: int = 4) -> str:
    words = f"string_split({text}, ' ')"
    grams = (
        f"list_transform(range(1, greatest(1, len({words}) - {k - 1}) + 1), "
        f"i -> array_to_string(list_slice({words}, i, i + {k - 1}), ' '))"
    )
    return f"list_transform({grams}, g -> ({sql_h60('g')} % {P_MINHASH}))"


def sql_winnow_mins(hashes: str, w: int = 4) -> str:
    """`hashes` should name a CTE column, not inline the gram
    expression — see winnow_mins on the quadratic re-evaluation."""
    mins = (
        f"list_transform(range(1, greatest(1, len({hashes}) - {w - 1}) + 1), "
        f"j -> list_min(list_slice({hashes}, j, j + {w - 1})))"
    )
    return f"list_sort(list_distinct({mins}))"


def winnow_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 8,
) -> DataFrame:
    """Near-dup candidate pairs by SHARED winnowing fingerprints —
    the fingerprint index is the classic plagiarism/contained-overlap
    detector (copies, near-copies, and long shared passages all
    surface; MinHash answers whole-doc similarity, winnowing answers
    'do these docs share any sufficiently long span'). Same shuffle
    discipline as the band join: only (fingerprint, doc_id) rides
    the self-join, payloads never. Returns (id_a, id_b, shared)
    pairs sharing >= min_shared fingerprints.

    `max_df` drops fingerprints present in more than that many docs
    BEFORE the self-join — the stop-fingerprint cap every production
    fingerprint index needs: a boilerplate span shared by d docs
    would otherwise alone contribute d^2/2 pairs (quadratic blowup on
    template/header text), while a fingerprint that common identifies
    nothing. The document-frequency pass is a partial aggregate (one
    row per distinct fingerprint)."""
    fps = (
        df.select(
            F.col(id_col).alias("doc_id"),
            winnow_gram_hashes(F.col(text_col), k).alias("_gh"),
        )
        .select("doc_id", F.explode(winnow_mins(F.col("_gh"), w)).alias("fp"))
    )
    if max_df is not None:
        keep = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("dfreq"))
            .filter(F.col("dfreq") <= F.lit(max_df))
            .select("fp")
        )
        fps = fps.join(keep, "fp")
    left = fps.select("fp", F.col("doc_id").alias("id_a"))
    right = fps.select("fp", F.col("doc_id").alias("id_b"))
    return (
        left.join(right, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= F.lit(min_shared))
    )


# ---------------------------------------------------------------------------
# SimHash (60-bit to stay in signed int64)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60


def simhash(sh: Column) -> Column:
    """60-bit simhash over a token array: bit k = sign of the sum of
    (+1/-1) votes from each token's hash bit k."""
    tok_h = F.transform(sh, lambda t: h60(t))

    def bit_term(k: int) -> Column:
        mask = F.lit(1 << k).cast("long")
        vote = F.aggregate(
            tok_h,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        return (vote > 0).cast("long") * mask

    bits = [bit_term(k) for k in range(SIMHASH_BITS)]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def sql_token_hashes(sh: str) -> str:
    """list of h60 token hashes — materialize in a CTE, then feed to
    sql_simhash_from_hashes so the 60 bit-vote terms share it."""
    return f"list_transform({sh}, t -> {sql_h60('t')})"


def sql_simhash_from_hashes(th: str) -> str:
    terms = []
    for k in range(SIMHASH_BITS):
        vote = (
            f"list_reduce(list_transform({th}, h -> (h >> {k}) % 2 * 2 - 1), "
            f"(a, b) -> a + b)"
        )
        terms.append(
            f"(CASE WHEN ({vote}) > 0 THEN CAST({1 << k} AS BIGINT) ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def sql_simhash(sh: str) -> str:
    return sql_simhash_from_hashes(sql_token_hashes(sh))


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= k, found
    EXACTLY via pigeonhole blocking — see hamming_pairs (the generic
    machinery, shared with image phash dedup). Returns
    (id_a, id_b, hamming)."""
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        simhash(shingles(F.col(text_col), shingle_k)).alias("sig"),
    )
    return hamming_pairs(sig, k=k, bits=SIMHASH_BITS)


def hamming_pairs(
    sig: DataFrame, k: int = 3, bits: int = 60
) -> DataFrame:
    """All pairs with hamming(sig) <= k over sig(doc_id, sig long),
    found EXACTLY via pigeonhole blocking: the `bits`-bit signature
    splits into k+1 blocks — any pair within hamming k agrees exactly
    on at least one block (k flipped bits can dirty at most k
    blocks). Bucket self-join per (block index, block value), dedup
    candidate pairs, verify with bit_count(xor) — signatures are
    single longs, so carrying them through the block join shuffles 8
    bytes, not payloads. Works for any integer signature: 60-bit
    text simhash, 64-bit image phash. Returns (id_a, id_b, hamming).
    """
    nblocks = k + 1
    per = bits // nblocks
    blocks = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftrightunsigned(F.col("sig"), i * per)
                        .bitwiseAND(F.lit((1 << per) - 1))
                        .alias("bv"),
                    )
                    # the last block absorbs the remainder bits
                    if i < nblocks - 1
                    else F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftrightunsigned(F.col("sig"), i * per).alias("bv"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sig", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    left = blocks.select(
        "bi", "bv", F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    right = blocks.select(
        "bi", "bv", F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    return (
        left.join(right, ["bi", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= F.lit(k))
        .select("id_a", "id_b", "hamming")
    )


def sql_simhash_block(sig: str, i: int, per: int, nblocks: int) -> str:
    if i < nblocks - 1:
        return f"(({sig} >> {i * per}) & {(1 << per) - 1})"
    return f"({sig} >> {i * per})"


def simhash_dedup(df: DataFrame, text_col: str, id_col: str,
                  shingle_k: int = 3) -> DataFrame:
    """Group docs by identical simhash; keep lowest id per bucket."""
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        simhash(shingles(F.col(text_col), shingle_k)).alias("simhash"),
    )
    w = Window.partitionBy("simhash").orderBy(F.col("doc_id").asc())
    return sig.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    ).drop("rn")


# ---------------------------------------------------------------------------
# Cluster formation: near-dup pairs -> connected components -> survivors
# ---------------------------------------------------------------------------

def dedup_clusters(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    score_col: str | None = None,
) -> DataFrame:
    """Connected components over near-dup pairs by iterative min-label
    propagation; the canonical survivor per component is its smallest
    id (deterministic, so a DuckDB recursive CTE replays it exactly).

    Returns (doc_id, cluster_id, survivor). If `nodes` (first column =
    doc id) is given, isolated docs appear as their own singletons —
    the full survivor table a dedup pipeline feeds downstream
    (reference precedent for pair->group formation:
    /root/reference/api/load_matches.py:204-212).

    `score_col` (requires `nodes` carrying that column) switches the
    survivor policy from min-id to KEEP-BEST: the cluster's survivor
    is its highest-scoring doc (ties -> smallest doc_id), the
    standard corpus-dedup knob (e.g. keep the longest document).
    Cluster ids stay min-id labels either way; the score is
    deterministic data, so single-node oracles replay the choice
    exactly. A map-side struct-max per cluster — no window, no skew
    sensitivity.

    Scale: each round is two (node)-keyed shuffles — a neighbor-min
    pass plus a POINTER-JUMPING pass (my label's label), which makes
    convergence O(log diameter) instead of O(diameter), so even a
    pathological million-node chain converges in ~20 rounds. Near-dup
    components are shallow (stars/cliques around a template), so 2-3
    rounds in practice; the loop exits as soon as a round changes
    nothing.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # localCheckpoint (not just persist) on every iteration state: the
    # loop would otherwise grow the LOGICAL plan each round and
    # Catalyst re-analysis cost explodes — the classic iterative-
    # DataFrame pitfall. Checkpointing truncates lineage to the
    # materialized blocks.
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    lab = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nb = (
            sym.join(
                lab.select(F.col("node").alias("dst"), F.col("label")), "dst"
            )
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # pointer jumping: resolve my label's own label in the same round
        jump = lab.select(
            F.col("node").alias("label"), F.col("label").alias("jlabel")
        )
        new = (
            lab.join(nb.select(F.col("src").alias("node"), "nmin"), "node", "left")
            .join(jump, "label", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nmin"), F.col("label")),
                    F.coalesce(F.col("jlabel"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.join(lab.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        lab.unpersist()  # release the superseded round's blocks
        lab = new
        if changed == 0:
            break
    sym.unpersist()
    # NB: the FINAL lab's checkpointed blocks back the returned
    # DataFrame's (truncated) lineage and must stay alive
    out = lab.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    if score_col is not None and nodes is None:
        raise ValueError("score_col requires `nodes` carrying that column")
    if nodes is not None:
        all_nodes = nodes.select(F.col(nodes.columns[0]).alias("doc_id"))
        out = all_nodes.join(out, "doc_id", "left").select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    if score_col is None:
        return out.withColumn("survivor", F.col("doc_id") == F.col("cluster_id"))
    scored = out.join(
        nodes.select(
            F.col(nodes.columns[0]).alias("doc_id"),
            # null scores LOSE (SQL 'ORDER BY score DESC NULLS LAST'
            # semantics): without the coalesce, Spark's struct
            # ordering sorts the null negated score FIRST and a
            # null-scored row would win its cluster
            F.coalesce(
                F.col(score_col).cast("double"),
                F.lit(float("-inf")),
            ).alias("_score"),
        ),
        "doc_id",
    )
    # keep-best: min(struct(-score, doc_id)) == (max score, tie min id);
    # partial aggregate, so the shuffle carries one row per cluster
    best = scored.groupBy("cluster_id").agg(
        F.min(
            F.struct((-F.col("_score")).alias("ns"), F.col("doc_id").alias("did"))
        )["did"].alias("_best_id")
    )
    return (
        scored.join(best, "cluster_id")
        .select(
            "doc_id", "cluster_id",
            (F.col("doc_id") == F.col("_best_id")).alias("survivor"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding LSH (random-hyperplane signs) + cosine verification
# ---------------------------------------------------------------------------

def hyperplanes(num_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane components from md5 — computed
    driver-side in plain Python, so they are literal plan constants on
    ANY engine."""
    out = []
    for j in range(num_planes):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"hp:{j}:{i}".encode()).hexdigest()
            row.append(1 if int(digest[:2], 16) % 2 == 0 else -1)
        out.append(row)
    return out


def cosine(a: Column, b: Column) -> Column:
    """Exact-fold cosine similarity of two array<double> columns (the
    fold order matches DuckDB's list_reduce, so oracles agree to the
    last ulp)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    na = F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0),
                            lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0),
                            lambda s, v: s + v))
    return dot / (na * nb)


def sql_cosine(a: str, b: str) -> str:
    def dot(u, v):
        return (
            f"list_reduce(list_transform(range(1, len({u}) + 1), "
            f"i -> {u}[i] * {v}[i]), (s, x) -> s + x)"
        )

    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def embedding_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """LSH bucket id = sign bits of the hyperplane dot products."""
    terms = []
    for j, hp in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in hp]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        terms.append((dot > 0).cast("long") * F.lit(1 << j).cast("long"))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_embedding_bucket(vec: str, planes: list[list[int]]) -> str:
    terms = []
    for j, hp in enumerate(planes):
        consts = "[" + ", ".join(f"{float(c)!r}" for c in hp) + "]"
        dot = (
            f"list_reduce(list_transform(range(1, len({vec}) + 1), "
            f"i -> {vec}[i] * ({consts})[i]), (s, x) -> s + x)"
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def sql_multiprobe_buckets(vec: str, planes: list[list[int]],
                           extra: int) -> str:
    """DuckDB twin of operators.ann.multiprobe_buckets: list of the
    base bucket plus `extra` lowest-|margin| single-bit flips. Fold
    order, sort order (struct field-lexicographic) and tie-break
    (plane index) match the Spark expression exactly."""
    dots = []
    for hp in planes:
        consts = "[" + ", ".join(f"{float(c)!r}" for c in hp) + "]"
        dots.append(
            f"list_reduce(list_transform(range(1, len({vec}) + 1), "
            f"i -> {vec}[i] * ({consts})[i]), (s, x) -> s + x)"
        )
    base = "(" + " + ".join(
        f"(CASE WHEN ({d}) > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j, d in enumerate(dots)
    ) + ")"
    margins = "[" + ", ".join(
        f"{{'m': abs({d}), 'j': {j}}}" for j, d in enumerate(dots)
    ) + "]"
    powers = "[" + ", ".join(
        f"CAST({1 << k} AS BIGINT)" for k in range(len(planes))
    ) + "]"
    flips = (
        f"list_transform(list_slice(list_sort({margins}), 1, {extra}), "
        f"s -> xor({base}, ({powers})[s.j + 1]))"
    )
    return f"list_prepend({base}, {flips})"


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    num_planes: int = 8,
    dim: int = 64,
    cosine_threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate pairs by cosine, candidates bucketed by
    hyperplane LSH (the scale path: the self-join only touches
    same-bucket pairs)."""
    planes = hyperplanes(num_planes, dim)
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", embedding_bucket(F.col("v"), planes))
    left = base.select(
        F.col("bucket"), F.col("vid").alias("id_a"), F.col("v").alias("va")
    )
    right = base.select(
        F.col("bucket"), F.col("vid").alias("id_b"), F.col("v").alias("vb")
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 9))
        .filter(F.col("cos_sim") >= F.lit(cosine_threshold))
        .select("id_a", "id_b", "cos_sim")
    )
