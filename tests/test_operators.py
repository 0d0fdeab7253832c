"""Operator-level tests: kNN golden vs spec, checkpoint/resume
equality (kill + resume => identical sink), payload invariants,
multimodal plumbing, dedup kernels."""

import numpy as np
import pandas as pd
import pytest

from overmatch_spark import fixtures
from overmatch_spark.spec import conflate_spec, knn_spec

N = 600


@pytest.fixture(scope="module")
def layers():
    images = fixtures.make_images(N, with_bytes=False)
    a = fixtures.derive_layer_a(images)
    b = fixtures.source_filter_b(fixtures.derive_layer_b(images))
    return a, b


@pytest.fixture(scope="module")
def golden(layers):
    a, b = layers
    return conflate_spec(a, b)


def _spark_layers(spark, layers):
    a, b = layers
    sa = spark.createDataFrame(a[["osm_id", "name", "housenumber", "lon", "lat"]])
    sb = spark.createDataFrame(b[["id", "name", "housenumber", "lon", "lat"]])
    return sa, sb


class TestKnn:
    def test_knn_golden(self, spark, layers, golden):
        from overmatch_spark.operators.conflate import conflate
        from overmatch_spark.operators.knn import knn_fallback

        from overmatch_spark.operators.knn import release_caches

        sa, sb = _spark_layers(spark, layers)
        m = conflate(sa, sb)
        exp = knn_spec(*layers, golden)
        # res0=15 additionally exercises the ODD-res0 ladder
        # (enumerable floor 1) end-to-end — output must be invariant.
        # Caller-owned caches released per iteration (knn.py contract
        # for repeated invocation in one session).
        for res0 in (16, 15):
            caches: list = []
            try:
                got = (
                    knn_fallback(
                        sa, sb, m, res0=res0, coarse_res=12, caches=caches
                    )
                    .toPandas()
                    .sort_values("osm_id")
                    .reset_index(drop=True)
                )
            finally:
                release_caches(caches)
            assert len(got) == len(exp) > 0
            pd.testing.assert_frame_equal(
                got[["osm_id", "overture_id", "distance_m"]],
                exp[["osm_id", "overture_id", "distance_m"]],
                check_exact=True,
            )

    def test_r6_cache_internals(self, spark, layers, golden):
        """r6 optimization invariants on the persisted intermediates:
        (a) duplicate input rows are collapsed in BOTH caches (full-row
        dedup rides the existing exchanges — a per-osm_id min can never
        see them), output unchanged vs the spec; (b) the ubs cache
        holds ONLY hintless stragglers (hinted ones go straight to the
        fine path), i.e. every ubs osm_id is absent from best1."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.conflate import conflate
        from overmatch_spark.operators.knn import knn_fallback, release_caches

        sa, sb = _spark_layers(spark, layers)
        # duplicate every input row — outputs must be identical to the
        # spec over the un-duplicated layers
        sa2 = sa.unionByName(sa)
        sb2 = sb.unionByName(sb)
        m = conflate(sa, sb)
        exp = knn_spec(*layers, golden)
        caches: list = []
        try:
            got = (
                knn_fallback(sa2, sb2, m, caches=caches)
                .toPandas()
                .sort_values("osm_id")
                .reset_index(drop=True)
            )
            assert len(got) == len(exp) > 0
            pd.testing.assert_frame_equal(
                got[["osm_id", "overture_id", "distance_m"]],
                exp[["osm_id", "overture_id", "distance_m"]],
                check_exact=True,
            )
            probes, b0, best1 = caches[0], caches[1], caches[2]
            assert probes.count() == probes.distinct().count()
            assert b0.count() == b0.distinct().count()
            if len(caches) > 3:
                ubs = caches[3]
                assert (
                    ubs.join(
                        best1.select("osm_id"), "osm_id", "left_semi"
                    ).count()
                    == 0
                )
        finally:
            release_caches(caches)

    def test_ladder_level_never_below_enumerable_floor(self, spark):
        """For ODD res0 the build ladder's coarsest level is 1, not 0;
        a worst-case ub must clamp to that enumerable floor or the
        probe would join an empty build side and silently vanish."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.knn import _ladder_floor, _ladder_level

        assert _ladder_floor(16) == 0 and _ladder_floor(15) == 1
        df = spark.range(1).select(
            _ladder_level(F.lit(5.7e7), 15).alias("odd"),
            _ladder_level(F.lit(5.7e7), 16).alias("even"),
            _ladder_level(F.lit(400.0), 15).alias("near"),
        )
        r = df.first()
        assert r["odd"] == 1  # in range(13, -1, -2)
        assert r["even"] == 0
        assert r["near"] == 15


class TestCheckpointResume:
    def test_kill_and_resume_identical(self, spark, layers, golden, tmp_path):
        from overmatch_spark.operators.checkpoint import ConflationJob

        sa, sb = _spark_layers(spark, layers)
        job = ConflationJob(spark, str(tmp_path / "job"), n_buckets=8)
        job.prepare(sa, sb)
        # simulate a crash after 3 buckets
        assert job.run(max_buckets=3) == 3
        assert len(job.completed_buckets()) == 3
        # resume finishes the rest, no recompute of completed buckets
        assert job.run() == 5
        got = (
            job.result()
            .toPandas()
            .sort_values(["osm_id", "overture_id"])
            .reset_index(drop=True)[
                ["osm_id", "overture_id", "lon", "lat", "distance_m", "similarity"]
            ]
        )
        exp = golden[
            ["osm_id", "overture_id", "lon", "lat", "distance_m", "similarity"]
        ]
        pd.testing.assert_frame_equal(got, exp, check_exact=True)
        # lineage carries metrics for every bucket
        lin = job.lineage()
        assert len(lin) == 8
        assert sum(r["n_matches"] for r in lin) == len(exp)
        # idempotent: a second run does nothing
        assert job.run() == 0


class TestImages:
    def test_payload_invariants(self, spark):
        from overmatch_spark.fixtures import caption_for, make_images
        from overmatch_spark.images import invariant_report

        pdf = make_images(60, with_bytes=True)
        df = spark.createDataFrame(pdf)
        rep = invariant_report(df, expected_caption_fn=caption_for).toPandas()
        assert len(rep) == 60
        assert rep["pixels_ok"].all()
        assert rep["caption_ok"].all()
        lossy = rep[rep["image_id"].isin(pdf[pdf.fmt == "qlossy"]["image_id"])]
        assert (lossy["psnr_db"] >= 40.0).all()

    def test_qlossy_psnr_bound(self):
        from overmatch_spark.images import decode, encode, gen_pixels, psnr_db

        px = gen_pixels("img/000000000001", 32, 32)
        dec = decode(encode(px, "qlossy"), 32, 32, "qlossy")
        assert 40.0 <= psnr_db(px, dec) < 50.0
        assert np.abs(px.astype(int) - dec.astype(int)).max() <= 2

    def test_unknown_fmt_stubbed(self):
        from overmatch_spark.images import encode

        # webp became a REAL VP8L codec late r5; the remaining stub
        # boundary is lossy/unknown formats
        with pytest.raises(NotImplementedError):
            encode(np.zeros((2, 2, 3), np.uint8), "avif")


class TestMultimodal:
    def test_extract_features_and_resize(self, spark):
        from overmatch_spark.fixtures import make_images
        from overmatch_spark.images import decode
        from overmatch_spark.operators.multimodal import (
            extract_features,
            resize_nearest,
        )

        pdf = make_images(30, with_bytes=True)
        df = spark.createDataFrame(pdf)
        feats = extract_features(df).toPandas()
        assert len(feats) == 30
        assert ((feats["mean_r"] > 100) & (feats["mean_r"] < 155)).all()

        small = resize_nearest(df, 8, 8).toPandas()
        assert (small["w"] == 8).all()
        row = small.iloc[0]
        px = decode(row["bytes"], 8, 8, row["fmt"])
        assert px.shape == (8, 8, 3)


class TestVideoAudio:
    def test_frame_sampling_exact_frames(self, spark):
        """sample_frames demuxes the RAWV container: every_n indices,
        each emitted frame byte-identical to the encoded original."""
        import pandas as pd

        from overmatch_spark.images import encode_video, gen_pixels
        from overmatch_spark.operators.multimodal import sample_frames

        frames = {
            "vid/0": [gen_pixels(f"vid/0#{i}", 8, 6) for i in range(7)],
            "vid/1": [gen_pixels(f"vid/1#{i}", 4, 4) for i in range(10)],
        }
        rows = [(k, encode_video(v, fps=24)) for k, v in frames.items()]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["video_id", "bytes"]))
        got = sample_frames(df, every_n=3).toPandas()
        # vid/0: idx 0,3,6 ; vid/1: idx 0,3,6,9
        key = got.groupby("video_id")["frame_idx"].apply(sorted).to_dict()
        assert key["vid/0"] == [0, 3, 6] and key["vid/1"] == [0, 3, 6, 9]
        for r in got.itertuples(index=False):
            assert bytes(r.bytes) == frames[r.video_id][r.frame_idx].tobytes()
            assert (r.w, r.h) == frames[r.video_id][0].shape[1::-1]

    def test_audio_features_match_numpy(self, spark):
        import numpy as np
        import pandas as pd

        from overmatch_spark.images import encode_audio
        from overmatch_spark.operators.multimodal import audio_features

        t = np.arange(1600)
        pcm = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
        df = spark.createDataFrame(
            pd.DataFrame([("a/0", encode_audio(pcm, 16000))],
                         columns=["audio_id", "bytes"])
        )
        got = audio_features(df).toPandas().iloc[0]
        x = pcm.astype(np.float64) / 32768.0
        assert got["sample_rate"] == 16000
        assert abs(got["rms"] - np.sqrt(np.mean(x * x))) < 1e-12
        # a 440 Hz tone's spectral centroid sits near 440
        assert 380 < got["spectral_centroid_hz"] < 500
        assert abs(got["peak"] - np.abs(x).max()) < 1e-12

    def test_real_codecs_stubbed(self, spark):
        """Payloads needing an external codec (webm/EBML here; mp4 is
        now REAL via kernels/mp4.py) raise the documented
        NotImplementedError."""
        import pandas as pd
        import pytest as pt

        from overmatch_spark.operators.multimodal import sample_frames

        df = spark.createDataFrame(
            pd.DataFrame([("v", b"\x1aE\xdf\xa3webm-ebml-header")],
                         columns=["video_id", "bytes"])
        )
        with pt.raises(Exception, match="NotImplementedError|codec|container"):
            sample_frames(df, 2).collect()


class TestDedupKernels:
    def test_exact_dedup(self, spark):
        from pyspark.sql import functions as F

        from overmatch_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["x", "y", "x", "x"]})
        )
        kept = exact_dedup(df, "text", "doc_id").toPandas()
        assert sorted(kept["doc_id"]) == [1, 2]

    def test_minhash_finds_near_dups_not_distinct(self, spark):
        from overmatch_spark.operators.dedup import minhash_lsh_pairs

        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, base),
            (2, base + " tail"),
            (3, "completely different words entirely unrelated content here"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        pairs = minhash_lsh_pairs(df, "text", "doc_id", jaccard_threshold=0.5)
        got = pairs.toPandas()
        assert {(r.id_a, r.id_b) for r in got.itertuples()} == {(1, 2)}

    def test_cosine_exact(self, spark):
        from pyspark.sql import functions as F

        from overmatch_spark.operators.dedup import cosine

        df = spark.createDataFrame(
            pd.DataFrame({"a": [[1.0, 0.0]], "b": [[1.0, 1.0]]})
        )
        got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).toPandas()["c"][0]
        assert got == pytest.approx(1 / np.sqrt(2), rel=1e-12)


class TestKnnHistogramCap:
    def test_histogram_budget_cap_is_output_invariant(self, spark):
        """Phase-2b broadcast guard: a build side spread over far more
        coarse cells than the histogram budget gets its broadcast
        histogram capped to the max_hist_cells densest cells — any
        non-empty subset of occupied cells yields valid (looser)
        upper bounds, so results match the numpy spec exactly."""
        import numpy as np

        from overmatch_spark import expressions as X
        from overmatch_spark.operators.knn import knn_fallback
        from overmatch_spark.spec import knn_spec
        from pyspark.sql import functions as F

        def hashpts(n, salt):
            ks = np.arange(n, dtype=np.int64)
            hx = ((ks * 2654435761 + salt) % (2**20)) / float(2**20)
            hy = ((ks * 97003999 + salt * 7 + 13) % (2**20)) / float(2**20)
            return -179.0 + 358.0 * hx, -80.0 + 160.0 * hy

        import pandas as pd

        blon, blat = hashpts(3000, 5)
        b_pd = pd.DataFrame(
            {"id": [f"b/{k}" for k in range(3000)], "lon": blon, "lat": blat}
        )
        alon, alat = hashpts(50, 11)
        a_pd = pd.DataFrame(
            {
                "osm_id": [f"node/{k}" for k in range(50)],
                "name": [f"P{k}" for k in range(50)],
                "housenumber": [None] * 50,
                "lon": alon,
                "lat": alat,
            }
        )
        a = spark.createDataFrame(a_pd)
        b = spark.createDataFrame(b_pd)
        empty_matches = spark.createDataFrame([], "osm_id string")

        # precondition: globally-spread points occupy >> budget res-13
        # cells, so the cap genuinely truncates the histogram
        b0 = b.select(
            X.merc_x(F.col("lon")).alias("bx"), X.merc_y(F.col("lat")).alias("by")
        )
        occupied = b0.select(
            X.cell_of(F.col("bx"), F.col("by"), 13).alias("c")
        ).distinct().count()
        assert occupied > 500

        got = (
            knn_fallback(a, b, empty_matches, max_hist_cells=500)
            .toPandas()
            .sort_values("osm_id")
            .reset_index(drop=True)
        )
        want = knn_spec(a_pd, b_pd, pd.DataFrame({"osm_id": []}))
        assert got["osm_id"].tolist() == want["osm_id"].tolist()
        assert got["overture_id"].tolist() == want["overture_id"].tolist()
        assert np.allclose(got["distance_m"], want["distance_m"], atol=0, rtol=0)

    def test_construction_launches_no_jobs(self, spark):
        """knn_fallback must contain ZERO driver-side actions: the
        coarse-res sketch it used to run at plan-construction time
        (an approx_count_distinct .first() that forced a full
        derivation of the build side before the timed job started)
        is a regression this test makes impossible to reintroduce.
        Inputs are poisoned so that evaluating ANY row raises —
        construction succeeding proves no job touched the data."""
        import pytest as _pytest

        from overmatch_spark.operators import knn as knn_mod
        from overmatch_spark.operators.knn import knn_fallback
        from pyspark.sql import functions as F

        # row-dependent guard keeps Catalyst from constant-folding the
        # raise_error away (or evaluating it) at optimization time
        poison = F.when(
            F.col("id") >= 0, F.raise_error("evaluated at construction")
        ).otherwise(F.lit(None)).cast("double")
        a = spark.range(4).select(
            F.col("id").cast("string").alias("osm_id"),
            F.lit("x").alias("name"),
            poison.alias("lon"),
            poison.alias("lat"),
        )
        b = spark.range(4).select(
            F.col("id").cast("string").alias("id"),
            poison.alias("lon"),
            poison.alias("lat"),
        )
        m = spark.createDataFrame([], "osm_id string")

        caches = []
        out = knn_fallback(a, b, m, caches=caches)  # must not raise
        # the poison is real: materializing DOES evaluate it
        with _pytest.raises(Exception, match="evaluated at construction"):
            out.count()
        knn_mod.release_caches(caches)


class TestMatchIds:
    def test_ids_equal_global_row_number(self, spark):
        """W7: the width-proportional two-phase plan must emit ids
        IDENTICAL to row_number() over a global (osm_id, overture_id)
        sort — and its physical plan must contain no single-partition
        Window (audited in scripts/audit_plans.py)."""
        from pyspark.sql import Window, functions as F

        from overmatch_spark.operators.tiles import assign_match_ids

        n = 5000
        df = spark.range(n).select(
            F.concat(F.lit("node/"), (F.col("id") * 7919 % 997).cast("string"))
            .alias("osm_id"),
            F.concat(F.lit("ov/"), F.col("id").cast("string")).alias("overture_id"),
            (F.col("id") % 360).cast("double").alias("lon"),
            (F.col("id") % 170 - 85).cast("double").alias("lat"),
        ).repartition(16)

        got = assign_match_ids(df, num_partitions=8).toPandas()
        w = Window.orderBy("osm_id", "overture_id")
        want = df.withColumn(
            "match_id", F.row_number().over(w).cast("long")
        ).toPandas()
        key = ["osm_id", "overture_id"]
        g = got.sort_values(key).reset_index(drop=True)
        e = want.sort_values(key).reset_index(drop=True)
        assert (g["match_id"] == e["match_id"]).all()
        assert g["match_id"].min() == 1 and g["match_id"].max() == n


class TestIvf:
    def test_full_probe_equals_brute_force(self, spark):
        """IVF with nprobe = #centroids scans every inverted list, so
        it must reproduce the exact brute-force top-k — the recall
        loss is ONLY the pruning, never the mechanics."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.ann import (
            brute_force_topk,
            ivf_topk,
            train_ivf_centroids,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        sample = [
            [float(x) for x in r["embedding"]]
            for r in e.filter(F.col("vec_id") < 64).orderBy("vec_id").collect()
        ]
        cents = train_ivf_centroids(sample, k=8, iters=3)
        probes = e.filter(F.col("vec_id") < 3)
        got = (
            ivf_topk(e, probes, "embedding", "vec_id", cents, k=5, nprobe=8)
            .toPandas()
            .sort_values(["probe_id", "rank"])
            .reset_index(drop=True)
        )
        want = (
            brute_force_topk(e, probes, "embedding", "vec_id", k=5)
            .toPandas()
            .sort_values(["probe_id", "rank"])
            .reset_index(drop=True)
        )
        assert got["cand_id"].tolist() == want["cand_id"].tolist()
        assert (got["cos_sim"] == want["cos_sim"]).all()

    def test_ivf_partitioned_corpus_prunes_at_scan(self, spark, tmp_path):
        """The IVF scale contract made concrete: a corpus written
        partitioned by its coarse list id is PARTITION-PRUNED at the
        scan when probing a subset of lists — the plan's PartitionFilters
        carries the ivf predicate, so unprobed lists are never read."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.ann import (
            ivf_assign,
            reference_ivf_centroids,
        )

        C = reference_ivf_centroids()
        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        corpus = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("cv")
        ).withColumn("ivf", ivf_assign(F.col("cv"), C))
        path = str(tmp_path / "ivf_corpus")
        corpus.write.partitionBy("ivf").parquet(path)

        at_rest = spark.read.parquet(path)
        probed = at_rest.filter(F.col("ivf").isin([1, 5]))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "ivf" in plan.split(
            "PartitionFilters"
        )[1][:120]
        # pruning is semantic, not just cosmetic: the filtered read
        # returns exactly the rows of those lists
        want = corpus.filter(F.col("ivf").isin([1, 5])).count()
        assert probed.count() == want > 0

    def test_pinned_dial_reaches_recall80(self, spark):
        """The documented retrieval dial (pinned k=64 quantizer,
        nprobe=32) must keep recall@5 >= 0.8 — the serviceable-recall
        criterion from the round-2 review. The driver embeddings are
        near-isotropic, so this dial scans ~half the lists; on
        clustered real embeddings the same dial scans far less."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.ann import (
            brute_force_topk,
            ivf_topk,
            reference_ivf_centroids,
        )

        e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        probes = e.filter(F.col("vec_id") < 30)
        truth = brute_force_topk(e, probes, "embedding", "vec_id", k=5).select(
            "probe_id", "cand_id"
        )
        got = ivf_topk(
            e, probes, "embedding", "vec_id",
            reference_ivf_centroids(64), k=5, nprobe=32,
        ).select("probe_id", "cand_id")
        n_truth = truth.count()
        hit = got.join(truth, ["probe_id", "cand_id"], "left_semi").count()
        assert n_truth == 150
        assert hit / n_truth >= 0.8, f"recall@5 {hit / n_truth:.3f} < 0.8"

    def test_clustered_geometry_high_recall_low_scan(self, spark):
        """VERDICT r3 #4: on CLUSTERED embeddings — the geometry real
        corpora have, built deterministically by ann.clustered_view
        from the same driver vectors — the IVF dial must reach
        recall@5 >= 0.9 while scanning <= 10% of the lists
        (nprobe=1 of 16 = 6.25%). This is the demonstration the
        isotropic driver data cannot provide (there, recall ~ scan
        fraction for ANY pruning index)."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.ann import (
            brute_force_topk,
            clustered_centers,
            clustered_view,
            ivf_topk,
        )

        e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        ec = e.select(
            "vec_id",
            clustered_view(
                F.col("embedding").cast("array<double>"), F.col("vec_id")
            ).alias("embedding"),
        )
        probes = ec.filter(F.col("vec_id") < 30)
        truth = brute_force_topk(ec, probes, "embedding", "vec_id", k=5).select(
            "probe_id", "cand_id"
        )
        got = ivf_topk(
            ec, probes, "embedding", "vec_id", clustered_centers(),
            k=5, nprobe=1,
        ).select("probe_id", "cand_id")
        n_truth = truth.count()
        hit = got.join(truth, ["probe_id", "cand_id"], "left_semi").count()
        scan_frac = 1 / 16
        assert scan_frac <= 0.10
        assert n_truth == 150
        assert hit / n_truth >= 0.9, f"recall@5 {hit / n_truth:.3f} < 0.9"

    def test_pq_codes_match_numpy_and_recall(self, spark):
        """Product quantization: (a) the distributed pq_encode codes
        must equal a single-node numpy replay of the pinned codebooks
        exactly (argmin with first-occurrence ties, 1-based); (b) the
        ADC-shortlist + exact-re-rank pq_topk must recover a solid
        fraction of the true top-5 on the isotropic corpus even at
        64x compression (shortlist 20 of 500 = 4% of the corpus)."""
        import numpy as np
        from pyspark.sql import functions as F

        from overmatch_spark.operators.ann import (
            brute_force_topk,
            pq_encode,
            pq_topk,
            reference_pq_codebooks,
        )

        e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        cb = reference_pq_codebooks()
        got = (
            e.select(
                "vec_id",
                pq_encode(
                    F.col("embedding").cast("array<double>"), cb
                ).alias("codes"),
            )
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        vecs = (
            e.select("vec_id", "embedding").toPandas()
            .sort_values("vec_id").reset_index(drop=True)
        )
        V = np.array([np.asarray(v, dtype=np.float64) for v in vecs["embedding"]])
        C = np.asarray(cb, dtype=np.float64)  # (m, 16, dsub)
        m, _, dsub = C.shape
        for j in range(m):
            d = (
                (V[:, None, j * dsub:(j + 1) * dsub] - C[j][None, :, :]) ** 2
            ).sum(axis=2)
            want = d.argmin(axis=1) + 1  # first-occurrence argmin, 1-based
            have = np.array([c[j] for c in got["codes"]])
            assert (want == have).all(), f"subvector {j} codes diverge"

        probes = e.filter(F.col("vec_id") < 30)
        truth = brute_force_topk(e, probes, "embedding", "vec_id", k=5).select(
            "probe_id", "cand_id"
        )
        got_pq = pq_topk(
            e, probes, "embedding", "vec_id", cb, k=5, shortlist=20
        ).select("probe_id", "cand_id")
        n_truth = truth.count()
        hit = got_pq.join(truth, ["probe_id", "cand_id"], "left_semi").count()
        assert n_truth == 150
        assert hit / n_truth >= 0.5, f"PQ recall@5 {hit / n_truth:.3f} < 0.5"

    def test_ivfpq_subset_of_pq_candidates_and_clustered_recall(self, spark):
        """IVF+PQ composition: on the CLUSTERED fixture (where list
        pruning is sound) the composed stack must keep high recall at
        nprobe=1 — list pruning AND 64x code compression at once,
        exact re-rank on a 4% shortlist."""
        import numpy as np  # noqa: F401
        from pyspark.sql import functions as F

        from overmatch_spark.operators.ann import (
            brute_force_topk,
            clustered_centers,
            clustered_view,
            ivfpq_topk,
            reference_pq_codebooks,
        )

        e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        ec = e.select(
            "vec_id",
            clustered_view(
                F.col("embedding").cast("array<double>"), F.col("vec_id")
            ).alias("embedding"),
        )
        probes = ec.filter(F.col("vec_id") < 30)
        truth = brute_force_topk(ec, probes, "embedding", "vec_id", k=5).select(
            "probe_id", "cand_id"
        )
        got = ivfpq_topk(
            ec, probes, "embedding", "vec_id", clustered_centers(),
            reference_pq_codebooks(), k=5, nprobe=1, shortlist=28,
        ).select("probe_id", "cand_id")
        n_truth = truth.count()
        hit = got.join(truth, ["probe_id", "cand_id"], "left_semi").count()
        assert n_truth == 150
        assert hit / n_truth >= 0.8, (
            f"IVFPQ clustered recall@5 {hit / n_truth:.3f} < 0.8"
        )


class TestWinnowing:
    def test_shared_span_guarantees_shared_fingerprint(self, spark):
        """The winnowing invariant: any two docs sharing a span of
        >= k + w - 1 words MUST share at least one fingerprint; and
        the pair detector finds exactly the pairs the per-doc
        fingerprint sets imply."""
        import itertools

        import pandas as pd
        from pyspark.sql import functions as F

        from overmatch_spark.operators.dedup import winnow_hashes, winnow_pairs

        k, w = 3, 3
        span = "alpha beta gamma delta epsilon"  # 5 words = k + w - 1
        docs = {
            1: f"one two three {span} four five six",
            2: f"{span} seven eight nine ten eleven",
            3: "twelve thirteen fourteen fifteen sixteen seventeen",
            4: f"eighteen nineteen {span}",
        }
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
        )
        fps = {
            r["doc_id"]: set(r["fps"])
            for r in df.select(
                "doc_id", winnow_hashes(F.col("text"), k, w).alias("fps")
            ).collect()
        }
        # the span-sharing docs must intersect; doc 3 must not
        assert fps[1] & fps[2] and fps[1] & fps[4] and fps[2] & fps[4]
        assert not (fps[3] & (fps[1] | fps[2] | fps[4]))

        got = {
            (r["id_a"], r["id_b"]): r["shared"]
            for r in winnow_pairs(
                df, "text", "doc_id", k=k, w=w, min_shared=1, max_df=None
            ).collect()
        }
        want = {
            (a, b): len(fps[a] & fps[b])
            for a, b in itertools.combinations(sorted(docs), 2)
            if fps[a] & fps[b]
        }
        assert got == want


class TestPhashNearDups:
    def test_pigeonhole_blocking_is_exact_on_64bit(self, spark):
        """phash_near_dups must find EXACTLY the image pairs within
        hamming k over the full 64-bit signature (incl. negative
        longs / high bits) — compare to brute-force all-pairs."""
        import itertools

        from overmatch_spark.fixtures import make_images
        from overmatch_spark.operators.multimodal import phash_near_dups

        pdf = make_images(40, with_bytes=False)[["image_id", "phash"]]
        rows = []
        for j, r in enumerate(pdf.itertuples(index=False)):
            rows.append((r.image_id, int(r.phash)))
            nb = (1, 2, 3, 4)[j % 4]
            mask = 0
            for t in range(nb):
                mask |= 1 << ((j * 13 + t * 17) % 64)
            u = (int(r.phash) & 0xFFFFFFFFFFFFFFFF) ^ mask
            rows.append(
                (r.image_id + "/v", u - (1 << 64) if u >= (1 << 63) else u)
            )

        k = 3
        want = set()
        for (ia, pa), (ib, pb) in itertools.combinations(rows, 2):
            h = bin((pa ^ pb) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= k:
                key = (ia, ib) if ia < ib else (ib, ia)
                want.add((*key, h))

        corpus = spark.createDataFrame(rows, "image_id string, phash long")
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in phash_near_dups(corpus, "phash", "image_id", k=k).collect()
        }
        assert got == want
        assert len(got) >= 20  # the 1/2/3-bit variants are all found


class TestSimhashHamming:
    def test_pigeonhole_blocking_is_exact(self, spark):
        """simhash_hamming_pairs must find EXACTLY the pairs within
        hamming k (pigeonhole blocking is lossless for <= k flips):
        compare to a brute-force all-pairs hamming in pandas."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.dedup import (
            shingles,
            simhash,
            simhash_hamming_pairs,
        )

        base = [
            "the quick brown fox jumps over the lazy dog again and again",
            "pack my box with five dozen liquor jugs before noon today ok",
            "how vexingly quick daft zebras jump over fences at dawn here",
        ]
        rows = []
        for i, t in enumerate(base):
            rows.append((i * 10, t))
            rows.append((i * 10 + 1, t + " zq"))       # tiny perturbation
            rows.append((i * 10 + 2, t + " zq xw"))    # slightly bigger
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        k = 6
        got = (
            simhash_hamming_pairs(df, "text", "doc_id", k=k)
            .toPandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        sigs = dict(
            df.select(
                "doc_id", simhash(shingles(F.col("text"), 3)).alias("s")
            ).collect()
        )
        want = []
        ids = sorted(sigs)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = bin(sigs[a] ^ sigs[b]).count("1")
                if h <= k:
                    want.append((a, b, h))
        assert [tuple(r) for r in got.itertuples(index=False)] == want
    def test_components_and_survivors(self, spark):
        from overmatch_spark.operators.dedup import dedup_clusters

        # components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,6}, isolated 7,8
        pairs = spark.createDataFrame(
            pd.DataFrame({"id_a": [1, 2, 3, 5], "id_b": [2, 3, 9, 6]})
        )
        nodes = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3, 5, 6, 7, 8, 9]})
        )
        got = (
            dedup_clusters(pairs, nodes=nodes)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert got.loc[[1, 2, 3, 9], "cluster_id"].tolist() == [1, 1, 1, 1]
        assert got.loc[[5, 6], "cluster_id"].tolist() == [5, 5]
        assert got.loc[7, "cluster_id"] == 7 and got.loc[8, "cluster_id"] == 8
        assert got["survivor"].sum() == 4  # 1, 5, 7, 8

    def test_deep_chain_converges_logarithmically(self, spark):
        """Pointer jumping makes a 200-node chain (diameter 200)
        converge within the default iteration budget — plain
        neighbor-min propagation alone would need 200 rounds."""
        from overmatch_spark.operators.dedup import dedup_clusters

        n = 200
        pairs = spark.createDataFrame(
            pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
        )
        got = dedup_clusters(pairs, max_iters=15).toPandas()
        assert (got["cluster_id"] == 0).all()
        assert got["survivor"].sum() == 1


class TestPublicSpatialApi:
    def test_spatial_join_and_nearest_join(self, spark):
        """The generic public wrappers: spatial_join returns exactly
        the pairs within the radius (cell-cover boundary effects
        included), nearest_join the single nearest per named row."""
        import math

        from pyspark.sql import functions as F

        from overmatch_spark.expressions import R_MERC
        from overmatch_spark.operators.conflate import nearest_join, spatial_join

        def lonlat(x_m, y_m):
            lon = x_m / R_MERC * 180.0 / math.pi
            lat = (
                (math.atan(math.exp(y_m / R_MERC)) * 2.0 - math.pi / 2.0)
                * 180.0 / math.pi
            )
            return lon, lat

        a_pts = {"a1": (0.0, 0.0), "a2": (10_000.0, 0.0)}
        b_pts = {
            "b1": (30.0, 40.0),      # 50 m from a1
            "b2": (150.0, 0.0),      # 150 m from a1
            "b3": (10_000.0, 90.0),  # 90 m from a2
            "b4": (200_000.0, 0.0),  # far from both
        }
        # deliberately generic schemas: custom id names, NO name col
        a = spark.createDataFrame(
            [(k, *lonlat(*v)) for k, v in a_pts.items()],
            "pt string, lon double, lat double",
        )
        b = spark.createDataFrame(
            [(k, *lonlat(*v)) for k, v in b_pts.items()],
            "site string, lon double, lat double",
        )
        got = {
            (r["a_id"], r["b_id"]): r["distance_m"]
            for r in spatial_join(
                a, b, radius_m=100.0, a_id="pt", b_id="site"
            ).collect()
        }
        assert set(got) == {("a1", "b1"), ("a2", "b3")}
        assert abs(got[("a1", "b1")] - 50.0) < 0.2  # ~mercator scale only

        nn = {
            r["a_id"]: r["b_id"]
            for r in nearest_join(a, b, a_id="pt", b_id="site").collect()
        }
        assert nn == {"a1": "b1", "a2": "b3"}


class TestTags:
    def test_website_chain(self, spark):
        from pyspark.sql import functions as F

        from overmatch_spark.operators.tags import clean_website

        rows = [
            ("HTTP://WWW.Foo.COM/Bar?utm_source=x&keep=1",),
            ("https://www.doordash.com/store/99",),
            ("https://ok.com/path",),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["w"]))
        got = df.select(clean_website(F.col("w")).alias("c")).toPandas()["c"]
        assert got[0] == "HTTP://www.foo.com/Bar?keep=1"
        assert got[1] is None
        assert got[2] == "https://ok.com/path"

    def test_lowercase_url_reference_edge_semantics(self, spark):
        """Pin the reference's exact split behavior (match.py:19-33):
        first-'//'-anywhere protocol split, bare-trailing-slash drop,
        deeper trailing slashes kept, protocol case preserved."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.tags import lowercase_url

        cases = [
            ("http://X.com/", "http://x.com"),        # bare '/' dropped
            ("http://X.com//", "http://x.com//"),     # path '/' kept
            ("http://X.com/Path/", "http://x.com/Path/"),
            ("a/b//C.com/Q", "a/b//c.com/Q"),         # '//' after a '/'
            ("X.com/Path", "x.com/Path"),             # no protocol
            ("HTTPS://WWW.Ex.COM", "HTTPS://www.ex.com"),
        ]
        df = spark.createDataFrame(
            pd.DataFrame([c[0] for c in cases], columns=["u"])
        )
        got = df.select(lowercase_url(F.col("u")).alias("c")).toPandas()["c"]
        for (_, want), g in zip(cases, got):
            assert g == want, f"{g!r} != {want!r}"

    def test_lowercase_url_exhaustive_fragment_grammar(self, spark):
        """Exhaustive cross-product of protocol/domain/path fragments
        (72 cases incl. every tricky combination: missing protocol,
        '//' after '/', empty domain, bare and nested trailing
        slashes) against a direct model of the reference's documented
        split semantics (match.py:19-33: first-'//' split, partition
        at first '/', drop empty path)."""
        from pyspark.sql import functions as F

        from overmatch_spark.operators.tags import lowercase_url

        def model(u: str) -> str:
            i = u.find("//")
            head, tail = ("", u) if i < 0 else (u[: i + 2], u[i + 2:])
            j = tail.find("/")
            if j < 0:
                return head + tail.lower()
            dom, rest = tail[:j], tail[j + 1:]
            return head + dom.lower() + ("/" + rest if rest else "")

        cases = [
            p + d + s
            for p in ["", "HTTP://", "a/b//", "//"]
            for d in ["", "X.Com", "ABC"]
            for s in ["", "/", "//", "/Path", "/Path/", "/A/B?Q=1"]
        ]
        df = spark.createDataFrame(pd.DataFrame({"u": cases}))
        got = df.select("u", lowercase_url(F.col("u")).alias("c")).toPandas()
        for u, c in zip(got["u"], got["c"]):
            assert c == model(u), f"{u!r}: {c!r} != {model(u)!r}"

    def test_phone_chain(self, spark):
        from pyspark.sql import functions as F

        from overmatch_spark.operators.tags import drop_toll_free, normalize_phone

        rows = [("(202) 555-0199",), ("+1 800 555 0000",), ("nonsense",)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["p"]))
        got = df.select(
            drop_toll_free(normalize_phone(F.col("p"))).alias("c")
        ).toPandas()["c"]
        assert got[0] == "+1-202-555-0199"
        assert got[1] is None  # toll-free dropped after normalization
        assert got[2] == "nonsense"  # no-parse tolerated (reference keeps it)


class TestKnnHintless:
    def test_probe_with_empty_neighborhood(self, spark):
        """A probe >100 km from every candidate has NO phase-1 hint —
        exercises the histogram-pruned phase 2b exclusively."""
        from overmatch_spark.operators.knn import knn_fallback

        a = spark.createDataFrame(
            pd.DataFrame(
                {
                    "osm_id": ["node/far"],
                    "name": ["Lonely Cafe"],
                    "housenumber": [None],
                    "lon": [-80.0],
                    "lat": [40.0],
                }
            )
        )
        b = spark.createDataFrame(
            pd.DataFrame(
                {
                    "id": ["ov/x", "ov/y", "ov/z"],
                    "name": ["A", "B", "C"],
                    "housenumber": [None, None, None],
                    "lon": [-77.0, -77.5, -76.9],
                    "lat": [38.9, 38.7, 39.0],
                }
            )
        )
        empty_matches = spark.createDataFrame([], "osm_id string")
        got = knn_fallback(a, b, empty_matches).toPandas()
        assert len(got) == 1
        # true nearest by planar 3857 distance is ov/y (-77.5, 38.7)
        assert got.iloc[0]["overture_id"] == "ov/y"
