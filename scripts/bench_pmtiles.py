"""PMTiles sink receipt: time the native archive build at sf0.1.

Pipeline timed end-to-end from the conflation matches: stable ids ->
multi-zoom tile assignment -> density drop -> tile table ->
distributed MVT encode -> streaming PMTiles v3 assembly -> full
read-back verification (every entry decoded, feature counts compared
to the tile table). Prints one JSON line; appends nothing.

The reference's equivalent step is tippecanoe over GeoJSON
(/root/reference/scripts/build_pmtiles.py:186-198) — single-process
C++. Ours distributes the encode; only the single-file assembly is
serial by construction.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from window_probe import probe  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from overmatch_spark.session import get_spark
    from overmatch_spark.operators.pmtiles import PMTilesReader, write_pmtiles
    from overmatch_spark.operators.tiles import (
        assign_match_ids,
        assign_tiles,
        density_drop,
        tile_table,
    )

    spark = get_spark("bench-pmtiles", cpus=CPUS, shuffle_partitions=CPUS)
    p0 = probe()
    # archive a FULL point layer (every Overture-side point), not
    # just the conflation matches — the scale-meaningful encode
    # workload. Same lineitem-keyed derivation as bench.py's scale
    # rows: PMT_MULT=1 -> 600k points at sf0.1.
    from pyspark.sql import functions as F

    from overmatch_spark import demo

    mult = int(os.environ.get("PMT_MULT", "1"))
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k0"))
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        .select((F.col("k0") * F.lit(mult) + F.col("rep")).alias("k"))
        .repartition(2 * CPUS)
    )
    m = (
        demo.spark_layer_b(spark, SF_DIR, None, "k", df=li)
        .select(
            F.lit(0).cast("long").alias("osm_id"),
            F.col("id").alias("overture_id"),
            "lon",
            "lat",
        )
        .persist()
    )
    n_matches = m.count()

    t0 = time.time()
    ids = assign_match_ids(
        m.select("osm_id", "overture_id", "lon", "lat"),
        num_partitions=CPUS,
    )
    t = assign_tiles(ids, zooms=(10, 12, 14))
    kept = density_drop(t, max_per_tile=10_000)
    pyr = tile_table(
        kept, ids.select("match_id", "osm_id", "overture_id", "lon", "lat")
    )
    out = "/tmp/bench_matches.pmtiles"
    summary = write_pmtiles(pyr, out)
    build_s = round(time.time() - t0, 3)

    # verify: every archived tile decodes and feature counts match
    t0 = time.time()
    rd = PMTilesReader(out)
    want = {
        (r["z"], r["x"], r["y"]): r["n_features"]
        for r in pyr.select("z", "x", "y", "n_features").collect()
    }
    import gzip as _gz

    from overmatch_spark.operators.pmtiles import mvt_decode

    n_feats = 0
    with open(out, "rb") as f:
        raw = f.read()
    for tid, off, ln, _ in rd.iter_tile_entries():
        blob = raw[rd._data_off + off : rd._data_off + off + ln]
        tile = mvt_decode(_gz.decompress(blob))
        n_feats += len(tile["matches"]["features"])
    verify_s = round(time.time() - t0, 3)
    ok = rd.n_entries == len(want) and n_feats == sum(want.values())

    # raster half: density PNGs over the same points
    from overmatch_spark.operators.raster import write_raster_pmtiles

    t0 = time.time()
    rsum = write_raster_pmtiles(
        m.select("lon", "lat"), "/tmp/bench_density.pmtiles", zooms=(10, 12)
    )
    raster_s = round(time.time() - t0, 3)
    rrd = PMTilesReader("/tmp/bench_density.pmtiles")
    # sample-verify: first/last entries decode to size^2 grayscale
    from overmatch_spark.kernels.png import png_decode_gray

    sample_ok = True
    r_entries = list(rrd.iter_tile_entries())
    for _, off, ln, _ in (r_entries[0], r_entries[-1]):
        blob = rrd._raw[rrd._data_off + off : rrd._data_off + off + ln]
        sample_ok &= png_decode_gray(blob).shape == (256, 256)
    ok = ok and sample_ok and rrd.tile_type == 2
    p1 = probe()

    print(
        json.dumps(
            {
                "matches": n_matches,
                "tiles": summary["tiles"],
                "archived_features": n_feats,
                "bytes": summary["bytes"],
                "build_s": build_s,
                "verify_s": verify_s,
                "features_per_sec": round(n_feats / build_s, 1),
                "raster_tiles": rsum["tiles"],
                "raster_bytes": rsum["bytes"],
                "raster_s": raster_s,
                "raster_points_per_sec": round(n_matches * 2 / raster_s, 1),
                "verified": ok,
                "probe_before": p0,
                "probe_after": p1,
            }
        )
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
