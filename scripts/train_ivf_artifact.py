"""Regenerate the pinned IVF quantizer artifacts in
overmatch_spark/artifacts.py.

Provenance (deterministic, no randomness):
  IVF_CENTROIDS    — k=16, 5 Lloyd iterations, init = first 16 sample
                     vectors, trained on the 256 lowest-vec_id
                     embeddings of /root/testdata/sf0.01.
  IVF_CENTROIDS_64 — k=64, 5 iterations, init = first 64, trained on
                     ALL 500 sf0.01 embeddings (vec_id order).

Prints the artifact literals to stdout; paste into artifacts.py.
Training is driver-side numpy over a fixed sample — the standard IVF
practice (a coarse quantizer is a trained artifact reused across
queries), and literals keep Spark plans and DuckDB oracles identical.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from overmatch_spark.operators.ann import train_ivf_centroids


def emit(name: str, k: int, limit: int | None) -> None:
    q = "SELECT embedding FROM '/root/testdata/sf0.01/embeddings.parquet' ORDER BY vec_id"
    if limit:
        q += f" LIMIT {limit}"
    vecs = [list(map(float, r[0])) for r in duckdb.sql(q).fetchall()]
    cents = train_ivf_centroids(vecs, k=k, iters=5)
    print(f"{name} = [")
    for c in cents:
        print(f"    {c!r},")
    print("]")


if __name__ == "__main__":
    emit("IVF_CENTROIDS", 16, 256)
    print()
    emit("IVF_CENTROIDS_64", 64, None)
