"""Regenerate the pinned product-quantization codebooks in
overmatch_spark/artifacts.py.

Provenance (deterministic, no randomness): PQ_CODEBOOKS — m=8
subvectors of 8 dims each (dim 64), k*=16 codewords per subvector
(4-bit codes, 32 bits per vector = 64x compression vs raw float32),
each subvector codebook trained with the SAME deterministic Lloyd's
recipe as the IVF artifacts (5 iterations, init = first 16 sample
subvectors) on ALL 500 sf0.01 embeddings in vec_id order.

Prints the artifact literal to stdout; paste into artifacts.py.
Literals keep Spark plans and DuckDB oracles identical.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from overmatch_spark.operators.ann import train_ivf_centroids

M, DSUB, KSTAR = 8, 8, 16

if __name__ == "__main__":
    q = ("SELECT embedding FROM "
         "'/root/testdata/sf0.01/embeddings.parquet' ORDER BY vec_id")
    vecs = [list(map(float, r[0])) for r in duckdb.sql(q).fetchall()]
    print("PQ_CODEBOOKS = [")
    for j in range(M):
        subs = [v[j * DSUB:(j + 1) * DSUB] for v in vecs]
        cb = train_ivf_centroids(subs, k=KSTAR, iters=5)
        print("    [")
        for c in cb:
            print(f"        {c!r},")
        print("    ],")
    print("]")
