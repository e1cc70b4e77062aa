"""Regenerate hyperplanes96.parquet — the random-hyperplane input for
``dedup_embedding_lsh_scaled`` (suite.py), the sign-LSH variant whose band
WIDTH grows with the corpus (rows = clamp(bit_length(n-1), 4, 24), 4 bands,
so up to 4 x 24 = 96 planes — 2^24-vector (16.7M) capacity before the
cap binds).

Same device as gen_hyperplanes16.py: small-integer components over the
64-dim embedding space, seeded so both engines read the SAME planes and
compute bit-identical sign bits (|dot| <= 64 * 1000 * 8 << 2^53).

Run from the repo root:  python tests/fixtures/gen_hyperplanes96.py
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

H, D, SEED = 96, 64, 20260821

rng = np.random.default_rng(SEED)
planes = rng.integers(-8, 9, size=(H, D))

tbl = pa.table({
    "plane_id": pa.array(range(H), pa.int32()),
    "hv": pa.array([p.tolist() for p in planes], pa.list_(pa.int64())),
})
out = os.path.join(os.path.dirname(__file__), "hyperplanes96.parquet")
pq.write_table(tbl, out)
print(f"wrote {out}: {H} planes x {D} dims")
