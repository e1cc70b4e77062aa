"""Regenerate hyperplanes16.parquet — the shared random-hyperplane input for
``dedup_embedding_lsh`` (suite.py).

16 hyperplanes of small-integer components over the 64-dim embedding space,
seeded so both engines read the SAME planes: the Spark query broadcasts this
16-row dim table, the DuckDB oracle joins it, and each computes the sign-LSH
signatures independently. Integer components (and floor(x*1000) integer
embeddings) keep every projection exactly representable in a double
(|dot| < 2^53), so the sign bit is bit-identical across engines regardless
of summation order.

Run from the repo root:  python tests/fixtures/gen_hyperplanes16.py
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

H, D, SEED = 16, 64, 20260817

rng = np.random.default_rng(SEED)
planes = rng.integers(-8, 9, size=(H, D))

tbl = pa.table({
    "plane_id": pa.array(range(H), pa.int32()),
    "hv": pa.array([p.tolist() for p in planes], pa.list_(pa.int64())),
})
out = os.path.join(os.path.dirname(__file__), "hyperplanes16.parquet")
pq.write_table(tbl, out)
print(f"wrote {out}: {H} planes x {D} dims")
