"""Regenerate audio_feat40.parquet — the DuckDB oracle side-table for
``av_audio_features`` (suite.py).

Driver-side, pure numpy (no Spark): for each of the 40 folded audio ids the
suite query uses (doc_id % 40), synthesize the deterministic PCM, DECODE the
encoded bytes, and compute duration/RMS/peak — exactly the per-row semantics
the distributed mapInPandas path must reproduce.

Run from the repo root:  python tests/fixtures/gen_audio_feat40.py
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pttcrawler_spark.synth import av  # noqa: E402
from pttcrawler_spark.synth.images import seed_for  # noqa: E402

N_IDS = 40
RATE = 8000


def main() -> None:
    rows = []
    for i in range(N_IDS):
        aid = str(i)
        seconds = 1.0 + (seed_for(aid) % 1000) / 1000.0
        pcm = av.make_waveform(aid, RATE, seconds)
        dec, rate = av.decode_audio(av.encode_audio(pcm, RATE))
        assert rate == RATE and (dec == pcm).all()
        x = dec.astype(np.float64) / 32768.0
        rows.append({
            "audio_id": aid,
            "duration_s": round(len(dec) / rate, 6),
            "rms": round(float(np.sqrt(np.mean(x * x))), 6),
            "peak": round(float(np.max(np.abs(x))), 6),
        })
    out = pd.DataFrame(rows)
    path = os.path.join(os.path.dirname(__file__), "audio_feat40.parquet")
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows")


if __name__ == "__main__":
    main()
