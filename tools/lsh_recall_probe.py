#!/usr/bin/env python3
"""100-query recall audit of the banded multi-probe LSH path
(`ann_lsh_mp`: 8 bands x 8 bits, <=1-bit probes per band) — the same
statistical instrument as tools/stack_sensitivity_probe.py, for the
family whose 10-query stress pins (min 1.000 at j<=0.15, 0.90 at
j=0.3) needed the corner-luck check like every other family. Planes
are the engine's exact xxh64 lattice (reused from replay_audit);
recall truth is the brute cosine top-10, the gate's own metric.

Usage: python3 tools/lsh_recall_probe.py [replicaDir]
"""
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from replay_audit import floor_mod_signed, xxh64  # noqa: E402

REP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-rep20j0.15"
NQ, K, BITS, BANDS = 100, 10, 64, 8
ROWS = BITS // BANDS

df = pd.read_parquet(f"{REP}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
ids = df.vec_id.to_numpy()
X = np.stack(df.embedding.to_numpy()).astype(np.float64)
o = np.argsort(ids)
ids, X = ids[o], X[o]
n, dim = X.shape
P = np.array([[floor_mod_signed(xxh64(str(p * dim + d).encode()), 1000000)
               / 1000000.0 - 0.5 for d in range(dim)]
              for p in range(BITS)])
bits = (X @ P.T) > 0
weights = (1 << np.arange(ROWS))
bv = np.stack([bits[:, b * ROWS:(b + 1) * ROWS] @ weights
               for b in range(BANDS)], axis=1)  # (n, BANDS) band values
norms = np.linalg.norm(X, axis=1)
C = (X @ X[:NQ].T) / (norms[:, None] * norms[:NQ][None, :])

masks = np.array([0] + [1 << r for r in range(ROWS)])
recalls, cand_frac = [], []
for q in range(NQ):
    cos = C[:, q].copy()
    cos[q] = -2
    truth = set(np.argsort(-cos)[:K].tolist())
    cand = np.zeros(n, dtype=bool)
    for b in range(BANDS):
        cand |= np.isin(bv[:, b], bv[q, b] ^ masks)
    cand[q] = False
    cand_frac.append(cand.sum() / n)
    ci = np.where(cand)[0]
    got = set(ci[np.argsort(-cos[ci])[:K]].tolist())
    recalls.append(len(got & truth) / K)
r = np.array(recalls)
print(f"[lsh] {n} vectors from {REP}")
print(f"ann_lsh_mp recall@10, {NQ} queries: "
      f"avg {r.mean():.3f}  min {r.min():.2f}  p5 {np.percentile(r, 5):.2f}")
# the price of that recall: the fraction of the corpus each query
# exact-scores (its multi-probe candidate set)
print(f"candidate fraction: avg {np.mean(cand_frac):.3f} "
      f"max {np.max(cand_frac):.3f}")
