#!/usr/bin/env python3
"""100-query recall audit of the four remaining serving tiers — the
1-bit Hamming funnel (`ann_ham_rerank`), the int8 tier (`ann_i8_topk`),
the matryoshka prefix funnel (`matryoshka_topk`) and the sparse-JL
funnel (`rp_topk`) — completing the population-scale self-audit that
stack_sensitivity_probe / lsh_recall_probe / ivf_parity_probe started:
EVERY approximate index family's 10-query gate pin gets a 100-query
corner-luck check. Each tier is measured against ITS OWN gated truth
metric (the raw/full dot product its rerank stage maximizes; int8
against the float dot it approximates). Statistical instrument
(vectorized numpy); bit-exact gate replays live in replay_audit.py and
the DuckDB oracles.

Usage: python3 tools/tier_recall_probe.py [replicaDir]
"""
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from replay_audit import floor_mod_signed, xxh64  # noqa: E402

REP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-rep20j0.15"
NQ, K, SHORT, PREFIX, RPDIM = 100, 10, 50, 16, 16

df = pd.read_parquet(f"{REP}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
ids = df.vec_id.to_numpy()
X = np.stack(df.embedding.to_numpy()).astype(np.float64)
o = np.argsort(ids)
ids, X = ids[o], X[o]
n, dim = X.shape
print(f"[tiers] {n} vectors from {REP}")

DOT = X @ X[:NQ].T  # full-dim dot, the rerank/truth metric (n, NQ)


def funnel_recall(stage1_scores, larger_better=True):
    """stage1_scores: (n, NQ); shortlist SHORT by stage 1, rerank by
    full dot, recall vs full-dot truth."""
    recalls = []
    for q in range(NQ):
        d = DOT[:, q].copy()
        d[q] = -np.inf
        truth = set(np.argsort(-d)[:K].tolist())
        s1 = stage1_scores[:, q].copy() if larger_better \
            else -stage1_scores[:, q]
        s1[q] = -np.inf
        short = np.argsort(-s1)[:SHORT]
        got = set(short[np.argsort(-d[short])[:K]].tolist())
        recalls.append(len(got & truth) / K)
    r = np.array(recalls)
    return r.mean(), r.min(), np.percentile(r, 5)


def report(name, stats):
    print(f"{name:18} avg {stats[0]:.3f}  min {stats[1]:.2f}  p5 {stats[2]:.2f}")


# --- 1-bit Hamming funnel: sign bits of the raw dims, Hamming shortlist
bits = X >= 0
ham = np.zeros((n, NQ))
for q in range(NQ):
    ham[:, q] = (bits ^ bits[q]).sum(1)
report("ann_ham_rerank", funnel_recall(ham, larger_better=False))

# --- int8 tier: symmetric per-dim max-abs scales, integer dot ranking
scales = np.abs(X).max(0) / 127.0
scales[scales == 0] = np.inf  # zero-scale dims quantize to 0
Q8 = np.clip(np.floor(X / scales + 0.5), -127, 127)
I8 = Q8 @ Q8[:NQ].T
rec = []
for q in range(NQ):
    d = DOT[:, q].copy()
    d[q] = -np.inf
    truth = set(np.argsort(-d)[:K].tolist())
    s = I8[:, q].copy()
    s[q] = -np.inf
    got = set(np.argsort(-s)[:K].tolist())
    rec.append(len(got & truth) / K)
r = np.array(rec)
report("ann_i8_topk", (r.mean(), r.min(), np.percentile(r, 5)))

# --- matryoshka funnel: prefix-16 dot shortlist, full-dot rerank
report("matryoshka_topk",
       funnel_recall(X[:, :PREFIX] @ X[:NQ, :PREFIX].T))

# --- sparse-JL funnel: Achlioptas s=3 sign matrix from the xxh64 grid
signs = np.zeros((RPDIM, dim))
for j in range(RPDIM):
    for d in range(dim):
        b = floor_mod_signed(xxh64(f"rp:{j}:{d}".encode()), 6)
        signs[j, d] = 1.0 if b == 0 else (-1.0 if b == 1 else 0.0)
R = X @ signs.T
report("rp_topk", funnel_recall(R @ R[:NQ].T))
