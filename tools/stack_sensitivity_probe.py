#!/usr/bin/env python3
"""Sensitivity probe for the trained IVF-PQ + exact-refine stack: the
gate ships constants (nProbe=4 of 16 cells, shortlist=50) — this prices
them, so the choice is measured rather than asserted. Over a 100-QUERY
batch (the statistical instrument, not the 10-query corner-luck gate)
it scans recall@10 of the full three-layer composition across the
(nProbe, shortlist) grid, and attributes loss per layer at the gate's
operating point:

  cell recall       — fraction of true top-10 inside the probed cells
                      (coarse-quantizer loss; the ONLY loss a wider
                      shortlist cannot recover)
  shortlist recall  — fraction of in-cell truth surviving the ADC cut
                      (code-resolution loss; k-proportional when the
                      books' error floor sits below the true gaps)
  stack recall      — the composed number the recall gate pins

This is a STATISTICAL instrument (vectorized numpy float means —
ranking ulps don't move recall stats); the bit-exact third-engine
replay of the gate itself is tools/replay_audit.py.

Usage: python3 tools/stack_sensitivity_probe.py [replicaDir]
(default /tmp/graft-rep20j0.15 — the 20x j=0.15 stress corpus, the
regime the funnel claims were falsified against)
"""
import sys

import numpy as np
import pandas as pd

REP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-rep20j0.15"
NQ, K = 100, 10
CELLS, CELL_ITERS = 16, 3
M, KSUB, SUB, BOOK_ITERS = 4, 16, 16, 2
NPROBES = [1, 2, 4, 8, 16]
SHORTLISTS = [10, 25, 50, 100, 200]

df = pd.read_parquet(f"{REP}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
ids = df.vec_id.to_numpy()
X = np.stack(df.embedding.to_numpy()).astype(np.float64)
order = np.argsort(ids)
ids, X = ids[order], X[order]
n = len(ids)
norms = np.linalg.norm(X, axis=1)
U = X / norms[:, None]
print(f"[probe] {n} vectors from {REP}")


def kmeans(train, k, iters):
    c = train[:k].copy()  # init: first k by vec_id (the trainer's rule)
    for _ in range(iters):
        c2 = (c * c).sum(1)
        a = np.empty(len(train), dtype=int)
        for s in range(0, len(train), 8192):
            blk = train[s:s + 8192]
            a[s:s + 8192] = np.argmin(c2[None, :] - 2 * blk @ c.T, axis=1)
        for p in range(k):
            m = a == p
            if m.any():
                c[p] = train[m].mean(0)
    return c


# --- train both layers exactly like the gate (full-corpus arm)
cents = kmeans(U, CELLS, CELL_ITERS)
cn = np.linalg.norm(cents, axis=1)
S = (X @ cents.T) / (norms[:, None] * cn[None, :])
cell = S.argmax(1)

books = []
codes = np.empty((n, M), dtype=int)
for j in range(M):
    sub = X[:, j * SUB:(j + 1) * SUB]
    bj = kmeans(sub, KSUB, BOOK_ITERS)
    books.append(bj)
    b2 = (bj * bj).sum(1)
    for s in range(0, n, 65536):
        blk = sub[s:s + 65536]
        codes[s:s + 65536, j] = np.argmin(b2[None, :] - 2 * blk @ bj.T,
                                          axis=1)

# --- exact L2 truth for the query batch (vec_id 0..NQ-1: replica-0 base)
qidx = np.arange(NQ)
QD = (X * X).sum(1)[:, None] - 2 * (X @ X[qidx].T) + (X[qidx] * X[qidx]).sum(1)[None, :]

grid = {(p, s): [] for p in NPROBES for s in SHORTLISTS}
cell_rec, short_rec = [], []
for qj, q in enumerate(qidx):
    d2 = QD[:, qj].copy()
    d2[q] = np.inf
    truth = set(np.argsort(d2)[:K])
    # per-query ADC over the whole corpus (restricted per nProbe below)
    adc = np.zeros(n)
    for j in range(M):
        bj = books[j]
        t = (bj * bj).sum(1) - 2 * (bj @ X[q, j * SUB:(j + 1) * SUB])
        adc += t[codes[:, j]]
    probe_order = np.argsort(-S[q])
    for p in NPROBES:
        probes = set(probe_order[:p])
        cand = np.where(np.isin(cell, list(probes)))[0]
        cand = cand[cand != q]
        in_cells = truth & set(cand.tolist())
        if p == 4:
            cell_rec.append(len(in_cells) / K)
        a = adc[cand]
        sl_order = cand[np.argsort(a)]
        for s in SHORTLISTS:
            short = sl_order[:s]
            got = set(short[np.argsort(d2[short])[:K]].tolist())
            grid[(p, s)].append(len(got & truth) / K)
            if p == 4 and s == 50 and in_cells:
                short_rec.append(len(set(short.tolist()) & in_cells)
                                 / len(in_cells))

print(f"\nstack recall@10, {NQ} queries (avg / min):")
hdr = "nProbe\\short " + " ".join(f"{s:>12}" for s in SHORTLISTS)
print(hdr)
for p in NPROBES:
    row = [f"{np.mean(grid[(p, s)]):.3f}/{np.min(grid[(p, s)]):.2f}"
           for s in SHORTLISTS]
    print(f"{p:>12} " + " ".join(f"{r:>12}" for r in row))

print(f"\nlayer attribution at the gate point (nProbe=4, shortlist=50):")
print(f"  cell recall      avg {np.mean(cell_rec):.3f}  min {np.min(cell_rec):.2f}")
print(f"  shortlist recall avg {np.mean(short_rec):.3f}  min {np.min(short_rec):.2f}")
g = grid[(4, 50)]
print(f"  stack recall     avg {np.mean(g):.3f}  min {np.min(g):.2f}")
