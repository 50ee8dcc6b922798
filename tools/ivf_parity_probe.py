#!/usr/bin/env python3
"""Statistical parity probe for the SAMPLE-trained IVF arm (round-19
verdict #5): full-corpus vs quarter-sample Lloyd training, recall@10
measured over a 100-QUERY batch instead of the gate's 10 — because on a
structureless (near-uniform) corpus, cell boundaries are arbitrary
under EITHER trainer and a 10-query min-recall is a corner-luck draw,
not a trainer-quality signal (measured: the 10-query gate reads full
min 1.00 vs sampled 0.60 at 20x j=0.15, while THIS probe reads
full avg/min/p5 = 0.943/0.5/0.7 vs sampled 0.947/0.5/0.7 — identical
distributions, the sampled arm marginally ahead).

This is a STATISTICAL instrument (plain numpy float means, vectorized
dots — ranking ulps don't move recall stats); the bit-exact third-engine
replay of the gates themselves is tools/replay_audit.py.

Usage: python3 tools/ivf_parity_probe.py [replicaDir]
(default /tmp/graft-rep20j0.15 — the 20x j=0.15 stress corpus)
"""
import hashlib
import sys

import numpy as np
import pandas as pd

REP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-rep20j0.15"
NQ, K, CELLS, NPROBE, ITERS = 100, 10, 16, 4, 3
FRACTION_CUT = 250000  # = IvfKmeansSampleFraction * 1e6

df = pd.read_parquet(f"{REP}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
ids = df.vec_id.to_numpy()
X = np.stack(df.embedding.to_numpy()).astype(np.float64)
order = np.argsort(ids)
ids, X = ids[order], X[order]
n = len(ids)
norms = np.linalg.norm(X, axis=1)
U = X / norms[:, None]


def kmeans(train, k=CELLS, iters=ITERS):
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


def arm(mask):
    cents = kmeans(U[mask])
    cn = np.linalg.norm(cents, axis=1)
    S = (X @ cents.T) / (norms[:, None] * cn[None, :])
    cell = S.argmax(1)
    qidx = np.arange(NQ)  # vec_id 0..NQ-1: the pristine replica-0 base
    C = (X @ X[qidx].T) / (norms[:, None] * norms[qidx][None, :])
    recalls = []
    for j, q in enumerate(qidx):
        cos = C[:, j].copy()
        cos[q] = -2
        truth = set(np.argsort(-cos)[:K])
        probes = set(np.argsort(-S[q])[:NPROBE])
        cand = np.where(np.isin(cell, list(probes)))[0]
        cand = cand[cand != q]
        got = set(cand[np.argsort(-cos[cand])[:K]])
        recalls.append(len(got & truth) / K)
    r = np.array(recalls)
    return r.mean(), r.min(), np.percentile(r, 5)


def md5b(i):
    return int(hashlib.md5(f"km:{i}".encode()).hexdigest()[:15], 16) % 1000000


samp = np.array([md5b(i) < FRACTION_CUT for i in ids])
print(f"corpus {n}, sample {samp.sum()}")
fa, fm, fp = arm(np.ones(n, bool))
sa, sm, sp = arm(samp)
print(f"full    avg/min/p5: {fa:.3f}/{fm:.2f}/{fp:.2f}")
print(f"sampled avg/min/p5: {sa:.3f}/{sm:.2f}/{sp:.2f}")
# parity verdict: averages within 3 points, tails within 1 bucket
ok = abs(fa - sa) <= 0.03 and abs(fp - sp) <= 0.1
print(f"PARITY: {'OK' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
