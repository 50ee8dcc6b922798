#!/usr/bin/env python3
"""PQ resolution scan (round 19): worst true-top-10 ADC rank under
TRAINED per-subspace books across (m, k) code sizes, on the 20x jitter
corpora — the measurement behind pqTrainedRerankTopK's SCOPE paragraph.

Result on this box (40k vectors): at j=0.15 every config reads worst
rank 19-20 (= the replica-cluster size, k-proportional); at j=0.3 every
config from 4 to 16 bytes/vector reads a CORPUS-FRACTION band
(2.2k-19k of 40k) because PQ reconstruction error at that jitter scale
is comparable to the true neighbor gap itself — no sub-corpus shortlist
can hold a 0.9 recall floor there, for ANY books. Statistical
instrument (plain numpy means); the bit-exact gate replay is
tools/replay_audit.py.

Usage: python3 tools/pq_resolution_probe.py
"""
import numpy as np, pandas as pd, sys
def load(rep):
    df = pd.read_parquet(f'{rep}/embeddings.parquet', columns=['vec_id','embedding'])
    ids = df.vec_id.to_numpy(); X = np.stack(df.embedding.to_numpy()).astype(np.float64)
    o=np.argsort(ids); return ids[o], X[o]
def kmeans(train,k,iters=2):
    c=train[:k].copy()
    for _ in range(iters):
        c2=(c*c).sum(1); a=np.argmin(c2[None,:]-2*train@c.T,axis=1)
        for p in range(k):
            mk=a==p
            if mk.any(): c[p]=train[mk].mean(0)
    return c
def worst_ranks(X,m,k):
    n=len(X); sub=64//m
    books=[kmeans(X[:, j*sub:(j+1)*sub],k) for j in range(m)]
    codes=np.stack([np.argmin(((books[j]*books[j]).sum(1))[None,:]-2*X[:,j*sub:(j+1)*sub]@books[j].T,axis=1) for j in range(m)],axis=1)
    ws=[]
    for q in range(10):
        qv=X[q]; d2=((X-qv)**2).sum(1); d2[q]=np.inf
        truth=np.argsort(d2)[:10]
        ad=np.zeros(n)
        for j in range(m):
            tbl=((books[j]*books[j]).sum(1)) - 2*books[j]@qv[j*sub:(j+1)*sub]
            ad+=tbl[codes[:,j]]
        ad[q]=np.inf
        ranks=np.empty(n); ranks[np.argsort(ad)]=np.arange(1,n+1)
        ws.append(int(ranks[truth].max()))
    return ws
for rep,tag in [('/tmp/graft-rep20j0.3','j0.3'),('/tmp/graft-rep20j0.15','j0.15')]:
    ids,X=load(rep)
    for m,k in [(4,16),(8,16),(4,256),(8,256),(16,16)]:
        ws=worst_ranks(X,m,k)
        print(f'{tag} m={m} k={k} ({m*(1 if k<=256 else 2)}B/vec): worst={max(ws)} med={int(np.median(ws))}')
