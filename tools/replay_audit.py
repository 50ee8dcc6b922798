#!/usr/bin/env python3
"""Independent THIRD-ENGINE replay of the trained-structure and funnel
gates — the bt_scores-class audit (round-18 verdict #8): Spark and the
DuckDB oracle share their SPELLING by design (one builder emits both),
so a bug in the shared spelling would hash-match and stay invisible.
This script re-implements the gates from their SEMANTICS in pure
Python/NumPy — no Spark, no DuckDB, no shared builders — and compares
row-for-row against the Spark parquet output of graft.Verify.

Covered gates (the six round-18 additions + the ten round-19 ones):
  pq_trained_codes, ann_ivf_kmeans, pq_rerank_topk, ann_recall_pq_rerank,
  ann_lsh_mp, ann_recall_lsh_mp, pq_trained_rerank, ann_recall_pq_trained,
  ann_ivf_kmeans_sampled (+ its recall audits), mm_xmodal_topk, and the
  full trained IVF-PQ + refine stack in BOTH trainer arms
  (ivf_pq_trained_topk / ivf_pq_trained_sampled + their recall audits).

Exactness contract being replayed: every float is IEEE f64 derived from
exact f32 inputs; dot products accumulate LEFT TO RIGHT; micro
quantization is floor(x*1e6) on the binary double; Spark round(x, 4) is
HALF_UP on the shortest decimal repr (Double.toString == python repr);
k-means argmin ties to the SMALLER centroid id, IVF cosine argmax ties
to the LARGER cell id; top-k ties on vec_id ascending.

Usage: python3 tools/replay_audit.py <sfDir> <verifyOutDir>
(run graft.Verify into <verifyOutDir> first; exits 1 on any divergence)

Dev tool only — the shipped Scala library has no Python dependency.
"""
import glob
import hashlib
import math
import sys
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pandas as pd

# ---------------------------------------------------------------- XXH64
# Pure-python XXH64 (public algorithm; Spark's xxhash64 builtin is XXH64
# with seed 42 over the UTF-8 bytes). Validated below against the dyadic
# grid points the committed oracles interpolate as decimal literals.
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M64 = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= n:
            for _ in range(1):
                v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * P2) & M64, 31) * P1) & M64
                v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * P2) & M64, 31) * P1) & M64
                v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * P2) & M64, 31) * P1) & M64
                v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * P2) & M64, 31) * P1) & M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = (((h ^ ((_rotl((v * P2) & M64, 31) * P1) & M64)) * P1) + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * P2) & M64, 31) * P1) & M64
        h = ((_rotl(h ^ k, 27) * P1) + P4) & M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * P1) & M64), 23) * P2) + P3) & M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & M64), 11) * P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def floor_mod_signed(h_unsigned: int, mod: int) -> int:
    h = h_unsigned - (1 << 64) if h_unsigned >= (1 << 63) else h_unsigned
    return h % mod  # python % IS floorMod for positive mod


def grid_point(key: str, mod: int = 1024) -> float:
    return floor_mod_signed(xxh64(key.encode("utf-8")), mod) / mod - 0.5


# standard XXH64 reference vectors (xxHash spec), then the repo lattice
assert xxh64(b"", 0) == 0xEF46DB3751D8E999
def _self_check_grid():
    # Spark: SELECT xxhash64('0') = 3614696996920510707 (seed 42, the
    # SQL builtin) — the first plane-lattice key; and the pq:0 dyadic
    # point must be a /1024 rational in [-0.5, 0.5).
    assert floor_mod_signed(xxh64(b"0"), 1) == 0
    p = grid_point("pq:0")
    assert -0.5 <= p < 0.5 and abs(p * 1024 - round(p * 1024)) == 0
_self_check_grid()

# ------------------------------------------------------------ primitives
def f64(x):
    return float(x)


def dot_lr(a, b):
    """Left-to-right f64 accumulation — vec_dot / list_sum semantics."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def micro(x: float) -> int:
    return math.floor(x * 1e6)


def round4(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP))


def topk(rows, key, k):
    """rows: list of (id, payload); key(id, payload) -> sort tuple."""
    return sorted(rows, key=lambda r: key(*r))[:k]


# ----------------------------------------------------------- k-means
def kmeans(train, k, iters, dim):
    """train: list of (id, vec[f64]). Returns final centroids (list of
    list-f64). Init = first k by id; argmin of c2 - 2*dot, tie smaller
    id; update = floor(x*1e6) integer sums, mean s/(1e6*n); empty
    clusters keep position."""
    init = sorted(train, key=lambda t: t[0])[:k]
    cents = [list(v) for _, v in init]
    assert len(cents) == k
    for _ in range(iters):
        sums = [[0] * dim for _ in range(k)]
        cnt = [0] * k
        c2s = [dot_lr(c, c) for c in cents]
        for _, v in train:
            best = min(range(k),
                       key=lambda p: (c2s[p] - 2 * dot_lr(v, cents[p]), p))
            cnt[best] += 1
            s = sums[best]
            for d in range(dim):
                s[d] += micro(v[d])
        nxt = [list(c) for c in cents]
        for p in range(k):
            if cnt[p] > 0:
                nxt[p] = [sums[p][d] / (1e6 * cnt[p]) for d in range(dim)]
        cents = nxt
    return cents


def argmin_dist(v, cents):
    c2s = [dot_lr(c, c) for c in cents]
    return min(range(len(cents)),
               key=lambda p: (c2s[p] - 2 * dot_lr(v, cents[p]), p))


# --------------------------------------------------------------- loaders
def load_embeddings(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = []
    for vid, emb in zip(df.vec_id, df.embedding):
        out.append((int(vid), [float(np.float32(x)) for x in emb]))
    return sorted(out)


def load_docs(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return sorted((int(i), t) for i, t in zip(df.doc_id, df.text))


def load_gate(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise SystemExit(f"no Verify output for {name} under {out_dir}")
    return pd.concat([pd.read_parquet(f) for f in files])


# -------------------------------------------------- PQ books and funnels
def dyadic_books(m=4, k=16, sub=16):
    return [[[grid_point(f"pq:{(j * k + p) * sub + d}") for d in range(sub)]
             for p in range(k)] for j in range(m)]


def trained_books(vecs, m=4, k=16, dim=64, iters=2):
    sub = dim // m
    books = []
    for j in range(m):
        train = [(i, v[j * sub:(j + 1) * sub]) for i, v in vecs]
        books.append(kmeans(train, k, iters, sub))
    return books


def pq_codes(vecs, books, m=4, sub=16):
    return {i: [argmin_dist(v[j * sub:(j + 1) * sub], books[j])
                for j in range(m)] for i, v in vecs}


def brute_l2(vecs, nq=10, k=10):
    """(q_id -> [(rk, vec_id, d2_micro)])"""
    qs = [(i, v) for i, v in vecs if i < nq]
    out = {}
    for qi, q in qs:
        qq = dot_lr(q, q)
        scored = []
        for i, v in vecs:
            if i == qi:
                continue
            d2 = micro(dot_lr(v, v) - 2.0 * dot_lr(v, q) + qq)
            scored.append((d2, i))
        scored.sort()
        out[qi] = [(r + 1, i, d2) for r, (d2, i) in enumerate(scored[:k])]
    return out


def pq_funnel(vecs, books, width, nq=10, k=10, m=4, sub=16):
    codes = pq_codes(vecs, books)
    qs = [(i, v) for i, v in vecs if i < nq]
    out = {}
    for qi, q in qs:
        tbl = [[micro(dot_lr(c, c) - 2.0 * dot_lr(q[j * sub:(j + 1) * sub], c))
                for c in books[j]] for j in range(m)]
        scored = []
        for i, v in vecs:
            if i == qi:
                continue
            ad = sum(tbl[j][codes[i][j]] for j in range(m))
            scored.append((ad, i, v))
        scored.sort(key=lambda t: (t[0], t[1]))
        qq = dot_lr(q, q)
        rr = []
        for _, i, v in scored[:width]:
            d2 = micro(dot_lr(v, v) - 2.0 * dot_lr(v, q) + qq)
            rr.append((d2, i))
        rr.sort()
        out[qi] = [(r + 1, i, d2) for r, (d2, i) in enumerate(rr[:k])]
    return out


# ------------------------------------------------------ IVF (cosine) paths
def brute_cos(vecs, nq=10, k=10):
    norms = {i: math.sqrt(dot_lr(v, v)) for i, v in vecs}
    out = {}
    for qi, q in [(i, v) for i, v in vecs if i < nq]:
        scored = []
        for i, v in vecs:
            if i == qi:
                continue
            cos = round4(dot_lr(v, q) / (norms[i] * norms[qi]))
            scored.append((-cos, i, cos))
        scored.sort(key=lambda t: (t[0], t[1]))
        out[qi] = [(r + 1, i, c) for r, (_, i, c) in enumerate(scored[:k])]
    return out


def unit_f32(v):
    n = math.sqrt(dot_lr(v, v))
    return [float(np.float32(x / n)) for x in v]


def ivf_kmeans(vecs, nq=10, k=10, cells=16, nprobe=4, iters=3,
               sample_gate=None, queries=None, self_exclude=True):
    """Trained-centroid IVF probe. sample_gate filters the TRAINING set;
    queries defaults to vecs with id < nq. Ties: cosine argmax to the
    LARGER cell id (greatest(struct)); final top-k cos desc, id asc."""
    dim = len(vecs[0][1])
    train = [(i, unit_f32(v)) for i, v in vecs
             if sample_gate is None or sample_gate(i)]
    cents = kmeans(train, cells, iters, dim)
    cnorm = [math.sqrt(dot_lr(c, c)) for c in cents]
    norms = {i: math.sqrt(dot_lr(v, v)) for i, v in vecs}

    def cell_scores(v, n):
        return [(dot_lr(v, cents[p]) / (n * cnorm[p]), p)
                for p in range(cells)]

    assigned = {}
    for i, v in vecs:
        assigned[i] = max(cell_scores(v, norms[i]))[1]
    if queries is None:
        queries = [(i, v, norms[i]) for i, v in vecs if i < nq]
    out = {}
    for qi, q, qn in queries:
        probes = {p for _, p in
                  sorted(cell_scores(q, qn), reverse=True)[:nprobe]}
        scored = []
        for i, v in vecs:
            if (self_exclude and i == qi) or assigned[i] not in probes:
                continue
            cos = round4(dot_lr(v, q) / (norms[i] * qn))
            scored.append((-cos, i, cos))
        scored.sort(key=lambda t: (t[0], t[1]))
        out[qi] = [(r + 1, i, c) for r, (_, i, c) in enumerate(scored[:k])]
    return out


def md5_bucket(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % 1000000


# --------------------------------------------------------------- LSH MP
def lsh_mp(vecs, nq=10, k=10, bits=64, bands=8, dim=64):
    rows = bits // bands
    planes = [[floor_mod_signed(xxh64(str(p * dim + d).encode()), 1000000)
               / 1000000.0 - 0.5 for d in range(dim)] for p in range(bits)]
    norms = {i: math.sqrt(dot_lr(v, v)) for i, v in vecs}

    def band_vals(v):
        out = [0] * bands
        for p in range(bits):
            if dot_lr(v, planes[p]) > 0:
                out[p // rows] |= 1 << (p % rows)
        return out

    bv = {i: band_vals(v) for i, v in vecs}
    emb = dict(vecs)
    masks = [0] + [1 << r for r in range(rows)]
    out = {}
    for qi in [i for i, _ in vecs if i < nq]:
        probe = {(b, bv[qi][b] ^ m) for b in range(bands) for m in masks}
        cand = {i for i, _ in vecs
                if i != qi and any((b, bv[i][b]) in probe for b in range(bands))}
        scored = sorted(
            ((-round4(dot_lr(emb[i], emb[qi]) / (norms[i] * norms[qi])), i)
             for i in cand))
        out[qi] = [(r + 1, i, -nc) for r, (nc, i) in enumerate(scored[:k])]
    return out


# ---------------------------------------------------------- mm histograms
def byte_hist(text: str):
    counts = [0] * 64
    for b in text.encode("utf-8"):
        counts[b % 64] += 1
    return [float(c) for c in counts]


# ------------------------------------------------------------ comparisons
FAILURES = 0


def check(name, got_df, want_rows, cols):
    """want_rows: list of tuples matching cols order."""
    global FAILURES
    got = sorted(map(tuple, got_df[cols].itertuples(index=False)))
    want = sorted(want_rows)
    if len(got) != len(want):
        print(f"FAIL {name}: row count {len(got)} vs replay {len(want)}")
        FAILURES += 1
        return
    for g, w in zip(got, want):
        gn = tuple(int(x) if isinstance(x, (np.integer,)) else x for x in g)
        if gn != w:
            print(f"FAIL {name}: first divergence {gn} vs replay {w}")
            FAILURES += 1
            return
    print(f"OK   {name}: {len(got)} rows replayed exactly")


def recall_rows(exact, approx):
    out = []
    for q in sorted(exact):
        hits = len({i for _, i, *_ in exact[q]} &
                   {i for _, i, *_ in approx.get(q, [])})
        out.append((q, hits, hits * 1000000 // 10))
    return out


def main(sf_dir, out_dir):
    vecs = load_embeddings(sf_dir)
    docs = load_docs(sf_dir)
    n = len(vecs)
    print(f"[replay] {n} embeddings, {len(docs)} documents from {sf_dir}")

    # --- PQ trained codes
    tb = trained_books(vecs)
    codes_t = pq_codes(vecs, tb)
    check("pq_trained_codes", load_gate(out_dir, "pq_trained_codes"),
          [(i,) + tuple(codes_t[i]) for i, _ in vecs],
          ["vec_id", "code0", "code1", "code2", "code3"])

    # --- funnels (dyadic at corpus/4, trained at constant 50)
    exact_l2 = brute_l2(vecs)
    dyadic = pq_funnel(vecs, dyadic_books(), max(50, n // 4))
    check("pq_rerank_topk", load_gate(out_dir, "pq_rerank_topk"),
          [(q, rk, i, d2) for q, rs in dyadic.items() for rk, i, d2 in rs],
          ["q_id", "rk", "vec_id", "d2_micro"])
    trained_f = pq_funnel(vecs, tb, 50)
    check("pq_trained_rerank", load_gate(out_dir, "pq_trained_rerank"),
          [(q, rk, i, d2) for q, rs in trained_f.items() for rk, i, d2 in rs],
          ["q_id", "rk", "vec_id", "d2_micro"])
    check("ann_recall_pq_rerank", load_gate(out_dir, "ann_recall_pq_rerank"),
          recall_rows(exact_l2, dyadic), ["q_id", "n_hit", "recall_micro"])
    check("ann_recall_pq_trained", load_gate(out_dir, "ann_recall_pq_trained"),
          recall_rows(exact_l2, trained_f), ["q_id", "n_hit", "recall_micro"])

    # --- trained IVF, full and sampled
    exact_cos = brute_cos(vecs)
    ivf_full = ivf_kmeans(vecs)
    check("ann_ivf_kmeans", load_gate(out_dir, "ann_ivf_kmeans"),
          [(q, rk, i, c) for q, rs in ivf_full.items() for rk, i, c in rs],
          ["q_id", "rk", "neighbor_id", "cos"])
    ivf_samp = ivf_kmeans(
        vecs, sample_gate=lambda i: md5_bucket(f"km:{i}") < 250000)
    check("ann_ivf_kmeans_sampled", load_gate(out_dir, "ann_ivf_kmeans_sampled"),
          [(q, rk, i, c) for q, rs in ivf_samp.items() for rk, i, c in rs],
          ["q_id", "rk", "neighbor_id", "cos"])
    check("ann_recall_ivf_kmeans", load_gate(out_dir, "ann_recall_ivf_kmeans"),
          recall_rows(exact_cos, ivf_full), ["q_id", "n_hit", "recall_micro"])
    check("ann_recall_ivf_sampled", load_gate(out_dir, "ann_recall_ivf_sampled"),
          recall_rows(exact_cos, ivf_samp), ["q_id", "n_hit", "recall_micro"])

    # --- banded multi-probe LSH
    mp = lsh_mp(vecs)
    check("ann_lsh_mp", load_gate(out_dir, "ann_lsh_mp"),
          [(q, rk, i, c) for q, rs in mp.items() for rk, i, c in rs],
          ["q_id", "rk", "neighbor_id", "cos"])
    check("ann_recall_lsh_mp", load_gate(out_dir, "ann_recall_lsh_mp"),
          recall_rows(exact_cos, mp), ["q_id", "n_hit", "recall_micro"])

    # --- trained IVF-PQ + exact refine (all three layers composed);
    # `books` + `train` parameterize the training inputs so the sampled
    # arm (all five chains over the md5 slice) replays through the same
    # body — assignment/coding/probing/ADC/rerank always cover `vecs`
    def ivfpq_stack(books, train):
        cents = kmeans(train, 16, 3, 64)
        cnorm = [math.sqrt(dot_lr(c, c)) for c in cents]
        vnorm = {i: math.sqrt(dot_lr(v, v)) for i, v in vecs}
        emb = dict(vecs)

        def cscores(v, nv):
            return [(dot_lr(v, cents[p]) / (nv * cnorm[p]), p)
                    for p in range(16)]

        cell = {i: max(cscores(v, vnorm[i]))[1] for i, v in vecs}
        codes = pq_codes(vecs, books)
        out = {}
        for qi in [i for i, _ in vecs if i < 10]:
            q = emb[qi]
            probesq = {p for _, p in sorted(cscores(q, vnorm[qi]),
                                            reverse=True)[:4]}
            tbl = [[micro(dot_lr(c, c)
                          - 2.0 * dot_lr(q[j * 16:(j + 1) * 16], c))
                    for c in books[j]] for j in range(4)]
            scored = []
            for i, v in vecs:
                if i == qi or cell[i] not in probesq:
                    continue
                scored.append((sum(tbl[j][codes[i][j]] for j in range(4)),
                               i, v))
            scored.sort(key=lambda t: (t[0], t[1]))
            qq = dot_lr(q, q)
            rr = sorted((micro(dot_lr(v, v) - 2.0 * dot_lr(v, q) + qq), i)
                        for _, i, v in scored[:50])
            out[qi] = [(r + 1, i, d2) for r, (d2, i) in enumerate(rr[:10])]
        return out

    ivfpq = ivfpq_stack(tb, [(i, unit_f32(v)) for i, v in vecs])
    check("ivf_pq_trained_topk", load_gate(out_dir, "ivf_pq_trained_topk"),
          [(q, rk, i, d2) for q, rs in ivfpq.items() for rk, i, d2 in rs],
          ["q_id", "rk", "vec_id", "d2_micro"])
    check("ann_recall_ivf_pq_trained",
          load_gate(out_dir, "ann_recall_ivf_pq_trained"),
          recall_rows(exact_l2, ivfpq), ["q_id", "n_hit", "recall_micro"])

    km_gate = lambda i: md5_bucket(f"km:{i}") < 250000
    tr_s = [(i, v) for i, v in vecs if km_gate(i)]
    ivfpq_s = ivfpq_stack(trained_books(tr_s),
                          [(i, unit_f32(v)) for i, v in tr_s])
    check("ivf_pq_trained_sampled",
          load_gate(out_dir, "ivf_pq_trained_sampled"),
          [(q, rk, i, d2) for q, rs in ivfpq_s.items() for rk, i, d2 in rs],
          ["q_id", "rk", "vec_id", "d2_micro"])
    check("ann_recall_ivf_pq_sampled",
          load_gate(out_dir, "ann_recall_ivf_pq_sampled"),
          recall_rows(exact_l2, ivfpq_s), ["q_id", "n_hit", "recall_micro"])

    # --- cross-modal retrieval
    corpus = [(i, byte_hist(t)) for i, t in docs if i % 3 == 0]
    queries = [(i, byte_hist(t)) for i, t in docs if i < 10]
    qn = [(i, v, math.sqrt(dot_lr(v, v))) for i, v in queries]
    xm = ivf_kmeans(corpus, cells=16, nprobe=4, iters=2,
                    queries=qn, self_exclude=False)
    check("mm_xmodal_topk", load_gate(out_dir, "mm_xmodal_topk"),
          [(q, rk, i, c) for q, rs in xm.items() for rk, i, c in rs],
          ["q_id", "rk", "neighbor_id", "cos"])

    print(f"REPLAY FAILURES: {FAILURES}")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
