#!/usr/bin/env python3
"""Offline recall/cost sweep for the banded sign-sketch ANN retrieval.

Mirrors graft.functions.SignSketchExpr exactly (integer hyperplanes,
sign of dot) so results predict the Spark operator's behavior.
Driver-side measurement tool only -- not part of the library.
"""
import sys
import numpy as np
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
t = pq.read_table(f"{sf}/embeddings.parquet")
ids = np.array(t["vec_id"].to_pylist())
V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
n, dims = V.shape
print(f"corpus n={n} dims={dims}")

norms = np.linalg.norm(V, axis=1)
S = (V @ V.T) / np.outer(norms, norms)
np.fill_diagonal(S, -2.0)

K = 10
# exact top-k per row, tie-break by vec_id asc on equal sim
order = np.lexsort((np.arange(n)[None, :].repeat(n, 0), -S))
topk = order[:, :K]

qmask = ids % 7 == 0
qidx = np.where(qmask)[0]
print(f"queries={len(qidx)}")


def weights(nplanes, a, b, m):
    j = np.arange(nplanes)[:, None]
    d = np.arange(dims)[None, :]
    return ((j * a + d * b) % m - m // 2).astype(np.float64)


def sketch(W, bands, bits):
    bitsmat = (V @ W.T) > 0  # n x (bands*bits)
    out = np.zeros((n, bands), dtype=np.int64)
    for b in range(bands):
        for k in range(bits):
            out[:, b] |= bitsmat[:, b * bits + k].astype(np.int64) << k
    return out


def popcount(x):
    c = np.zeros_like(x)
    while np.any(x):
        c += x & 1
        x >>= 1
    return c


def run(name, bands, bits, radius, a, b, m):
    W = weights(bands * bits, a, b, m)
    nd = len(np.unique(W, axis=0))
    B = sketch(W, bands, bits)
    recalls, cands = [], []
    r0 = c0 = None
    for q in qidx:
        ham = popcount(B ^ B[q][None, :])  # n x bands
        cand = np.any(ham <= radius, axis=1)
        cand[q] = False
        cands.append(cand.sum())
        hits = np.intersect1d(np.where(cand)[0], topk[q]).size
        recalls.append(hits / K)
        if ids[q] == 0:
            r0, c0 = hits / K, cand.sum()
    print(f"{name:22s} bands={bands:2d} bits={bits:2d} r={radius} "
          f"planes={nd:3d} mean_recall={np.mean(recalls):.3f} "
          f"mean_cand={np.mean(cands):6.1f} ({np.mean(cands)/n*100:4.1f}%) "
          f"vec0_recall={r0} vec0_cand={c0}")


# current family: ((j*37 + d*101) % 13) - 6
run("cur 4x16 r0 (q48)", 4, 16, 0, 37, 101, 13)
# wider family: ((j*1009 + d*31) % 211) - 105
run("new 8x8 r1", 8, 8, 1, 1009, 31, 211)
run("new 8x8 r2", 8, 8, 2, 1009, 31, 211)
run("new 16x6 r1", 16, 6, 1, 1009, 31, 211)
run("new 16x6 r2", 16, 6, 2, 1009, 31, 211)
run("new 20x6 r1", 20, 6, 1, 1009, 31, 211)
run("new 24x6 r1", 24, 6, 1, 1009, 31, 211)
run("new 32x6 r1", 32, 6, 1, 1009, 31, 211)
run("new 16x5 r1", 16, 5, 1, 1009, 31, 211)
run("new 24x5 r1", 24, 5, 1, 1009, 31, 211)
run("new 12x6 r1", 12, 6, 1, 1009, 31, 211)
run("new 12x6 r2", 12, 6, 2, 1009, 31, 211)
run("new 24x8 r2", 24, 8, 2, 1009, 31, 211)
run("new 32x8 r2", 32, 8, 2, 1009, 31, 211)
run("new 16x8 r2", 16, 8, 2, 1009, 31, 211)
