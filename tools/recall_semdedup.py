#!/usr/bin/env python3
"""Dev-only: measure semantic-dedup blocking recall vs nprobe.

Replicates the engine's deterministic pipeline in numpy/int arithmetic —
quantize (x*10000 round-half-even like Spark/DuckDB round), seed every
m-th vector (m = max(50, floor(sqrt(n)))), 2 Lloyd floor-mean rounds,
signed-cos^2 assignment with cid tiebreak — then compares per-nprobe
blocked pairs against the all-pairs truth at tau = 1/sqrt(8).

Usage: python3 tools/recall_semdedup.py /root/testdata/sf0.01 [max_nprobe]
"""
import sys
import numpy as np
import pandas as pd

sf = sys.argv[1]
max_np = int(sys.argv[2]) if len(sys.argv) > 2 else 6

emb = pd.read_parquet(f"{sf}/embeddings.parquet")
emb = emb.sort_values("vec_id").reset_index(drop=True)
ids = emb.vec_id.to_numpy()
# round-half-even matches both engines' round() on doubles
E = np.array([np.round(np.asarray(v, dtype=np.float64) * 10000).astype(np.int64)
              for v in emb.embedding], dtype=np.int64)
n = len(ids)
nrm = (E * E).sum(axis=1)

m = max(50, int(np.floor(np.sqrt(n))))
sel = ids % m == 0
cids = ids[sel]
C = E[sel].copy()


def assign_rank1(C, cids, cn):
    dot = E @ C.T                       # n x k
    key = (dot.astype(np.float64) ** 2) / (nrm[:, None] * cn[None, :])
    key = np.where(dot < 0, -key, key)
    # argmax with cid (ascending) tiebreak: cids sorted ascending already
    return np.argmax(key, axis=1), key


for it in range(2):
    cn = (C * C).sum(axis=1)
    a, _ = assign_rank1(C, cids, cn)
    newC, newIds = [], []
    for j in range(len(cids)):
        mask = a == j
        if mask.sum() == 0:
            continue
        newC.append(np.floor(E[mask].sum(axis=0) / mask.sum()).astype(np.int64))
        newIds.append(cids[j])
    C = np.array(newC)
    cids = np.array(newIds)

cn = (C * C).sum(axis=1)
dot = E @ C.T
key = (dot.astype(np.float64) ** 2) / (nrm[:, None] * cn[None, :])
key = np.where(dot < 0, -key, key)
order = np.argsort(-key, axis=1, kind="stable")  # cid tiebreak = index order

# all-pairs truth at tau = 1/sqrt(8): dot>0 and 8*dot^2 >= nrm_a*nrm_b
G = E @ E.T
iu = np.triu_indices(n, 1)
d = G[iu]
# Cauchy-Schwarz bounds |dot| <= 1e8 on this lattice, so 8*dot^2 <= 8e16
# fits int64 exactly (same argument the engine's scaladoc makes)
true_mask = (d > 0) & (8 * d * d >= nrm[iu[0]] * nrm[iu[1]])
true_pairs = set(zip(iu[0][true_mask], iu[1][true_mask]))
true_drops = set(max(ids[a_], ids[b_]) for a_, b_ in true_pairs)
print(f"n={n} k={len(cids)} true_pairs={len(true_pairs)} "
      f"true_drops={len(true_drops)}")

for npb in range(1, max_np + 1):
    cells = order[:, :npb]
    # invert: cell -> member row indices
    members = {}
    for i in range(n):
        for c in cells[i]:
            members.setdefault(c, []).append(i)
    blocked = set()
    for c, mem in members.items():
        mem = np.array(mem)
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                a_, b_ = sorted((mem[x], mem[y]))
                blocked.add((a_, b_))
    hit = blocked & true_pairs
    drops = set(max(ids[a_], ids[b_]) for a_, b_ in hit)
    print(f"nprobe={npb}: blocked_true={len(hit)} pair_recall="
          f"{len(hit)/max(1,len(true_pairs)):.3f} "
          f"drop_recall={len(drops & true_drops)/max(1,len(true_drops)):.3f} "
          f"assign_rows={n*npb} cand_pairs={sum(len(v)*(len(v)-1)//2 for v in members.values())}")
