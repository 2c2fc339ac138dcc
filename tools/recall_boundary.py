#!/usr/bin/env python3
"""Dev-only: prototype the ADAPTIVE-nprobe (boundary re-rank) semantic-dedup
rung against the all-pairs truth — the q152 design study.

Same deterministic pipeline as recall_semdedup.py (quantize, every-m-th
seed, 2 Lloyd floor-mean rounds, signed-cos^2 keys), then instead of a
UNIFORM nprobe, each vector probes its `lo` nearest cells always and up
to `hi` cells ADAPTIVELY: extra cell i (lo < i <= hi) is probed iff its
key clears a closeness test against the vector's best cell. Two rules:

  ratio:  key_i >= rho * key_1        (probe while nearly-as-close)
  margin: key_1 - key_i <= delta      (absolute closeness band)

Usage: python3 tools/recall_boundary.py /root/testdata/sf0.1
"""
import sys
import numpy as np
import pandas as pd

sf = sys.argv[1]

emb = pd.read_parquet(f"{sf}/embeddings.parquet")
emb = emb.sort_values("vec_id").reset_index(drop=True)
ids = emb.vec_id.to_numpy()
E = np.array([np.round(np.asarray(v, dtype=np.float64) * 10000).astype(np.int64)
              for v in emb.embedding], dtype=np.int64)
n = len(ids)
nrm = (E * E).sum(axis=1)

m = max(50, int(np.floor(np.sqrt(n))))
sel = ids % m == 0
cids = ids[sel]
C = E[sel].copy()


def keys(C, cn):
    dot = E @ C.T
    k = (dot.astype(np.float64) ** 2) / (nrm[:, None] * cn[None, :])
    return np.where(dot < 0, -k, k)


for it in range(2):
    cn = (C * C).sum(axis=1)
    a = np.argmax(keys(C, cn), axis=1)
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
key = keys(C, cn)
order = np.argsort(-key, axis=1, kind="stable")
skey = np.take_along_axis(key, order, axis=1)  # keys in rank order

G = E @ E.T
iu = np.triu_indices(n, 1)
d = G[iu]
true_mask = (d > 0) & (8 * d * d >= nrm[iu[0]] * nrm[iu[1]])
true_pairs = set(zip(iu[0][true_mask], iu[1][true_mask]))
true_drops = set(max(ids[a_], ids[b_]) for a_, b_ in true_pairs)
print(f"n={n} k={len(cids)} true_pairs={len(true_pairs)}")


def evaluate(tag, cell_lists):
    members = {}
    rows = 0
    for i in range(n):
        for c in cell_lists[i]:
            members.setdefault(c, []).append(i)
            rows += 1
    blocked = set()
    for c, mem in members.items():
        mem = np.array(mem)
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                a_, b_ = sorted((mem[x], mem[y]))
                blocked.add((a_, b_))
    hit = blocked & true_pairs
    drops = set(max(ids[a_], ids[b_]) for a_, b_ in hit)
    cand = sum(len(v) * (len(v) - 1) // 2 for v in members.values())
    print(f"{tag}: pair_recall={len(hit)/max(1,len(true_pairs)):.3f} "
          f"drop_recall={len(drops & true_drops)/max(1,len(true_drops)):.3f} "
          f"assign_rows={rows} cand_pairs={cand}")


# uniform baselines
for npb in (4, 5, 6):
    evaluate(f"uniform nprobe={npb}", [order[i, :npb] for i in range(n)])

# adaptive: always lo, extend to hi by rule
for lo in (3, 4):
    for hi in (5, 6):
        for rho in (0.5, 0.7, 0.8, 0.9):
            cells = []
            for i in range(n):
                cs = list(order[i, :lo])
                for r in range(lo, hi):
                    if skey[i, r] >= rho * skey[i, 0] and skey[i, 0] > 0:
                        cs.append(order[i, r])
                    else:
                        break
                cells.append(cs)
            evaluate(f"ratio lo={lo} hi={hi} rho={rho}", cells)
        for delta in (0.02, 0.05, 0.1, 0.2):
            cells = []
            for i in range(n):
                cs = list(order[i, :lo])
                for r in range(lo, hi):
                    if skey[i, 0] - skey[i, r] <= delta:
                        cs.append(order[i, r])
                    else:
                        break
                cells.append(cs)
            evaluate(f"margin lo={lo} hi={hi} delta={delta}", cells)

# Extended grid (round 13): at the 10x replica the WHOLE family's
# pair recall declines (k grows as sqrt(n); cross-cell pair spread
# rises) — probe deeper hi rungs to document what a margin/hi retune
# would buy before deciding whether q152's 4+margin point moves.
for lo in (4,):
    for hi in (8, 10):
        for delta in (0.1, 0.2, 0.3):
            cells = []
            for i in range(n):
                cs = list(order[i, :lo])
                for r in range(lo, min(hi, order.shape[1])):
                    if skey[i, 0] - skey[i, r] <= delta:
                        cs.append(order[i, r])
                    else:
                        break
                cells.append(cs)
            evaluate(f"margin lo={lo} hi={hi} delta={delta}", cells)
for npb in (8, 10):
    evaluate(f"uniform nprobe={npb}", [order[i, :npb] for i in range(n)])
