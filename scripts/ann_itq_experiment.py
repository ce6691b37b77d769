#!/usr/bin/env python
"""ITQ stopping-point experiment for the rotated binary-code family
(VERDICT r10 ask #3): would an ITQ (Gong & Lazebnik, CVPR'11) iterated
rotation close the clustered-control recall gap the HD rotation leaves
(binary 0.30 vs float IVF 0.37)?

Protocol = scripts/ann_clustered_recall.py exactly: queries are
vec_id % 100 == 0, candidates are Hamming-shortlisted (top-20, id
tie-break), reranked by true cosine, recall@5 against brute-force
cosine top-5. Two corpora: the isotropic fixture and the 16-anchor
clustered control (anchor + 0.35*v, same construction/constants).

Arms:
  hd            sign(H*D*v) — the shipped q_ann_binary_rotated codes
  hd+itq{T}     T exact-SVD-polar ITQ rounds on the HD-rotated coords
                (SVD polar is the limit NS/power iteration approximates,
                so it UPPER-BOUNDS any deterministic polar-factor
                implementation — if this regresses, every cheaper
                approximation regresses too)
  hd+c+itq{T}   same with mean-centering first (textbook ITQ operates
                on centered PCA projections)
  hd+itq1-ns16  one ITQ round with a 16-step Newton-Schulz polar factor
                (the oracle-expressible candidate implementation)

Run: python scripts/ann_itq_experiment.py [SF_DIR]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_GROUPS, SCALE, SHORTLIST, K = 16, 0.35, 20, 5
ROT_SCALE = 1 << 20


def ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def recall_at_5(X: np.ndarray, ids: np.ndarray, codes: np.ndarray) -> float:
    """Hamming shortlist-20 -> cosine rerank top-5 vs brute top-5."""
    q = ids % 100 == 0
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn[q] @ Xn.T
    qidx = np.where(q)[0]
    for r, qi in enumerate(qidx):
        cos[r, qi] = -2.0
    gt = np.argsort(-cos, axis=1, kind="stable")[:, :K]
    hq = codes[q]
    ham = (hq[:, None, :] != codes[None, :, :]).sum(2)
    for r, qi in enumerate(qidx):
        ham[r, qi] = 10**6
    order = np.lexsort(
        (np.tile(np.arange(len(ids)), (len(qidx), 1)), ham)
    )[:, :SHORTLIST]
    hit = 0
    for r in range(len(qidx)):
        cand = sorted(
            set(order[r].tolist()), key=lambda j: (-cos[r, j], j)
        )[:K]
        hit += len(set(cand) & set(gt[r].tolist()))
    return hit / (len(qidx) * K)


def ns_polar(M: np.ndarray, iters: int) -> np.ndarray:
    fro = math.sqrt(float(sum(int(x) * int(x) for x in M.ravel().tolist())))
    X = M.astype(np.float64) / fro
    for _ in range(iters):
        X = 1.5 * X - 0.5 * (X @ X.T @ X)
    return X


def svd_polar(M: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(M.astype(np.float64))
    return U @ Vt


def itq(Rf: np.ndarray, rounds: int, polar) -> np.ndarray:
    """ITQ alternation: B = sign(V R); R = polar(V^T B). Returns codes."""
    cur = Rf.copy()
    for _ in range(rounds):
        B = np.where(cur > 0, 1.0, -1.0)
        cur = Rf @ polar(Rf.T @ B)
    return cur > 0


def main() -> None:
    rows = duckdb.sql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows])
    dim = X.shape[1]
    anchors = np.array(
        [
            [1.0 if ph(f"anchor{g}:{d}") % 2 else -1.0 for d in range(dim)]
            for g in range(N_GROUPS)
        ]
    )
    XC = anchors[ids % N_GROUPS] + SCALE * X

    dsign = np.array(
        [1 if ph(f"hdrot:{j}") % 2 else -1 for j in range(dim)]
    )
    H = np.array(
        [
            [1 if bin(k & j).count("1") % 2 == 0 else -1 for j in range(dim)]
            for k in range(dim)
        ]
    )
    S = H * dsign[None, :]

    print(f"# corpus {SF_DIR} n={len(ids)} dim={dim}")
    print("| arm | recall@5 isotropic | recall@5 clustered |")
    print("|---|---|---|")
    results: dict[str, list[float]] = {}
    for Xf in (X, XC):
        R = (np.floor(Xf * ROT_SCALE).astype(np.int64) @ S.T).astype(
            np.float64
        )
        Rc = R - R.mean(0)
        arms = {"hd (shipped)": R > 0}
        for t in (1, 3, 5):
            arms[f"hd+itq{t} (svd polar)"] = itq(R, t, svd_polar)
        for t in (1, 3, 5):
            arms[f"hd+c+itq{t} (centered)"] = itq(Rc, t, svd_polar)
        arms["hd+itq1-ns16 (newton-schulz)"] = itq(
            R, 1, lambda M: ns_polar(M, 16)
        )
        for name, codes in arms.items():
            results.setdefault(name, []).append(recall_at_5(Xf, ids, codes))
    for name, (iso, clu) in results.items():
        print(f"| {name} | {iso:.2f} | {clu:.2f} |")


if __name__ == "__main__":
    main()
