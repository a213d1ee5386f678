"""Probe: does an orthogonal (OPQ-style) rotation rescue plain PQ on
clustered embeddings?

Round-6 honest finding: plain PQ collapses on the clustered corpus
(recall@10 ~0.13-0.32 where int8 gets 0.96+). The textbook response is
OPQ — rotate the space before product quantization so per-subspace
variance is balanced and subspace distributions are less
cluster-dominated. Before plumbing a rotation through
pq_codebooks/encode/ADC, this probe measures the candidate rotations
in numpy on the SAME clustered generator and the SAME ADC cosine math
the operators use:

- none:        baseline (current pq_topk behavior)
- pca_balance: eigenvectors of the training-sample covariance,
               dimensions allocated round-robin by descending
               eigenvalue across the m subspaces (OPQ's
               eigenvalue-allocation heuristic, Ge et al. 2013 'OPQ-P')
- random:      seeded random orthogonal rotation (QR of a hashed
               Gaussian matrix) — the cheap spread-the-variance variant

All rotations are ORTHOGONAL and applied uncentered, so inner products
and norms are preserved exactly — the ADC cosine formula (sum of
per-subspace <q_s, c_s> over |q|·|x_hat|) is unchanged; only the
subspace decomposition differs.

Usage: python tools/probe_opq.py [n] [m] [n_codes]   (default 20000 8 32)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def lloyd(xs: np.ndarray, n_codes: int, n_iter: int = 5) -> np.ndarray:
    cents = xs[:n_codes].copy()
    for _ in range(n_iter):
        d2 = ((xs * xs).sum(1)[:, None] - 2.0 * (xs @ cents.T)
              + (cents * cents).sum(1)[None, :])
        idx = np.argmin(d2, axis=1)
        for c in range(len(cents)):
            members = xs[idx == c]
            if len(members):
                cents[c] = members.mean(0)
    return cents


def pq_recall(mat: np.ndarray, queries: np.ndarray, m: int,
              n_codes: int, rot: np.ndarray | None, k: int = 10,
              train_frac: float = 0.2) -> float:
    n, dim = mat.shape
    d_sub = dim // m
    x = mat @ rot if rot is not None else mat
    q = queries @ rot if rot is not None else queries
    train = x[: max(n_codes, int(n * train_frac))]
    books = [lloyd(train[:, s * d_sub:(s + 1) * d_sub], n_codes)
             for s in range(m)]
    # encode
    codes = np.zeros((n, m), dtype=np.int64)
    xn2 = np.zeros(n)
    for s in range(m):
        xs = x[:, s * d_sub:(s + 1) * d_sub]
        cb = books[s]
        d2 = ((xs * xs).sum(1)[:, None] - 2.0 * (xs @ cb.T)
              + (cb * cb).sum(1)[None, :])
        codes[:, s] = np.argmin(d2, axis=1)
        xn2 += (cb[codes[:, s]] ** 2).sum(1)
    # ADC cosine (the pq_topk formula): sum_s <q_s, c_s> / (|q| |x_hat|)
    qn = np.sqrt((queries * queries).sum(1))
    approx = np.zeros((len(q), n))
    for s in range(m):
        tab = q[:, s * d_sub:(s + 1) * d_sub] @ books[s].T  # nq × codes
        approx += tab[:, codes[:, s]]
    approx /= np.maximum(qn[:, None] * np.sqrt(xn2)[None, :], 1e-30)
    # exact cosine ground truth
    xn = np.sqrt((mat * mat).sum(1))
    exact = (queries @ mat.T) / np.maximum(qn[:, None] * xn[None, :],
                                           1e-30)
    hits = 0
    for i in range(len(q)):
        want = set(np.argsort(-exact[i])[:k].tolist())
        got = set(np.argsort(-approx[i])[:k].tolist())
        hits += len(want & got)
    return round(hits / (len(q) * k), 3)


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 20_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_codes = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from contacts_etl_phase21_spark.session import get_spark
    from tools.bench_corpus import clustered_embeddings

    spark = get_spark("probe-opq")
    spark.sparkContext.setLogLevel("ERROR")
    pdf = clustered_embeddings(spark, n).orderBy("vec_id").toPandas()
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in pdf["embedding"]])
    queries = mat[:50]
    dim = mat.shape[1]

    train = mat[: int(len(mat) * 0.2)]
    cov = np.cov(train, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals)
    # eigenvalue allocation: dim j of subspace s is the (j*m+s)-th
    # largest eigendirection -> every subspace gets an equal share of
    # the spectrum (OPQ-P); columns grouped per subspace contiguously
    alloc = np.empty(dim, dtype=np.int64)
    d_sub = dim // m
    for s in range(m):
        for j in range(d_sub):
            alloc[s * d_sub + j] = order[j * m + s]
    r_pca = evecs[:, alloc]
    rng = np.random.default_rng(7)
    r_rand, _ = np.linalg.qr(rng.standard_normal((dim, dim)))

    out = {
        "metric": "pq_rotation_recall_at_10",
        "n": n, "m": m, "n_codes": n_codes,
        "recall": {
            "none": pq_recall(mat, queries, m, n_codes, None),
            "pca_balance": pq_recall(mat, queries, m, n_codes, r_pca),
            "random": pq_recall(mat, queries, m, n_codes, r_rand),
        },
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
