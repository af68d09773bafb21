"""Freeze the IVF-PQ model (run once, deliberately):

- pq_centroids.parquet (cell, centroid_q list<int64>) — the coarse
  quantizer: L2-normalized vectors of the N_CELLS smallest vec_ids,
  INTEGER-quantized at SCALE (floor(x*SCALE + 0.5)), so cell
  assignment is an exact-integer argmax dot in every engine.
- pq_codebook.parquet (m, j, code list<int64>) — per-subspace product-
  quantization codewords trained on the integer residuals
  (vq - centroid_q[cell]) with deterministic seeded Lloyd iterations,
  then integer-quantized at the SAME scale (residuals are already at
  SCALE, so codewords quantize with floor(mean + 0.5)).

Trained on the sf0.01 synthetic embeddings. Consumed by
operators/ann_pq.py and mirrored verbatim by the s04 DuckDB oracle —
every step up to the final cosine is EXACT int64 arithmetic, so Spark
and DuckDB agree bit-for-bit (the t28 integer-quantization precedent).

If the corpus or the trainer changes intentionally, re-run
``python fixtures/freeze_pq.py`` and note it in the commit message.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TRAIN_SF = "/root/testdata/sf0.01"
SCALE = 100_000
N_CELLS = 64
M = 16  # subspaces (64 dims / 4)
K = 64  # codewords per subspace
DIM = 64
SUB = DIM // M
N_ITER = 20
SEED = 5


def quantize(v: np.ndarray) -> np.ndarray:
    return np.floor(v * SCALE + 0.5).astype(np.int64)


def coarse_centroids(emb: pd.DataFrame) -> np.ndarray:
    """Integer coarse quantizer: normalized vectors of the N_CELLS
    smallest vec_ids (the deterministic ann._centroids rule), quantized."""
    rows = emb.sort_values("vec_id").head(N_CELLS)
    C = np.stack([np.asarray(v, dtype=np.float64) for v in rows["embedding"]])
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return quantize(C / norms)


def lloyd_int(data: np.ndarray, k: int, n_iter: int, seed: int) -> np.ndarray:
    """Seeded deterministic Lloyd over int64 rows → int64 codewords.
    Assignment = exact-integer L2 argmin (ties → lowest index); empty
    clusters keep their previous center."""
    rng = np.random.RandomState(seed)
    uniq = np.unique(data, axis=0)
    idx = rng.permutation(len(uniq))[:k]
    cent = uniq[np.sort(idx)].astype(np.float64)
    if len(cent) < k:  # degenerate corpus: pad by repeating
        cent = np.vstack([cent] * (k // len(cent) + 1))[:k]
    for _ in range(n_iter):
        d2 = ((data[:, None, :].astype(np.float64) - cent[None, :, :]) ** 2).sum(2)
        asg = np.argmin(d2, axis=1)
        for j in range(k):
            pts = data[asg == j]
            if len(pts):
                cent[j] = pts.mean(axis=0)
    return np.floor(cent + 0.5).astype(np.int64)


def main() -> None:
    emb = pd.read_parquet(f"{TRAIN_SF}/embeddings.parquet")
    CQ = coarse_centroids(emb)
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    vq = quantize(V)
    cells = np.argmax(vq @ CQ.T, axis=1)  # exact int64, first-max tie
    resid = vq - CQ[cells]
    rows = []
    for m in range(M):
        cb = lloyd_int(resid[:, m * SUB : (m + 1) * SUB], K, N_ITER, SEED + m)
        for j in range(K):
            rows.append({"m": m, "j": j, "code": [int(x) for x in cb[j]]})
    pd.DataFrame(
        {"cell": range(N_CELLS), "centroid_q": [[int(x) for x in c] for c in CQ]}
    ).to_parquet("fixtures/pq_centroids.parquet", index=False)
    pd.DataFrame(rows).to_parquet("fixtures/pq_codebook.parquet", index=False)
    print(f"froze {N_CELLS} coarse cells + {M}x{K} codewords (scale {SCALE})")


if __name__ == "__main__":
    main()
