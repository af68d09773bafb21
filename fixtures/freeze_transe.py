"""Freeze the TransE KG-embedding fixture (run once, deliberately):
``transe_ent.parquet`` / ``transe_rel.parquet`` — integer-quantized
translation embeddings over the frozen golden triples.

Real KG pipelines train link-prediction embeddings OFFLINE (TransE,
Bordes et al. 2013: score(h, r, t) = −‖E_h + R_r − E_t‖) and apply
them at corpus scale for completion/validation ranking; Spark's job is
the at-scale scoring and ranking (operators/kgembed.py). This freezer
is the offline half, fully deterministic (seeded numpy float64,
vectorized full-epoch SGD with margin ranking loss, L1 distance,
deterministic negative corruption).

Quantization: q = round(v · 1000) int64. THE FROZEN MODEL IS THE
QUANTIZED ONE — a triple's distance is the exact integer
``Σ_i |E_h[i] + R_r[i] − E_t[i]|`` over quantized components, so
scoring and ranking hash identically in any engine (the qc_weights /
lm fixture discipline; no float-sum-order hazard).

If the golden triples change intentionally, re-run
``PYTHONPATH=/root/repo python fixtures/freeze_transe.py`` and note it
in the commit message.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DIM = 16
EPOCHS = 400
LR = 0.05
MARGIN = 2.0
SEED = 11
SCALE = 1000


def train(
    triples: list[tuple[str, str, str]],
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    ents = sorted({h for h, _, _ in triples} | {t for _, _, t in triples})
    rels = sorted({r for _, r, _ in triples})
    epos = {e: i for i, e in enumerate(ents)}
    rpos = {r: i for i, r in enumerate(rels)}
    rng = np.random.RandomState(SEED)
    b = 6.0 / np.sqrt(DIM)
    E = rng.uniform(-b, b, (len(ents), DIM))
    R = rng.uniform(-b, b, (len(rels), DIM))
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)
    h = np.array([epos[x] for x, _, _ in triples])
    r = np.array([rpos[x] for _, x, _ in triples])
    t = np.array([epos[x] for _, _, x in triples])
    n = len(triples)
    for _ in range(EPOCHS):
        # project entities to the unit L2 ball (the TransE constraint)
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        E /= np.maximum(norms, 1.0)
        # corrupt tail or head uniformly, deterministic stream
        corrupt_tail = rng.rand(n) < 0.5
        neg_ent = rng.randint(0, len(ents), n)
        h_n = np.where(corrupt_tail, h, neg_ent)
        t_n = np.where(corrupt_tail, neg_ent, t)
        d_pos = E[h] + R[r] - E[t]
        d_neg = E[h_n] + R[r] - E[t_n]
        viol = (MARGIN + np.abs(d_pos).sum(1) - np.abs(d_neg).sum(1)) > 0
        g_pos = np.sign(d_pos) * viol[:, None] * LR
        g_neg = np.sign(d_neg) * viol[:, None] * LR
        np.add.at(E, h, -g_pos)
        np.add.at(E, t, g_pos)
        np.add.at(R, r, -g_pos + g_neg)
        np.add.at(E, h_n, g_neg)
        np.add.at(E, t_n, -g_neg)
    return (
        {e: E[i] for e, i in epos.items()},
        {x: R[i] for x, i in rpos.items()},
    )


def main() -> None:
    g = pd.read_parquet("fixtures/golden_triples.parquet")
    triples = sorted(
        {(a, b, c) for a, b, c in zip(g["subj_id"], g["pred"], g["obj_id"])}
    )
    ent, rel = train(triples)
    q = lambda v: [int(x) for x in np.round(v * SCALE).astype(np.int64)]  # noqa: E731
    pd.DataFrame(
        {"entity_id": list(ent), "emb": [q(v) for v in ent.values()]}
    ).to_parquet("fixtures/transe_ent.parquet", index=False)
    pd.DataFrame(
        {"pred": list(rel), "emb": [q(v) for v in rel.values()]}
    ).to_parquet("fixtures/transe_rel.parquet", index=False)
    print(f"froze {len(ent)} entities, {len(rel)} relations, dim {DIM}")


if __name__ == "__main__":
    main()
