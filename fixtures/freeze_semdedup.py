"""Freeze the SemDeDup k-means centroids (run once, deliberately):

- semdedup_centroids.parquet (cell_id, centroid list<double>)

trained on the sf0.01 synthetic embeddings (deterministic Lloyd
iterations, seeded init — operators/semdedup.py train_centroids).
Consumed by operators/semdedup.py and mirrored verbatim by the d08
DuckDB oracle.

If the corpus or the trainer changes intentionally, re-run
``python fixtures/freeze_semdedup.py`` and note it in the commit
message.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graphlab_spark.operators.semdedup import train_centroids

TRAIN_SF = "/root/testdata/sf0.01"
K = 8


def main() -> None:
    emb = pd.read_parquet(f"{TRAIN_SF}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy())
    cent = train_centroids(vecs, k=K)
    pd.DataFrame(
        {"cell_id": range(K), "centroid": [list(c) for c in cent]}
    ).to_parquet("fixtures/semdedup_centroids.parquet", index=False)
    print(f"froze {K} centroids, dim {cent.shape[1]}")


if __name__ == "__main__":
    main()
