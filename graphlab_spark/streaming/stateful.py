"""Custom stateful streaming via ``applyInPandasWithState``: per-surface
running mention statistics with BOUNDED sketch state.

The operator Structured Streaming's built-ins cannot express: a
continuously-updated per-entity (surface) profile of
``(n_mentions_total, approx distinct urls)`` across the whole stream
history. An exact distinct-url count per key needs per-key SETS in the
state store — state grows with the key's url cardinality, the classic
streaming-state blow-up. Here the state is an HLL register array
(2^p ints per key, FIXED regardless of history; p=8 → 256 ints), and a
micro-batch folds its rows in with bucket-wise MAX — the same mergeable
register algebra as operators/sketch.py, so the stream's registers
after any prefix of batches are EXACTLY ``hll_build`` of the rows seen
so far (equality-pinned in pytest, not approximately — the estimate's
error budget applies only to the cardinality readout).

Semantics: update-mode emission — each micro-batch emits one updated
row per surface it touched (surface, n_mentions, approx_urls, regs).
State is keyed by surface and lives in the state store (RocksDB/HDFS
at scale), so a restart from the checkpoint resumes the counters
exactly (pinned in pytest).

The per-row Python hash matches operators/sketch._hll_cols bit for bit
(md5 first 15 hex chars → 60-bit int; bucket = h & (m−1); rho =
(60−p) − bit_length(h >> p) + 1) — that identity is what makes the
streaming ≡ batch register equality testable at all.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

P_DEFAULT = 8


def _fold_urls(urls, regs: list, p: int) -> None:
    m = 1 << p
    wbits = 60 - p
    for u in urls:
        if u is None:
            continue
        h = int(hashlib.md5(u.encode("utf-8")).hexdigest()[:15], 16)
        b = h & (m - 1)
        rho = wbits - (h >> p).bit_length() + 1
        if rho > regs[b]:
            regs[b] = rho


def _estimate(regs: list, p: int) -> float:
    """Identical math to operators/sketch.hll_estimate, list-local."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -r for r in regs)
    est = alpha * m * m / s
    zeros = sum(1 for r in regs if r == 0)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def surface_url_stats_stream(
    mentions: DataFrame,
    p: int = P_DEFAULT,
    surface_col: str = "surface",
    url_col: str = "url",
) -> DataFrame:
    """→ streaming frame (surface, n_mentions, approx_urls, regs):
    update-mode per-surface running totals with fixed-size HLL state.
    ``regs`` is exposed so tests (and downstream mergers) can verify
    the exact register algebra; production sinks typically keep only
    the estimate."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        m = 1 << p
        if state.exists:
            n, regs = state.get
            regs = list(regs)
        else:
            n, regs = 0, [0] * m
        touched = False
        for pdf in pdfs:
            if len(pdf):
                touched = True
                n += len(pdf)
                _fold_urls(pdf[url_col], regs, p)
        if touched:
            state.update((n, regs))
            yield pd.DataFrame(
                [
                    {
                        "surface": key[0],
                        "n_mentions": n,
                        "approx_urls": _estimate(regs, p),
                        "regs": regs,
                    }
                ]
            )

    return (
        mentions.groupBy(surface_col)
        .applyInPandasWithState(
            update,
            outputStructType=(
                "surface string, n_mentions long, approx_urls double, "
                "regs array<int>"
            ),
            stateStructType="n long, regs array<int>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
