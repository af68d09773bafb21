"""Deterministic walks + skip-gram pairs (operators/walks)."""

from __future__ import annotations

import hashlib

from graphlab_spark.operators.walks import deterministic_walks, skipgram_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, "p", d) for s, d in pairs], "src STRING, pred STRING, dst STRING"
    )


def _py_walks(pairs, length=3, salt="walk"):
    adj: dict = {}
    nodes = set()
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    rows = []
    for start in nodes:
        cur = start
        rows.append((start, 0, cur))
        for step in range(1, length + 1):
            outs = adj.get(cur)
            if not outs:
                break
            cur = min(
                outs,
                key=lambda d: hashlib.md5(
                    f"{cur}|{step}|{d}|{salt}".encode()
                ).hexdigest()
                + d,
            )
            rows.append((start, step, cur))
    return sorted(rows)


def test_walks_match_python_reference(spark):
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "e"),  # e is a sink: walks end early there
    ]
    got = sorted(
        map(tuple, deterministic_walks(_edges(spark, pairs), length=3).collect())
    )
    assert got == _py_walks(pairs, length=3)


def test_walks_deterministic_and_salt_varies(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    e = _edges(spark, pairs)
    w1 = sorted(map(tuple, deterministic_walks(e, length=4).collect()))
    w2 = sorted(map(tuple, deterministic_walks(e, length=4).collect()))
    assert w1 == w2
    alt = sorted(map(tuple, deterministic_walks(e, length=4, salt="s2").collect()))
    assert alt != w1  # different salt explores differently on this graph


def test_sink_start_has_only_pos0(spark):
    e = _edges(spark, [("a", "b")])
    rows = {(r["walk_id"], r["pos"], r["node"])
            for r in deterministic_walks(e, length=2).collect()}
    assert ("b", 0, "b") in rows
    assert not any(w == "b" and p > 0 for w, p, _ in rows)


def test_skipgram_pairs_window(spark):
    # single deterministic line: a -> b -> c (one out-edge each)
    e = _edges(spark, [("a", "b"), ("b", "c")])
    walks = deterministic_walks(e, length=2)
    pairs = {(r["center"], r["context"])
             for r in skipgram_pairs(walks, window=1).collect()}
    # walk a: a b c → adjacent pairs both directions; walk b: b c
    assert ("a", "b") in pairs and ("b", "a") in pairs
    assert ("b", "c") in pairs and ("c", "b") in pairs
    assert ("a", "c") not in pairs  # distance 2 > window 1
    wide = {(r["center"], r["context"])
            for r in skipgram_pairs(walks, window=2).collect()}
    assert ("a", "c") in wide and ("c", "a") in wide
    assert not any(c == x for c, x in wide if c == x)


def test_walks_plan_no_cartesian(spark):
    e = _edges(spark, [("a", "b"), ("b", "c")])
    plan = (
        deterministic_walks(e, length=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
