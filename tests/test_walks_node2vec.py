"""node2vec biased walks (walks.node2vec_walks) vs an exact Python
replica of the hash/A-Res arithmetic, plus the p/q bias semantics."""

from __future__ import annotations

import hashlib

from graphlab_spark.operators.walks import node2vec_walks

# triangle a<->b<->c<->a (all bidirectional) + tail c->d->e, d->a
EDGES = [
    ("a", "b"), ("b", "a"),
    ("b", "c"), ("c", "b"),
    ("c", "a"), ("a", "c"),
    ("c", "d"), ("d", "e"), ("d", "a"),
]


def _py_node2vec(edges, length, p, q, salt="n2v"):
    adj: dict[str, list[str]] = {}
    eset = set(edges)
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    nodes = sorted({n for e in edges for n in e})
    walks = {}
    for start in nodes:
        path = [start]
        prev, cur = None, start
        for step in range(1, length + 1):
            cands = adj.get(cur)
            if not cands:
                break
            best = None
            for dst in sorted(set(cands)):
                h = hashlib.md5(
                    f"{start}|{step}|{dst}|{salt}".encode()
                ).hexdigest()
                u = (int(h[:13], 16) + 0.5) / float(1 << 52)
                if prev is not None and dst == prev:
                    alpha = 1.0 / p
                elif prev is not None and (prev, dst) in eset:
                    alpha = 1.0
                else:
                    alpha = 1.0 / q
                key = (u ** (1.0 / alpha), dst)
                if best is None or key > best:
                    best = key
            prev, cur = cur, best[1]
            path.append(cur)
        walks[start] = path
    return walks


def _spark_walks(spark, length, p, q):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    rows = node2vec_walks(edges, length=length, p=p, q=q).collect()
    walks: dict[str, dict[int, str]] = {}
    for r in rows:
        walks.setdefault(r.walk_id, {})[r.pos] = r.node
    return {
        w: [byp[i] for i in range(len(byp))] for w, byp in walks.items()
    }


def test_matches_python_replica_across_pq(spark):
    for p, q in [(1.0, 1.0), (0.25, 4.0), (4.0, 0.25), (0.5, 2.0)]:
        got = _spark_walks(spark, 4, p, q)
        exp = _py_node2vec(EDGES, 4, p, q)
        assert got == exp, (p, q)


def test_return_bias_and_exploration(spark):
    # tiny p → huge return weight: every step-2 hop with a return edge
    # available goes straight back (u^(1/alpha) → 1 as alpha → ∞)
    back = _spark_walks(spark, 2, 1e-9, 1.0)
    for start, path in back.items():
        if len(path) == 3 and (path[1], path[0]) in set(EDGES):
            assert path[2] == path[0], path
    # tiny q (huge distance-2 weight, alpha→∞ for far nodes) must
    # differ from the return-biased walks somewhere
    far = _spark_walks(spark, 2, 1.0, 1e-9)
    assert far != back


def test_dead_end_truncates_walk(spark):
    walks = _spark_walks(spark, 3, 1.0, 1.0)
    assert walks["e"] == ["e"]  # e has no out-edges
    assert walks == _py_node2vec(EDGES, 3, 1.0, 1.0)


def test_rejects_nonpositive_pq(spark):
    import pytest

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        node2vec_walks(edges, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(edges, q=-1.0)
