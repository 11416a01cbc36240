"""PageRank semantics: hand-checked star graph plus a python
replica of the exact quantized iteration."""

from __future__ import annotations

from parquet_generator_spark.operators.graph import PR_QUANT, pagerank


def _python_pagerank(pairs, iters=3, damping=0.85):
    edges = {}
    for a, b in pairs:
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    n = len(edges)
    ranks = {u: round(1.0 / n, PR_QUANT) for u in edges}
    base = (1.0 - damping) / n
    for _ in range(iters):
        incoming = {u: 0.0 for u in edges}
        for u, outs in edges.items():
            share = ranks[u] / len(outs)
            for v in outs:
                incoming[v] += share
        ranks = {u: round(base + damping * incoming[u], PR_QUANT)
                 for u in edges}
    return ranks


def test_pagerank_star_center_wins(spark):
    pairs = [(0, i) for i in range(1, 6)]  # star: 0 at the center
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(df).collect()}
    assert max(got, key=got.get) == 0
    leaf_ranks = {v for k, v in got.items() if k != 0}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly


def test_pagerank_matches_python_replica(spark):
    import random

    rng = random.Random(5)
    pairs = list({tuple(sorted((rng.randrange(12), rng.randrange(12))))
                  for _ in range(20)})
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(df).collect()}
    exp = _python_pagerank(pairs)
    assert got == exp
    assert abs(sum(got.values()) - 1.0) < 1e-3
