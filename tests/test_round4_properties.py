"""Property tests for the round-4 surfaces: the char-trigram LM scorer
against a pure-Python replica over random corpora, and BFS distances
against a reference BFS over random graphs (run as ONE disjoint union —
one Spark job, many cases — the repo's batch property-test convention)."""

from __future__ import annotations

import math
import random
from collections import deque

from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.operators.graph import bfs_distances
from pipeline_etl_ecommerce_spark.operators.lm import (
    perplexity_scores,
    train_char_trigram_lm,
)

ALPHA = 0.5


def _random_text(rng: random.Random, alphabet: str, max_len: int) -> str:
    return "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, max_len)))


def test_lm_scores_match_pure_python_over_random_corpora(spark):
    """200 random docs over a small alphabet (so trigram collisions and
    unseen contexts both actually occur), scored under a model trained on
    half of them: Spark's n_grams/avg_logp/ppl must match a pure-Python
    replica of the smoothed conditional LM at 6dp."""
    rng = random.Random(41)
    alphabet = "ab z"  # includes space + an always-unseen-ish tail char mix
    train_texts = [_random_text(rng, alphabet, 25) for _ in range(100)]
    score_docs = [(i, _random_text(rng, "abz q", 25)) for i in range(100)]

    # pure-Python replica (same construction as tests/test_lm.py, inline
    # so this file stands alone)
    tri: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    vocab: set[str] = set()
    for t in train_texts:
        t = t.lower()
        for i in range(len(t) - 2):
            c, n = t[i : i + 2], t[i + 2]
            tri[(c, n)] = tri.get((c, n), 0) + 1
            ctx[c] = ctx.get(c, 0) + 1
            vocab.add(n)
    v = len(vocab)

    expected = {}
    for doc_id, text in score_docs:
        t = text.lower()
        lps = [
            math.log(
                (tri.get((t[i : i + 2], t[i + 2]), 0) + ALPHA)
                / (ctx.get(t[i : i + 2], 0) + ALPHA * v)
            )
            for i in range(len(t) - 2)
        ]
        if lps:
            avg = sum(lps) / len(lps)
            expected[doc_id] = (len(lps), avg, math.exp(-avg))

    train_df = spark.createDataFrame([(t,) for t in train_texts], "text string")
    docs_df = spark.createDataFrame(score_docs, "doc_id long, text string")
    model = train_char_trigram_lm(train_df, "text")
    got = {
        r["doc_id"]: r
        for r in perplexity_scores(docs_df, model, "text", "doc_id").collect()
    }

    assert set(got) == set(expected)
    for doc_id, (n, avg, ppl) in expected.items():
        r = got[doc_id]
        assert r["n_grams"] == n
        assert abs(r["avg_logp"] - round(avg, 6)) <= 1e-9, doc_id
        assert abs(r["ppl"] - round(ppl, 6)) <= 1e-9, doc_id


def test_bfs_distances_match_reference_bfs_over_random_graphs(spark):
    """20 random graphs (<=12 nodes, varying density) relabeled into
    disjoint id ranges and solved in ONE multi-seed bfs_distances call
    (disjointness keeps each seed inside its own component): results must
    equal a queue-based reference BFS per graph, including depth capping
    and unreachable nodes being absent."""
    rng = random.Random(1234)
    max_depth = 3
    all_edges: list[tuple[int, int]] = []
    seeds: list[int] = []
    expected: dict[int, int] = {}

    for g in range(20):
        base = g * 1000
        n = rng.randrange(2, 13)
        nodes = [base + i for i in range(n)]
        edges = [
            (a, b)
            for ai, a in enumerate(nodes)
            for b in nodes[ai + 1 :]
            if rng.random() < 0.25
        ]
        if not edges:
            edges = [(nodes[0], nodes[1])]
        all_edges.extend(edges)
        seed = rng.choice(nodes)
        seeds.append(seed)

        adj: dict[int, list[int]] = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        dist = {seed: 0}
        dq = deque([seed])
        while dq:
            u = dq.popleft()
            if dist[u] >= max_depth:
                continue
            for w in adj.get(u, []):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        expected.update(dist)

    edges_df = spark.createDataFrame(all_edges, "src long, dst long")
    seed_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges_df, seed_df, max_depth=max_depth).collect()
    }
    assert got == expected
