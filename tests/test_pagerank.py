"""Integer-ppb PageRank: verified against an independent pure-Python
implementation of the same integer recurrence, plus structural
invariants (mass bound, sink/source handling, argument validation)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from event_streaming_toy_example_spark.operators.pagerank import (
    TOTAL_PPB,
    pagerank_ppb,
)


def _py_pagerank(n, edges, iterations=5, damping_pct=85):
    """Reference recurrence: same integer ops, plain Python."""
    base = (100 - damping_pct) * TOTAL_PPB // (100 * n)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    r = {i: TOTAL_PPB // n for i in range(n)}
    for _ in range(iterations):
        in_sum = {i: 0 for i in range(n)}
        for s, d, w in edges:
            in_sum[d] += r[s] * w // out_w[s]
        r = {i: base + damping_pct * in_sum[i] // 100 for i in range(n)}
    return r


def _run(spark, n, edges, **kw):
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node_id"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r.node_id: r.rank_ppb
        for r in pagerank_ppb(nodes, edf, n_nodes=n, **kw).collect()
    }
    return got


def test_matches_python_reference_on_weighted_digraph(spark):
    edges = [
        (0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5),
        (3, 0, 1), (3, 1, 1), (1, 3, 4),
    ]
    assert _run(spark, 4, edges) == _py_pagerank(4, edges)


def test_cycle_is_uniform_fixed_point(spark):
    """Equal-weight cycle: uniform ranks are (nearly) stationary —
    every node ends with the identical value."""
    edges = [(i, (i + 1) % 5, 1) for i in range(5)]
    got = _run(spark, 5, edges)
    assert len(set(got.values())) == 1
    assert got == _py_pagerank(5, edges)


def test_sink_leaks_and_source_floors_at_teleport(spark):
    """Node with no out-edges leaks mass (documented variant); node
    with no in-edges holds exactly the teleport base."""
    edges = [(0, 1, 1), (2, 1, 1)]  # 1 is a sink; 0,2 are sources
    got = _run(spark, 3, edges)
    assert got == _py_pagerank(3, edges)
    base = 15 * TOTAL_PPB // (100 * 3)
    assert got[0] == base and got[2] == base
    assert sum(got.values()) < TOTAL_PPB  # sink leakage

def test_total_mass_never_exceeds_budget(spark):
    edges = [(0, 1, 2), (1, 0, 2), (1, 2, 1), (2, 1, 7)]
    got = _run(spark, 3, edges, iterations=3)
    assert sum(got.values()) <= TOTAL_PPB


@pytest.mark.parametrize("kw", [{"damping_pct": 0}, {"damping_pct": 100},
                                {"iterations": 0}])
def test_invalid_args_rejected(spark, kw):
    with pytest.raises(ValueError):
        _run(spark, 2, [(0, 1, 1)], **kw)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5), st.integers(0, 5), st.integers(1, 50)
        ),
        min_size=1,
        max_size=14,
    ),
    st.integers(1, 4),
)
def test_matches_python_reference_on_random_graphs(spark, raw, iters):
    """Differential property: the distributed integer recurrence must
    match the pure-Python reference on arbitrary small weighted
    digraphs (self-loops, parallel edges collapsed, sinks, sources)."""
    # collapse parallel edges (sum weights) as a real edge build would
    agg: dict[tuple[int, int], int] = {}
    for s, d, w in raw:
        agg[(s, d)] = agg.get((s, d), 0) + w
    edges = [(s, d, w) for (s, d), w in agg.items()]
    assert _run(spark, 6, edges, iterations=iters) == _py_pagerank(
        6, edges, iterations=iters
    )
