"""PageRank power iterations (operators/graph.py) vs a pure-Python twin."""

import pytest


def ref_pagerank(nodes, edges, iterations=8, damping=0.85):
    from collections import defaultdict

    n = len(nodes)
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(float)
        dm = 0.0
        for v in nodes:
            if out[v]:
                share = rank[v] / len(out[v])
                for d in out[v]:
                    contrib[d] += share
            else:
                dm += rank[v]
        rank = {
            v: (1 - damping) / n + damping * (contrib[v] + dm / n) for v in nodes
        }
    return rank


def test_pagerank_matches_reference_with_dangling(spark):
    from tilekiln_spark.operators.graph import pagerank

    nodes = list(range(6))
    # 5 is dangling; 4 is isolated (no in- or out-edges); hub at 0
    edges = [(0, 1), (0, 2), (1, 0), (2, 0), (3, 0), (3, 5), (5 - 5, 5)]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(ndf, edf, iterations=8).collect()}
    exp = ref_pagerank(nodes, edges)
    for v in nodes:
        assert got[v] == pytest.approx(exp[v], abs=1e-12), v
    # mass conserved (dangling + isolated redistribute, nothing drains)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_uniform_on_cycle(spark):
    from tilekiln_spark.operators.graph import pagerank

    nodes = list(range(5))
    edges = [(i, (i + 1) % 5) for i in nodes]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = [r.rank for r in pagerank(ndf, edf, iterations=4).collect()]
    for r in got:
        assert r == pytest.approx(0.2, abs=1e-12)


def test_hits_star_graph(spark):
    """Star: center links to all leaves -> center is THE hub (1.0), leaves
    are the authorities (1.0), reversed scores ~0; max normalization."""
    from tilekiln_spark.operators.graph import hits

    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    out = {r.node: (r.hub, r.authority) for r in hits(nodes, edges, iterations=4).collect()}
    assert out[0] == (1.0, 0.0)
    for leaf in range(1, 5):
        assert out[leaf] == (0.0, 1.0)


def test_harmonic_centrality_path_graph(spark):
    """Directed path 0 -> 1 -> 2 -> 3: H(t) is the harmonic number of
    its in-ancestor distances; eccentricity is the max in-distance;
    node 0 (nobody reaches it) reads all-zero."""
    from tilekiln_spark.operators.graph import harmonic_centrality

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    out = {
        r.node: (r.n_reached, r.eccentricity, r.harmonic)
        for r in harmonic_centrality(nodes, edges).collect()
    }
    assert out[0] == (0, 0, 0.0)
    assert out[1] == (1, 1, 1.0)
    assert out[2] == (2, 2, 1.5)
    assert out[3] == (3, 3, pytest.approx(1.0 + 0.5 + 1 / 3, abs=1e-6))


def test_harmonic_centrality_cycle_symmetric(spark):
    """5-cycle: every node reaches every other, all scores equal, and
    eccentricity is the cycle length minus one."""
    from tilekiln_spark.operators.graph import harmonic_centrality

    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    rows = harmonic_centrality(nodes, edges).collect()
    exp = round(1.0 + 0.5 + 1 / 3 + 0.25, 6)
    for r in rows:
        assert (r.n_reached, r.eccentricity) == (4, 4)
        assert r.harmonic == pytest.approx(exp, abs=1e-6)


def test_betweenness_path_and_diamond(spark):
    """Path 0->1->2->3: the interior nodes each carry 2 full pairs.
    Diamond 0->{1,2}->3: sigma(0,3)=2 so each middle node gets 0.5."""
    from tilekiln_spark.operators.graph import betweenness_centrality

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    out = {r.node: r.betweenness for r in betweenness_centrality(nodes, path).collect()}
    assert out == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}

    diamond = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    out = {
        r.node: r.betweenness
        for r in betweenness_centrality(nodes, diamond).collect()
    }
    assert out == {0: 0.0, 1: 0.5, 2: 0.5, 3: 0.0}


def test_cocitation_counts(spark):
    """s0 and s1 both cite {a, b}: cocite(a,b)=2; a and b share the
    targets they point at; min_count filters singletons out."""
    from tilekiln_spark.operators.graph import cocitation_counts

    #  0 -> 10, 0 -> 11, 1 -> 10, 1 -> 11, 2 -> 10   (citers 0,1,2)
    # 10 -> 20, 10 -> 21, 11 -> 20, 11 -> 21          (coupled 10,11)
    e = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10),
         (10, 20), (10, 21), (11, 20), (11, 21)],
        "src long, dst long",
    )
    rows = {
        (r.a, r.b): (r.cocite, r.coupling)
        for r in cocitation_counts(e, min_count=2).collect()
    }
    assert rows[(10, 11)] == (2, 2)
    assert (20, 21) in rows and rows[(20, 21)][0] == 2


def test_simrank_shared_citer_chain(spark):
    """s -> {a, b} gives s(a,b) = c = 0.8 from round 1 on; a -> c,
    b -> d propagates s(c,d) = c * s(a,b) = 0.64 from round 2 on;
    pairs with no in-neighbor overlap structure never appear."""
    from tilekiln_spark.operators.graph import simrank

    #  0 -> 1, 0 -> 2 (shared citer), 1 -> 3, 2 -> 4 (chain)
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 4)], "src long, dst long"
    )
    out = {(r.a, r.b): r.s for r in simrank(nodes, edges, iterations=5).collect()}
    assert out[(1, 2)] == 0.8
    assert out[(3, 4)] == pytest.approx(0.64, abs=1e-9)
    assert (1, 3) not in out and (0, 1) not in out


def test_boruvka_msf_known_tree_and_forest(spark):
    """Square + diagonal: the three lightest acyclic edges win; a
    disconnected pair yields a forest with one edge per component."""
    from tilekiln_spark.operators.graph import boruvka_msf

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (2, 3, 3), (0, 3, 10), (0, 2, 4)],
        "u long, v long, w long",
    )
    got = sorted((r.u, r.v, r.w) for r in boruvka_msf(nodes, edges).collect())
    assert got == [(0, 1, 1), (1, 2, 2), (2, 3, 3)]

    nodes2 = spark.createDataFrame([(i,) for i in range(4)], "node long")
    forest = spark.createDataFrame(
        [(0, 1, 5), (2, 3, 7)], "u long, v long, w long"
    )
    got2 = sorted((r.u, r.v, r.w) for r in boruvka_msf(nodes2, forest).collect())
    assert got2 == [(0, 1, 5), (2, 3, 7)]


def test_link_prediction_square(spark):
    """4-cycle 0-1-2-3: opposite corners share both side nodes
    (cn=2, aa = 2/ln 2, ra = 1, pa = 4, jacc = 1); adjacent corners
    share nothing and don't appear at min_common=1."""
    import math

    from tilekiln_spark.operators.graph import link_prediction

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    rows = {(r.a, r.b): r for r in link_prediction(e, min_common=1).collect()}
    assert set(rows) == {(0, 2), (1, 3)}
    r = rows[(0, 2)]
    assert (r.cn, r.pa) == (2, 4)
    assert r.aa == round(2 / math.log(2), 6)
    assert r.ra == 1.0
    assert r.jacc == 1.0


def test_eigenvector_and_katz_known_graphs(spark):
    """Cycle: eigenvector uniform at 1.0 (max-normalized).  Star
    0 -> {1..4}: Katz for a leaf = 1 + alpha (one in-walk), center = 1."""
    from tilekiln_spark.operators.graph import (
        eigenvector_centrality,
        katz_centrality,
    )

    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    for r in eigenvector_centrality(nodes, cyc, iterations=6).collect():
        assert r.centrality == 1.0

    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    out = {r.node: r.katz for r in katz_centrality(nodes, star, alpha=0.2).collect()}
    assert out[0] == 1.0
    for leaf in range(1, 5):
        assert abs(out[leaf] - 1.2) < 1e-12


def test_rich_club_clique_plus_pendants(spark):
    """4-clique with a pendant on each clique node: at k=1 only clique
    nodes (deg 4 > 1... pendants deg 1) survive -> phi = 1.0; at k=4
    nobody survives -> phi = 0."""
    from tilekiln_spark.operators.graph import rich_club

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    pend = [(i, 10 + i) for i in range(4)]
    e = spark.createDataFrame(clique + pend, "src long, dst long")
    out = {r.k: (r.n_nodes, r.n_edges, r.phi) for r in rich_club(e, [1, 4]).collect()}
    assert out[1] == (4, 6, 1.0)
    assert out[4] == (0, 0, 0.0)


def test_k_truss_bridge_cascade(spark):
    """Two 5-cliques + bridges (0,5), (1,6), (0,6): at k=4 the bridge
    supports cascade to extinction and exactly the 20 clique edges
    survive with support 3; at k=6 everything dies."""
    from tilekiln_spark.operators.graph import k_truss

    cliq = [(a, b) for a in range(5) for b in range(5) if a < b]
    cliq += [(a + 5, b + 5) for a, b in cliq]
    e = spark.createDataFrame(
        cliq + [(0, 5), (1, 6), (0, 6)], "src long, dst long"
    )
    out = k_truss(e, k=4).collect()
    assert len(out) == 20
    assert all(r.support == 3 for r in out)
    assert not any(r.u < 5 <= r.v for r in out)
    assert k_truss(e, k=6).count() == 0
