"""shortest_paths: multi-hop beats direct edge, equal-dist fewest-hops
tiebreak, cycle termination, unreachable nodes absent, directed mode."""

import pandas as pd

from tilekiln_spark.operators.graph import shortest_paths

EDGES = [
    (1, 2, 1.0),
    (2, 3, 1.0),
    (1, 3, 3.0),   # direct but longer than 1-2-3
    (1, 5, 2.0),   # dist tie with 1-2(1)+2-5(1): fewest hops wins
    (2, 5, 1.0),
    (3, 4, 2.0),
    (4, 6, 1.0),
    (6, 3, 1.0),   # cycle 3-4-6
    (99, 100, 1.0),  # disconnected from source 1
]


def _edges(spark, rows=EDGES):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst", "w"]),
        "src long, dst long, w double",
    )


def test_shortest_paths_undirected(spark):
    got = {
        r.node: (r.dist, r.hops)
        for r in shortest_paths(_edges(spark), source=1).collect()
    }
    assert got == {
        1: (0.0, 0),
        2: (1.0, 1),
        3: (2.0, 2),   # through 2, not the direct w=3 edge
        5: (2.0, 1),   # equal dist via 2 hops; direct edge wins tiebreak
        4: (4.0, 3),   # 1-2-3-4 = 4.0; around the cycle (via 6) ties at
                       # 4.0 with 4 hops and loses the tiebreak
        6: (3.0, 3),   # 1-2-3, 3-6 (w=1) = 3.0 in 3 hops
    }


def test_shortest_paths_directed(spark):
    # directed: 6->3 only, so 6 is reachable solely through 4
    got = {
        r.node: (r.dist, r.hops)
        for r in shortest_paths(_edges(spark), source=1, directed=True).collect()
    }
    assert got[4] == (4.0, 3)  # 1->2->3 (2.0) + 3->4 (2.0)
    assert got[6] == (5.0, 4)  # + 4->6 (1.0); the 6->3 arc can't be used
    assert 99 not in got and 100 not in got


def test_shortest_paths_nonconvergence_raises(spark):
    # a 5-hop chain with max_iter=2 must fail loudly, not return
    # truncated labels
    import pytest

    chain = [(i, i + 1, 1.0) for i in range(5)]
    with pytest.raises(RuntimeError, match="did not converge"):
        shortest_paths(_edges(spark, chain), source=0, max_iter=2)
