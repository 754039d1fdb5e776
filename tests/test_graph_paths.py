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


def test_closest_facility_labels_and_tiebreaks(spark):
    """Facilities {1, 7, 99} over the route fixture: node 2 is 1 hop from
    facility 1 (dist 1) vs 2 hops from 7 (1+4? no: 2-5-7 = 1+4 = 5) ->
    facility 1; node 8 belongs to 7 (w=1); the detached 99-100 component
    is served only by 99; facilities label themselves at dist 0.  An
    equal-dist equal-hops tie goes to the LOWEST facility id."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from tilekiln_spark.operators.graph import closest_facility

    edges = [
        (1, 2, 1.0), (2, 3, 1.0), (1, 3, 3.0), (1, 5, 2.0), (2, 5, 1.0),
        (3, 4, 2.0), (4, 6, 1.0), (6, 3, 1.0), (5, 7, 4.0), (7, 8, 1.0),
        (4, 8, 2.0), (8, 9, 3.0), (99, 100, 1.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst", "w"]),
        "src long, dst long, w double",
    )
    got = {r.node: (r.facility, r.dist, r.hops)
           for r in closest_facility(df, [1, 7, 99]).collect()}
    assert got[1] == (1, 0.0, 0) and got[7] == (7, 0.0, 0)
    assert got[2] == (1, 1.0, 1)
    assert got[8] == (7, 1.0, 1)
    assert got[99] == (99, 0.0, 0) and got[100] == (99, 1.0, 1)
    # node 5: dist 2 from 1 (direct) vs 4 from 7 -> facility 1
    assert got[5] == (1, 2.0, 1)

    # explicit equidistant tie: 1 - x - 7 with equal weights
    tie = spark.createDataFrame(
        pd.DataFrame([(1, 42, 2.0), (7, 42, 2.0)], columns=["src", "dst", "w"]),
        "src long, dst long, w double",
    )
    t = {r.node: (r.facility, r.dist) for r in
         closest_facility(tie, [1, 7]).collect()}
    assert t[42] == (1, 2.0)  # lowest facility id wins the exact tie


def test_service_areas_overlap_budget_and_labels(spark):
    """Budget-5 service areas from facilities {1, 7} on the route
    fixture, hand-computed: node 4 sits in BOTH areas (multi-label, the
    contract closest_facility deliberately lacks); node 5 keeps the
    fewest-hops label among equal-dist paths; 8 is out of 1's budget but
    inside 7's; the disconnected 99/100 component emits nothing."""
    import pandas as pd

    from tilekiln_spark.operators.graph import service_areas

    route = [
        (1, 2, 1.0), (2, 3, 1.0), (1, 3, 3.0), (1, 5, 2.0), (2, 5, 1.0),
        (3, 4, 2.0), (4, 6, 1.0), (6, 3, 1.0), (5, 7, 4.0), (7, 8, 1.0),
        (4, 8, 2.0), (8, 9, 3.0), (99, 100, 1.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(route, columns=["src", "dst", "w"]),
        "src long, dst long, w double",
    )
    got = {(r.facility, r.node): (r.dist, r.hops)
           for r in service_areas(df, [1, 7], budget=5.0).collect()}
    exp = {
        (1, 1): (0.0, 0), (1, 2): (1.0, 1), (1, 3): (2.0, 2),
        (1, 5): (2.0, 1), (1, 6): (3.0, 3), (1, 4): (4.0, 3),
        (7, 7): (0.0, 0), (7, 8): (1.0, 1), (7, 4): (3.0, 2),
        (7, 5): (4.0, 1), (7, 9): (4.0, 2), (7, 6): (4.0, 3),
        (7, 3): (5.0, 3), (7, 2): (5.0, 2),
    }
    assert got == exp


def test_service_areas_zero_budget_and_validation(spark):
    """Budget 0 returns exactly the facilities themselves; negative
    budget and empty facility list raise."""
    import pandas as pd
    import pytest

    from tilekiln_spark.operators.graph import service_areas

    df = spark.createDataFrame(
        pd.DataFrame(EDGES, columns=["src", "dst", "w"]),
        "src long, dst long, w double",
    )
    rows = service_areas(df, [1, 99], budget=0.0).collect()
    assert {(r.facility, r.node, r.dist, r.hops) for r in rows} == {
        (1, 1, 0.0, 0), (99, 99, 0.0, 0),
    }
    with pytest.raises(ValueError):
        service_areas(df, [], budget=1.0)
    with pytest.raises(ValueError):
        service_areas(df, [1], budget=-1.0)
