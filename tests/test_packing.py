"""Sequence packing (operators/packing.py)."""

import pyspark.sql.functions as F

from tilekiln_spark.operators.packing import pack_sequences

SEQ = 10


def _docs(spark, lens):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tokens long"
    )


def test_pack_contiguous_and_spanning(spark):
    # lens 4+4 fill seq0 to 8; len 5 spans seq0->seq1; len 0 sits at its slot
    d = _docs(spark, [4, 4, 5, 0, 8])
    got = {r.doc_id: r for r in pack_sequences(d, SEQ, "n_tokens").collect()}
    assert (got[0].first_seq, got[0].last_seq, got[0].seq_offset) == (0, 0, 0)
    assert (got[1].first_seq, got[1].seq_offset) == (0, 4)
    assert (got[2].first_seq, got[2].last_seq) == (0, 1)  # spans the boundary
    assert (got[3].first_seq, got[3].last_seq, got[3].seq_offset) == (1, 1, 3)
    assert (got[4].first_seq, got[4].last_seq) == (1, 2)  # 13..20 spans
    # global contiguity: each doc starts where the previous ended
    pos = 0
    for i in sorted(got):
        r = got[i]
        assert r.first_seq * SEQ + r.seq_offset == pos
        pos += r.n_tokens


def test_pack_partition_layout_independent(spark):
    d = _docs(spark, list(range(1, 60)))
    a = sorted(tuple(r) for r in pack_sequences(d, 16, "n_tokens", num_partitions=2).collect())
    b = sorted(tuple(r) for r in
               pack_sequences(d.repartition(7), 16, "n_tokens", num_partitions=5).collect())
    assert a == b


def test_pack_no_global_single_reducer(spark):
    # the plan must range-partition, never funnel through one reducer via
    # a global Window.orderBy
    d = _docs(spark, [3] * 100)
    plan = pack_sequences(d, 8, "n_tokens", num_partitions=4)._jdf \
        .queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan
