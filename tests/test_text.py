

def test_collocations_hand_values(spark):
    """Corpus 'a b a b': T=4, c(a)=c(b)=2, Nb=3, c12(a,b)=2 ->
    PMI = log2(32/12), t = (2 - 0.75)/sqrt(2)."""
    import math

    from tilekiln_spark.functions.text import collocations

    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    rows = {(r.w1, r.w2): r for r in collocations(df, min_count=1).collect()}
    ab = rows[("a", "b")]
    assert ab.c12 == 2
    assert ab.pmi == round(math.log2(32 / 12), 6)
    assert ab.t_score == round((2 - 0.75) / math.sqrt(2), 6)
    assert rows[("b", "a")].c12 == 1
