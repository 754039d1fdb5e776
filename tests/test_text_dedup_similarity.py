"""Training-data operators: text analysis, dedup families, similarity search."""

import pyspark.sql.functions as F
import pytest

from tilekiln_spark.functions.text import (
    fingerprint_md5,
    lang_id,
    quality_score,
    token_count,
)
from tilekiln_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    exact_dedup,
    minhash_dedup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard,
    paragraph_dedup,
    simhash_pairs,
)
from tilekiln_spark.operators.similarity import (
    brute_force_topk,
    cosine_sim,
    embedding_neardup_pairs,
    lsh_topk,
)


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------

def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b c",), ("  spaced   out  ",), ("",), ("   ",), ("one",)], "text string"
    )
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [3, 2, 0, 0, 1]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here", "en"),
            ("der hund und die katze ist nicht da", "de"),
            ("le chat est une merveille dans la maison", "fr"),
            ("el perro es una maravilla que ladra", "es"),
            ("xyzzy plugh qwerty", "und"),
            ("", "und"),
        ],
        "text string, want string",
    )
    for r in df.select(lang_id("text").alias("got"), "want").collect():
        assert r.got == r.want


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            ("good", "the quick brown fox jumps over the lazy dog and it is a fine day for the race " * 8),
            ("noisy", "@@!! ## $$ %% ^^ && ** (( )) !! ?? ;; ::"),
            ("empty", ""),
        ],
        "name string, text string",
    )
    scores = {r.name: r.q for r in df.select("name", quality_score("text").alias("q")).collect()}
    assert scores["good"] > scores["noisy"]
    assert 0.0 <= scores["empty"] <= 0.5
    assert all(0.0 <= v <= 1.0 for v in scores.values())


def test_readability_known_values(spark):
    """Flesch hand-check + DuckDB-twin bit-equality (shared regex classes
    and arithmetic, functions/text.py readability_features)."""
    import duckdb

    from tilekiln_spark.functions.text import readability_features, readability_sql

    rows = [("a", "The cat sat. It ran!"), ("b", ""), ("c", "zzz zzz")]
    df = spark.createDataFrame(rows, "name string, text string")
    w, s, v, flesch = readability_features(F.col("text"))
    got = {
        r.name: (r.w, r.s, r.v, r.f)
        for r in df.select(
            "name", w.alias("w"), s.alias("s"), v.alias("v"), flesch.alias("f")
        ).collect()
    }
    # 5 words, 2 sentences, 5 vowel groups (e,a,a,i,a)
    assert got["a"][:3] == (5, 2, 5)
    assert got["a"][3] == 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert got["b"] == (0, 0, 0, 206.835)          # guards clamp to 1
    assert got["c"][:3] == (2, 0, 0)
    ws, ss, vs, fs = readability_sql("text")
    vals = ",".join(f"({n!r}, {t!r})" for n, t in rows)
    want = duckdb.connect().execute(
        f"WITH t(name, text) AS (VALUES {vals}) "
        f"SELECT name, {ws}, {ss}, {vs}, {fs} FROM t"
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in want} == got


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("  hello world ",), ("hello worlds",)], "text string"
    )
    fps = [r[0] for r in df.select(fingerprint_md5("text")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def _corpus(spark):
    base = [(i, f"document number {i} with unique words w{i} x{i} y{i} z{i} padding tokens") for i in range(40)]
    dups = [(100 + i, base[i][1]) for i in range(10)]  # exact dups of 0..9
    near = [(200 + i, base[i][1] + " tail") for i in range(10)]  # near dups of 0..9
    return spark.createDataFrame(base + dups + near, "doc_id long, text string")


def test_exact_dedup(spark):
    c = _corpus(spark)
    kept = exact_dedup(c, "text", "doc_id")
    ids = {r.doc_id for r in kept.collect()}
    assert len(ids) == 50  # 40 base + 10 near (exact dups collapsed)
    assert all(i < 100 or i >= 200 for i in ids)  # min-key winner kept


def test_minhash_finds_planted_pairs(spark):
    c = _corpus(spark)
    pairs = minhash_dedup_pairs(c, "text", "doc_id", threshold=0.5, num_perm=64, bands=16)
    got = {(r.key_a, r.key_b) for r in pairs.collect()}
    # exact dups (j=1.0) and near dups (high j) must be found
    for i in range(10):
        assert (i, 100 + i) in got, f"exact dup {i} missed"
        assert (i, 200 + i) in got, f"near dup {i} missed"
        # transitive pair (100+i, 200+i) also high-jaccard
        assert (100 + i, 200 + i) in got
    # no false positives among unrelated docs
    for a, b in got:
        assert (a % 100) == (b % 100) or (a % 100 >= 40 and b % 100 >= 40) or a % 100 == b % 100


def test_minhash_jaccard_values(spark):
    c = _corpus(spark)
    pairs = minhash_dedup_pairs(c, "text", "doc_id", threshold=0.5, num_perm=64, bands=16)
    for r in pairs.filter((F.col("key_a") < 40) & (F.col("key_b") >= 100) & (F.col("key_b") < 200)).collect():
        assert r.jaccard == 1.0  # exact dup pairs


def test_ngram_jaccard_column(spark):
    df = spark.createDataFrame(
        [("a b c d e", "a b c d e"), ("a b c d e", "a b c d e f"), ("a b c", "x y z")],
        "ta string, tb string",
    )
    got = [r[0] for r in df.select(ngram_jaccard(F.col("ta"), F.col("tb"), 3)).collect()]
    assert got[0] == 1.0
    assert got[1] == pytest.approx(3 / 4)  # 3 shared shingles, 4 in union
    assert got[2] == 0.0


def test_simhash_exact_dups(spark):
    c = _corpus(spark)
    pairs = simhash_pairs(c, "text", "doc_id", max_hamming=0)
    got = {(r.key_a, r.key_b) for r in pairs.collect()}
    for i in range(10):
        assert (i, 100 + i) in got
    assert all(r.hamming == 0 for r in pairs.collect())


def test_simhash_near_dups_close(spark):
    c = _corpus(spark)
    pairs = simhash_pairs(c, "text", "doc_id", max_hamming=16, bands=8)
    got = {(r.key_a, r.key_b): r.hamming for r in pairs.collect()}
    found_near = sum(1 for i in range(10) if (i, 200 + i) in got)
    assert found_near >= 8  # one-token edit keeps hamming small


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def _vectors(spark, n=80, dim=16):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(dim).astype(float).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_cosine_sim(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [-1.0, -1.0])],
        "a array<double>, b array<double>",
    )
    got = [r[0] for r in df.select(cosine_sim(F.col("a"), F.col("b"))).collect()]
    assert got == pytest.approx([1.0, 0.0, -1.0])


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    df, rows = _vectors(spark)
    probes = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = df.filter(F.col("vec_id") >= 3)
    got = brute_force_topk(corpus, probes, k=5).collect()
    mat = np.array([r[1] for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    for pid in range(3):
        cos = (mat[3:] @ mat[pid]) / (norms[3:] * norms[pid])
        order = np.argsort(-cos)[:5] + 3
        want = [int(i) for i in order]
        have = [r.vec_id for r in sorted((g for g in got if g.probe_id == pid), key=lambda r: r.rank)]
        assert have == want


def test_lsh_topk_recall(spark):
    df, _ = _vectors(spark, n=120, dim=16)
    probes = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = df.filter(F.col("vec_id") >= 5)
    exact = {
        (r.probe_id, r.vec_id)
        for r in brute_force_topk(corpus, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.vec_id)
        for r in lsh_topk(corpus, probes, dim=16, k=5, nbits=12, bands=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # banded LSH with 6 bands of 2 bits: generous recall


def test_embedding_neardup(spark):
    df, _ = _vectors(spark, n=60, dim=16)
    dup = df.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda v: v * 1.0001).alias("embedding"),
    )
    corpus = df.unionByName(dup)
    pairs = embedding_neardup_pairs(corpus, dim=16, threshold=0.9999)
    got = {(r.key_a, r.key_b) for r in pairs.collect()}
    # scaled copies have cosine == 1 and identical sign signatures -> always found
    for i in range(8):
        assert (i, 1000 + i) in got


def test_pair_cosine_udf_null_propagates(spark):
    """make_pair_cosine_udf: null / ragged / empty vectors null-propagate per
    pair (like the zip_with HOF) instead of failing the whole Arrow batch."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.similarity import make_pair_cosine_udf

    rows = [
        (0, [1.0, 0.0], [1.0, 0.0]),
        (1, None, [1.0, 0.0]),
        (2, [1.0, 2.0, 3.0], [1.0, 2.0]),   # ragged
        (3, [], []),
        (4, [0.0, 3.0], [0.0, 6.0]),
    ]
    df = spark.createDataFrame(rows, "pid long, a array<double>, b array<double>")
    pc = make_pair_cosine_udf()
    got = {r.pid: r.c for r in df.select("pid", pc("a", "b").alias("c")).collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] == pytest.approx(1.0)


def _clustered_embeddings(spark, n_clusters=8, per_cluster=50, n_probes=16, dim=16, seed=7):
    """Seeded clustered corpus: orthogonal-ish cluster directions + small
    noise; keys are SHUFFLED across clusters so min-key centroids are an
    arbitrary draw (the realistic worst case for the min-key heuristic)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n_clusters, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    vecs = []
    for c in range(n_clusters):
        pts = dirs[c] + 0.15 * rng.normal(size=(per_cluster, dim))
        vecs.extend(pts)
    vecs = np.asarray(vecs)
    order = rng.permutation(len(vecs))
    corpus = [(int(i), vecs[order[i]].tolist()) for i in range(len(vecs))]
    probe_idx = rng.integers(0, len(vecs), n_probes)
    probes = [(int(1_000 + j), (vecs[pi] + 0.05 * rng.normal(size=dim)).tolist())
              for j, pi in enumerate(probe_idx)]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    pdf = spark.createDataFrame(probes, "probe_id long, embedding array<double>")
    return cdf, pdf


def test_ivf_kmeans_centroids_recall(spark):
    """ivf_topk(centroids="kmeans"): deterministic sampled spherical
    k-means buckets beat (or match) the min-key heuristic's recall against
    the exact brute-force top-k, and the whole path is reproducible
    (VERDICT r3 #8)."""
    from tilekiln_spark.operators.similarity import brute_force_topk, ivf_topk, kmeans_centroids

    corpus, probes = _clustered_embeddings(spark)
    corpus, probes = corpus.cache(), probes.cache()
    k = 10
    truth = {
        (r.probe_id, r.vec_id)
        for r in brute_force_topk(corpus, probes, k=k).collect()
    }

    def recall(cmode):
        got = {
            (r.probe_id, r.vec_id)
            for r in ivf_topk(
                corpus, probes, k=k, n_centroids=8, nprobe=2, centroids=cmode
            ).collect()
        }
        return len(got & truth) / len(truth)

    r_min, r_km = recall("minkey"), recall("kmeans")
    assert r_km >= r_min
    assert r_km >= 0.9
    # determinism: same seed -> identical centroid matrix
    import numpy as np

    c1 = kmeans_centroids(corpus, 8, seed=42)
    c2 = kmeans_centroids(corpus, 8, seed=42)
    assert np.array_equal(c1, c2)

def test_connected_components_graph_shapes(spark):
    # chain (diameter 4), triangle, isolated pair, 8-node chain: the
    # star-contraction must resolve all of them to their min-id label
    pairs = [(2, 1), (2, 3), (3, 4), (5, 4), (10, 11), (11, 12), (10, 12),
             (20, 21)] + [(n, n + 1) for n in range(30, 37)]
    df = spark.createDataFrame(pairs, "key_a long, key_b long")
    got = {(r.node, r.component) for r in connected_components(df).collect()}
    exp = ({(n, 1) for n in (1, 2, 3, 4, 5)}
           | {(n, 10) for n in (10, 11, 12)}
           | {(n, 20) for n in (20, 21)}
           | {(n, 30) for n in range(30, 38)})
    assert got == exp


def test_connected_components_empty_and_self_loop(spark):
    empty = spark.createDataFrame([], "key_a long, key_b long")
    assert connected_components(empty).count() == 0
    selfy = spark.createDataFrame([(7, 7)], "key_a long, key_b long")
    assert connected_components(selfy).count() == 0  # self loops dropped


def test_dedup_clusters_pipeline(spark):
    c = _corpus(spark)
    out = dedup_clusters(c, "text", "doc_id", threshold=0.8,
                         num_perm=64, bands=16, k=3).collect()
    assert len(out) == c.count()  # one row per corpus doc, singletons included
    by_doc = {r.doc_id: r for r in out}
    # exact dups 100..109 of docs 0..9 collapse onto the base doc's cluster
    for base in range(10):
        assert by_doc[100 + base].cluster_id == by_doc[base].cluster_id == base
        assert by_doc[base].is_canonical == 1
        assert by_doc[100 + base].is_canonical == 0
    # canonical iff doc_id == cluster_id
    for r in out:
        assert r.is_canonical == (1 if r.doc_id == r.cluster_id else 0)
    # cluster id is the min member id
    import collections
    members = collections.defaultdict(list)
    for r in out:
        members[r.cluster_id].append(r.doc_id)
    for cid, ms in members.items():
        assert cid == min(ms)


def test_paragraph_dedup_boilerplate(spark):
    # Shared footer in docs 1..3; doc 1 (min key) keeps it, 2 and 3 drop it.
    footer = "(c) 2026 example.com - all rights reserved"
    rows = [
        (1, "unique one\n" + footer),
        (2, "unique two\n\n" + footer),
        (3, footer + "\nunique three"),
        (4, "standalone page"),
    ]
    out = paragraph_dedup(
        spark.createDataFrame(rows, "doc_id int, text string"), "text", "doc_id"
    ).collect()
    by = {r.doc_id: r for r in out}
    assert by[1].text_clean == "unique one\n" + footer
    assert by[1].n_dropped == 0
    # empty separator line is formatting, always kept
    assert by[2].text_clean == "unique two\n"
    assert by[2].n_dropped == 1
    assert by[3].text_clean == "unique three"
    assert by[3].n_dropped == 1
    assert by[4].text_clean == "standalone page"
    # order preserved when duplicates interleave
    assert by[3].n_kept == 1 and by[2].n_kept == 2  # "unique two" + blank line


def test_paragraph_dedup_all_dropped_and_min_docs(spark):
    rows = [(1, "same"), (2, "same"), (3, "same")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df, "text", "doc_id").collect()}
    assert out[1].text_clean == "same"
    assert out[2].text_clean == "" and out[2].n_kept == 0 and out[2].n_dropped == 1
    assert out[3].text_clean == ""
    # min_docs=4 -> nothing repeats enough to drop
    kept = {r.doc_id: r for r in paragraph_dedup(df, "text", "doc_id", min_docs=4).collect()}
    assert all(kept[d].text_clean == "same" for d in (1, 2, 3))


def test_quantize_embeddings_roundtrip_and_zero(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.similarity import (
        dequantize_embedding,
        quantize_embeddings,
    )

    rows = [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize_embeddings(df)
    got = {r.vec_id: r for r in q.withColumn(
        "deq", dequantize_embedding(F.col("q8"), F.col("q8_scale"))).collect()}
    # q in [-127, 127]; max-abs element hits exactly +-127
    assert got[1].q8 == [64, -127, 32, 0]
    # reconstruction error bounded by scale/2
    err = np.abs(np.array(got[1].deq) - np.array(rows[0][1])).max()
    assert err <= got[1].q8_scale / 2 + 1e-12
    # zero vector: scale 0, all-zero codes, cosine guard path
    assert got[2].q8 == [0, 0, 0, 0] and got[2].q8_scale == 0.0


def test_quantized_topk_recall(spark):
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.similarity import brute_force_topk, quantized_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding")
    corpus = emb.filter(F.col("vec_id") >= 5)
    truth = {(r.probe_id, r.vec_id)
             for r in brute_force_topk(corpus, probes, k=10).collect()}
    got = {(r.probe_id, r.vec_id)
           for r in quantized_topk(corpus, probes, k=10).collect()}
    assert len(got & truth) / len(truth) >= 0.9  # int8 barely moves top-10


def test_repetition_signals_and_pii(spark):
    from pyspark.sql import functions as F

    from tilekiln_spark.functions.text import (
        bullet_line_fraction,
        dup_line_fraction,
        dup_ngram_fraction,
        pii_counts,
        redact_pii,
    )

    rows = [(1, "a\nb\na\n- x item\ny..."),
            (2, "mail me at a.b+c@d-e.org or 10.1.2.3 / +4915112345678 / 555-123-4567"),
            (3, ""), (4, "single")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cnts = pii_counts(F.col("text"))
    got = {r.doc_id: r for r in df.select(
        "doc_id",
        F.round(dup_line_fraction("text"), 4).alias("dlf"),
        F.round(dup_ngram_fraction("text", 2), 4).alias("dnf"),
        F.round(bullet_line_fraction("text"), 4).alias("blf"),
        cnts["email"].alias("ne"), cnts["ipv4"].alias("ni"), cnts["phone"].alias("np"),
        redact_pii("text").alias("red")).collect()}
    assert got[1].dlf == 0.2 and got[1].blf == 0.2  # 1 dup of 5, 1 bullet of 5
    assert (got[2].ne, got[2].ni, got[2].np) == (1, 1, 2)
    assert got[2].red == "mail me at <EMAIL> or <IPV4> / <PHONE> / <PHONE>"
    # degenerate docs: all-zero signals, no crash
    assert got[3].dlf == 0.0 and got[4].dnf == 0.0


def test_decontaminate(spark):
    from tilekiln_spark.operators.decontam import contamination_hits, decontaminate

    docs = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "completely unrelated text about weather patterns in distant mountain valleys today"),
        (3, "prefix words then the quick brown fox jumps over the lazy dog trailing"),
    ]
    bench = [(0, "quiz: the quick brown fox jumps over the lazy dog ?")]
    c = spark.createDataFrame(docs, "doc_id long, text string")
    b = spark.createDataFrame(bench, "doc_id long, text string")
    hits = {r.doc_id: r.n_hits for r in contamination_hits(c, b, n=8).collect()}
    assert 1 in hits and 3 in hits and 2 not in hits  # shared 8-gram flagged
    clean = {r.doc_id for r in decontaminate(c, b, n=8).collect()}
    assert clean == {2}
    # plan: benchmark side broadcasts, corpus rows never shuffle in removal
    plan = decontaminate(c, b, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_quantize_nan_and_null_vectors_null_propagate(spark):
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.similarity import quantize_embeddings, quantized_topk

    rows = [(1, [1.0, -2.0]), (2, [float("nan"), 1.0]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert got[1].q8 == [64, -127]
    assert got[2].q8 is None and got[2].q8_scale is None  # NaN -> null, no ANSI crash
    assert got[3].q8 is None
    # topk over the dirty corpus still runs; dirty rows rank last (cos 0.0)
    probes = spark.createDataFrame([(9, [1.0, -2.0])], "probe_id long, embedding array<double>")
    out = quantized_topk(df, probes, k=3)
    ranked = {r.vec_id: (r.rank, r.qcos) for r in out.collect()}
    assert ranked[1][0] == 1 and abs(ranked[1][1] - 1.0) < 1e-12
    assert ranked[2][1] == 0.0 and ranked[3][1] == 0.0


def test_vocab_topk(spark):
    from tilekiln_spark.functions.text import vocab_topk

    rows = [(1, "a b a c"), (2, "b a"), (3, "")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.token, r.n, r.rank) for r in vocab_topk(d, 2).collect()]
    assert got == [("a", 3, 1), ("b", 2, 2)]
    plan = vocab_topk(d, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no single-reducer global sort


def test_training_corpus_pipeline_funnel(spark):
    from tilekiln_spark.operators.pipeline import training_corpus_pipeline

    base = [(i, f"document number {i} body w{i} x{i} y{i} z{i} filler words here")
            for i in range(30)]
    exact_dups = [(100 + i, base[i][1]) for i in range(10)]
    docs = spark.createDataFrame(base + exact_dups, "doc_id long, text string")
    bench = spark.createDataFrame([(base[0][1],)], "text string")  # doc 0 contaminated
    row = training_corpus_pipeline(docs, bench, fraction=1.0).collect()[0]
    assert row.n_raw == 40
    assert row.n_exact == 30            # exact dups collapse
    assert row.n_canonical <= row.n_exact
    assert row.n_clean == row.n_canonical - 1  # exactly doc 0 decontaminated
    assert row.n_sampled == row.n_clean  # fraction 1.0 keeps all
    assert row.n_sequences >= 1
    assert row.total_chars > 0


def test_training_corpus_pipeline_probe_stage(spark):
    """probe={...}: docs scored below min_prob drop after decontamination;
    docs with NO embedding row pass (no evidence)."""
    import numpy as np

    from tilekiln_spark.operators.classifier import (
        linear_probe_scores,
        train_linear_probe,
    )
    from tilekiln_spark.operators.pipeline import training_corpus_pipeline

    base = [(i, f"document number {i} body w{i} x{i} y{i} z{i} filler words here")
            for i in range(30)]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    bench = spark.createDataFrame([("nothing matches this",)], "text string")
    rng = np.random.default_rng(9)
    # embeddings for docs 0..19 only; docs 20..29 have no row -> must pass
    emb_rows = [(i, rng.standard_normal(8).tolist(), float(i % 2)) for i in range(20)]
    emb = spark.createDataFrame(emb_rows, "doc_id long, embedding array<double>, y double")

    w = train_linear_probe(emb, vec_col="embedding", label_col="y", dim=8, iters=3)
    probs = {
        r.doc_id: r.prob
        for r in linear_probe_scores(emb, w, key_col="doc_id").collect()
    }
    cut = sorted(probs.values())[10]  # drops the 10 lowest-scoring embedded docs
    row = training_corpus_pipeline(
        docs, bench, fraction=1.0,
        probe={"embeddings": emb, "label_col": "y", "min_prob": cut, "dim": 8},
    ).collect()[0]
    n_over = sum(1 for p in probs.values() if p >= cut)
    assert row.n_clean == 30
    assert row.n_probe == 10 + n_over  # 10 un-embedded pass + survivors
    assert row.n_sampled == row.n_probe


def _semdedup_reference(rows, threshold, n_centroids):
    """Pure-python SemDeDup twin: minkey centroids -> argmax-cosine assign ->
    within-cluster pairs >= threshold -> union-find -> min-id labels."""
    import numpy as np

    keys = sorted(k for k, _ in rows)
    vec = {k: np.asarray(v, dtype=np.float64) for k, v in rows}
    cents = [vec[k] / max(np.linalg.norm(vec[k]), 1e-12) for k in keys[:n_centroids]]
    assign = {}
    for k in keys:
        vn = vec[k] / max(np.linalg.norm(vec[k]), 1e-12)
        cos = [float(vn @ c) for c in cents]
        assign[k] = int(np.argmax(cos))
    parent = {k: k for k in keys}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            if assign[a] != assign[b]:
                continue
            c = float(vec[a] @ vec[b] / (np.linalg.norm(vec[a]) * np.linalg.norm(vec[b])))
            if c >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {k: (assign[k], find(k)) for k in keys}


def test_semantic_dedup_differential(spark):
    """semantic_dedup vs an independent pure-python pipeline on a corpus with
    planted semantic duplicates (scaled + epsilon-perturbed copies)."""
    from tilekiln_spark.operators.similarity import semantic_dedup

    df, rows = _vectors(spark, n=50, dim=16)
    # two generations of copies of vectors 0..5: A~B and A~C (cos == 1.0-ish)
    all_rows = list(rows)
    for gen, (off, eps) in enumerate([(1000, 1.001), (2000, 0.998)]):
        all_rows += [
            (k + off, [x * eps for x in v]) for k, v in rows if k < 6
        ]
    corpus = spark.createDataFrame(all_rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.cluster, r.sem_cluster_id, r.is_canonical)
        for r in semantic_dedup(corpus, threshold=0.9, n_centroids=4).collect()
    }
    want = _semdedup_reference(all_rows, 0.9, 4)
    assert len(got) == len(all_rows)
    for k, (cl, comp) in want.items():
        assert got[k] == (cl, comp, int(comp == k)), k
    # the planted triples collapsed: base id is canonical, copies are not
    for k in range(6):
        assert got[k][2] == 1
        assert got[k + 1000] == (got[k][0], k, 0)
        assert got[k + 2000] == (got[k][0], k, 0)
    # exactly one canonical per semantic cluster
    by_comp = {}
    for k, (cl, comp, can) in got.items():
        by_comp.setdefault(comp, []).append(can)
    assert all(sum(v) == 1 for v in by_comp.values())


def test_semantic_dedup_max_cluster_cap(spark):
    """Over-cap coarse clusters are skipped from pairing: every member stays
    its own singleton (un-deduped), mirroring the LSH band-cap contract."""
    from tilekiln_spark.operators.similarity import semantic_dedup

    df, rows = _vectors(spark, n=12, dim=16)
    dup = [(k + 500, [x * 1.001 for x in v]) for k, v in rows]
    corpus = spark.createDataFrame(
        list(rows) + dup, "vec_id long, embedding array<double>"
    )
    capped = semantic_dedup(corpus, threshold=0.9, n_centroids=1, max_cluster=3)
    got = capped.collect()
    assert all(r.is_canonical == 1 and r.sem_cluster_id == r.vec_id for r in got)


def test_dedup_against_index(spark):
    """Incremental dedup: new docs flagged iff they near-match the INDEX
    corpus; new-vs-new duplicates are NOT flagged (next self-dedup's job)."""
    from tilekiln_spark.operators.dedup import dedup_against

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    index_rows = [
        (i, " ".join(words[j % 10] + str((i * 7 + j) % 13) for j in range(12)))
        for i in range(40)
    ]
    new_rows = (
        [(100 + i, index_rows[i][1]) for i in range(10)]  # exact copies
        + [(200 + i, f"zzz{i} yyy{i} xxx{i} www{i} vvv{i} uuu{i}") for i in range(5)]
        + [(300, "same new text here repeated tokens"), (301, "same new text here repeated tokens")]
    )
    idx = spark.createDataFrame(index_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {r.doc_id: (r.is_dup, r.dup_of, r.n_dups) for r in dedup_against(new, idx).collect()}
    assert len(got) == len(new_rows)
    for i in range(10):
        assert got[100 + i][0] == 1
        assert got[100 + i][1] == i  # min matching index key = the source doc
    for i in range(5):
        assert got[200 + i] == (0, None, 0)
    assert got[300] == (0, None, 0) and got[301] == (0, None, 0)


def test_minhash_pairs_between_jaccard_values(spark):
    """Cross-corpus verify stage computes the exact shingle Jaccard."""
    from tilekiln_spark.operators.dedup import minhash_pairs_between, ngram_jaccard

    t = "one two three four five six seven eight"
    idx = spark.createDataFrame([(1, t)], "doc_id long, text string")
    new = spark.createDataFrame([(2, t)], "doc_id long, text string")
    rows = minhash_pairs_between(new, idx, threshold=0.5).collect()
    assert [(r.key_new, r.key_index, r.jaccard) for r in rows] == [(2, 1, 1.0)]


def test_semantic_contamination(spark):
    """Corpus rows whose embedding ~matches a benchmark item are flagged with
    the min matching bench id; clean rows report zero hits."""
    from tilekiln_spark.operators.decontam import semantic_contamination

    df, rows = _vectors(spark, n=30, dim=16)
    bench = spark.createDataFrame(
        [(100 + i, [x * 0.999 for x in rows[i][1]]) for i in range(3)]
        + [(103, [x * 1.002 for x in rows[1][1]])],  # second hit for doc 1
        "bench_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.n_hits, r.hit_of, r.best_cos)
        for r in semantic_contamination(df, bench, threshold=0.95).collect()
    }
    assert len(got) == 30
    assert got[0][:2] == (1, 100)
    assert got[1][:2] == (2, 101)
    assert got[2][:2] == (1, 102)
    assert got[0][2] == pytest.approx(1.0, abs=1e-6)
    for k in range(3, 30):
        assert got[k] == (0, None, 0.0)


def test_remove_duplicate_spans(spark):
    """Tokens covered by cross-document duplicated windows are removed;
    unique docs pass unchanged; all-boilerplate docs rewrite to ''."""
    from tilekiln_spark.operators.dedup import remove_duplicate_spans

    boiler = "subscribe to our newsletter for daily updates and offers"  # 9 toks
    rows = [
        (0, f"unique lead-in text one {boiler}"),
        (1, f"{boiler} unique trailing text two"),
        (2, "wholly original document with no shared windows at all present"),
        (3, boiler),
        (4, boiler),
        (5, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text_clean, r.n_kept, r.n_removed)
           for r in remove_duplicate_spans(df, window=8, min_docs=2).collect()}
    # the 9-token boilerplate yields 2 duplicated 8-windows covering all 9
    # tokens in docs 0,1,3,4
    assert got[3] == ("", 0, 9)
    assert got[4] == ("", 0, 9)
    assert got[0] == ("unique lead-in text one", 4, 9)
    assert got[1] == ("unique trailing text two", 4, 9)
    assert got[2][1] == 10 and got[2][2] == 0
    assert got[2][0] == rows[2][1]
    assert got[5] == ("tiny doc", 2, 0)  # < window tokens: unchanged


def test_semantic_dedup_centroid_far_exemplar(spark):
    """canonical='centroid_far' keeps the paper's exemplar — the in-ball
    member FARTHEST from its coarse centroid — instead of the min key."""
    import math

    from tilekiln_spark.operators.similarity import semantic_dedup

    def rot(theta):  # unit vector in the e1/e2 plane
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = [
        (0, rot(0.0)),    # min-key vector = the single coarse centroid
        (1, rot(0.20)),   # cos to centroid 0.980
        (2, rot(0.35)),   # cos to centroid 0.939  <- farthest in the ball
        (10, [0.0, 0.0, 1.0, 0.0]),  # orthogonal singleton
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = {
        r.vec_id: (r.sem_cluster_id, r.is_canonical)
        for r in semantic_dedup(corpus, threshold=0.9, n_centroids=1).collect()
    }
    far = {
        r.vec_id: (r.sem_cluster_id, r.is_canonical)
        for r in semantic_dedup(
            corpus, threshold=0.9, n_centroids=1, canonical="centroid_far"
        ).collect()
    }
    # 0,1,2 chain into one ball (pairwise cos >= cos(0.35) > 0.9); 10 alone
    assert base[0] == (0, 1) and base[1] == (0, 0) and base[2] == (0, 0)
    assert far[0] == (0, 0) and far[1] == (0, 0) and far[2] == (0, 1)
    assert base[10] == (10, 1) and far[10] == (10, 1)


def test_training_corpus_pipeline_bucket_stage(spark):
    """lm_buckets drops exactly the tail tercile; exclusive with the
    fixed-threshold knob; no-bigram docs pass (no evidence)."""
    import pytest

    from tilekiln_spark.operators.pipeline import training_corpus_pipeline

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat and then the cat sat again " + ("qq " * (i % 3)))
         for i in range(12)] + [(99, "solo")],   # one-token doc: no bigrams
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("nothing matches this",)], "text string")
    row = training_corpus_pipeline(
        docs, bench, fraction=1.0,
        lm_buckets=("head", "middle"), lm_k_vocab=16, lm_m_bigrams=32,
    ).collect()[0]
    assert row.n_raw == 13
    # 12 scoreable docs -> 4 tail dropped; the no-bigram doc passes
    assert row.n_lm == 13 - 4
    with pytest.raises(ValueError, match="not both"):
        training_corpus_pipeline(
            docs, bench, lm_min_logprob=-4.0, lm_buckets=("head",),
        )
