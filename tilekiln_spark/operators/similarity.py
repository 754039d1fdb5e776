"""Similarity search over embedding columns (array<float>).

- cosine_sim        — built-in expression (zip_with + aggregate): JVM-side.
- brute_force_topk  — exact top-k per probe: broadcast probes x corpus,
  ranked with a per-probe window. The O(N*P) baseline; correct at any scale
  where P (probes) is small.
- lsh_topk          — random-hyperplane LSH: sign-bit signature -> banded
  candidate buckets -> exact rerank within candidates. The scale path: the
  corpus signature pass is map-only; the probe join shuffles only candidate
  buckets.
- embedding_neardup_pairs — near-duplicate vectors (cosine >= threshold) via
  the same LSH bucketing, self-joined.

- ivf_topk          — IVF coarse quantizer: matmul bucket assignment
  (map-only), nprobe bucket search, exact rerank.  The bucket column is the
  natural Iceberg partition key at 10^12 rows.

Hyperplanes/centroids are seeded & deterministic and ride to executors in
the Arrow UDF closure (tiny: nbits x dim doubles) — like a broadcast of a
small dim table, and the DuckDB oracles re-derive the exact same signatures
from the same constants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def make_pair_cosine_udf():
    """Batched rerank kernel: cosine over (vec, vec) pairs, one Arrow batch
    at a time — replaces the interpreted-HOF ``cosine_sim`` on the
    candidate-rerank paths (VERDICT r2 #10) where candidate volume is
    k x nprobe x probes.

    BIT-IDENTICAL to the HOF fold by construction, so swapping it in cannot
    move a single ulp against the DuckDB oracles: elementwise products stay
    in the input dtype (float32 for array<float> columns, exactly like
    ``zip_with(a, b, x*y)``), and accumulation is a float64 LEFT FOLD in
    dimension order (an explicit per-dimension loop over the transposed
    batch — np.add.reduce would use pairwise summation and differ in the
    last ulp).  The loop is dim iterations of whole-batch adds: ~dim x
    faster than per-row HOF eval, same numbers."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def pcos(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        if n == 0:
            return pd.Series([], dtype="float64")
        av, bv = a.to_numpy(), b.to_numpy()
        # null / ragged-length pairs null-propagate (like the HOF zip_with
        # form) instead of failing np.stack for the whole Arrow batch
        pairs = []
        for i in range(n):
            x, y = av[i], bv[i]
            if x is None or y is None or len(x) != len(y) or len(x) == 0:
                pairs.append(None)
            else:
                pairs.append(len(x))
        out = np.full(n, np.nan, dtype=np.float64)  # NaN -> SQL NULL
        for dim in {d for d in pairs if d is not None}:
            rows = np.array([i for i in range(n) if pairs[i] == dim])
            A = np.stack([np.asarray(av[i]) for i in rows])
            B = np.stack([np.asarray(bv[i]) for i in rows])
            prod_t = (A * B).T
            sqa_t = (A * A).T
            sqb_t = (B * B).T
            m = len(rows)
            acc = np.zeros(m, dtype=np.float64)
            na = np.zeros(m, dtype=np.float64)
            nb = np.zeros(m, dtype=np.float64)
            for d in range(prod_t.shape[0]):
                acc += prod_t[d]
                na += sqa_t[d]
                nb += sqb_t[d]
            den = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                out[rows] = np.where(den > 0, acc / den, 0.0)
        return pd.Series(out)

    return pcos


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    probe_key: str = "probe_id",
) -> DataFrame:
    """Exact top-k: (probe_id, vec_id, cos) with rank 1..k per probe.

    Probes are broadcast; ties broken by corpus key for determinism."""
    p = probes.select(
        F.col(probe_key), F.col(vec_col).alias("__pvec")
    )
    joined = corpus.join(F.broadcast(p))
    cos = cosine_sim(F.col(vec_col), F.col("__pvec"))
    w = Window.partitionBy(probe_key).orderBy(
        F.col("cos").desc(), F.col(key_col).asc()
    )
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_key, key_col, "cos", "rank")
    )


def matryoshka_truncate(
    df: DataFrame, dims: int, vec_col: str = "embedding"
) -> DataFrame:
    """Matryoshka-style dimension truncation: keep the first ``dims``
    components of the embedding column (MRL-trained models order
    information by prefix, so the prefix IS a usable lower-dim
    embedding).  Pure ``slice`` — map-only, and the practical lever it
    buys at corpus scale is shuffle/storage WIDTH: a dims/D cut on the
    pipeline's dominant column, ahead of int8 quantization's further 4x
    (:func:`quantize_embeddings`).  Cosine ranking downstream needs no
    renormalization (cosine is scale-invariant; rankings change only by
    the information the truncation discards)."""
    return df.withColumn(vec_col, F.slice(F.col(vec_col), 1, int(dims)))


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature as a long (nbits <= 63) — expression form.

    NB: interpreted-HOF hot spot (nbits aggregate/zip_with dots per row, no
    codegen for HOFs, literal-array hyperplanes inflate the plan).  Kept for
    the oracle-SQL twin's readability; the engine paths use
    make_lsh_sig_udf (one (batch x dim)@(dim x nbits) numpy matmul, same
    semantics, ~nbits x faster — the same fix as MinHash's signature UDF)."""
    bits = []
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in row])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(F.shiftleft(bit, i))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def make_lsh_sig_udf(planes: np.ndarray):
    """Vectorized sign-bit signature: Arrow batch -> one numpy matmul.

    bit_i = (vec . plane_i >= 0); signature = sum(bit_i << i).  Summation
    order inside the dot differs from the sequential expression fold only in
    the last ulp — sign flips require |dot| ~ 1e-16, irrelevant for LSH."""
    from pyspark.sql.types import LongType

    P = np.ascontiguousarray(planes.T, dtype=np.float64)  # (dim, nbits)
    nbits = P.shape[1]
    weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))

    @F.pandas_udf(LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs.to_numpy()])
        bits = (M @ P >= 0).astype(np.uint64)
        out = (bits * weights[None, :]).sum(axis=1).view(np.int64)
        return pd.Series(out)

    return sig


def _banded(df: DataFrame, sig_col: str, bands: int, nbits: int) -> DataFrame:
    width = nbits // bands
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftrightunsigned(F.col(sig_col), bi * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("__b"),
    ).select(*df.columns, F.col("__b.band").alias("band"), F.col("__b.block").alias("block"))


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    probe_key: str = "probe_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing >=1 signature
    band with the probe; exact cosine rerank within candidates."""
    planes = _hyperplanes(dim, nbits, seed)
    sig_udf = make_lsh_sig_udf(planes)
    # ArrowEvalPython is a CollapseProject barrier: the matmul signature is
    # materialized once, never inlined into the band slices
    c = _banded(
        corpus.withColumn("__sig", sig_udf(F.col(vec_col))),
        "__sig", bands, nbits,
    )
    p = _banded(
        probes.withColumn("__sig", sig_udf(F.col(vec_col))),
        "__sig", bands, nbits,
    ).select(probe_key, F.col(vec_col).alias("__pvec"), "band", "block")
    cands = (
        c.join(F.broadcast(p), ["band", "block"])
        .select(probe_key, key_col, vec_col, "__pvec")
        .distinct()
    )
    cos = make_pair_cosine_udf()(F.col(vec_col), F.col("__pvec"))
    w = Window.partitionBy(probe_key).orderBy(F.col("cos").desc(), F.col(key_col).asc())
    return (
        cands.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_key, key_col, "cos", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    sample_n: int = 4096,
    seed: int = 42,
    iters: int = 10,
) -> np.ndarray:
    """Sampled spherical k-means centroids for the IVF coarse quantizer
    (VERDICT r3 #8) — the recall-quality upgrade over the min-key seed,
    behind the same deterministic-seed contract.

    Scale shape: the training set is a DETERMINISTIC pseudo-random sample —
    orderBy(md5(key)) + limit = one TakeOrdered, so the driver holds at most
    ``sample_n`` vectors no matter the corpus size (no full collect at
    10^12 rows).  Lloyd's iterations then run driver-side in numpy over
    that sample (sample_n x dim — trivial), with k-means++ seeding from
    ``np.random.default_rng(seed)`` and empty clusters reseeded to the
    farthest sample point.  Assignment/update use cosine on L2-normalized
    vectors (spherical k-means), matching ``make_ivf_assign_udf``'s
    assignment metric exactly."""
    rows = (
        corpus.select(key_col, vec_col)
        .orderBy(F.md5(F.col(key_col).cast("string")), F.col(key_col))
        .limit(sample_n)
        .collect()
    )
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    m = len(Xn)
    k = min(n_centroids, m)
    rng = np.random.default_rng(seed)
    # k-means++ seeding on cosine distance (1 - cos over unit vectors)
    first = int(rng.integers(m))
    chosen = [first]
    d2 = 1.0 - Xn @ Xn[first]
    for _ in range(1, k):
        d2c = np.maximum(d2, 0.0)
        tot = d2c.sum()
        if tot <= 0:
            nxt = int(rng.integers(m))
        else:
            nxt = int(rng.choice(m, p=d2c / tot))
        chosen.append(nxt)
        d2 = np.minimum(d2, 1.0 - Xn @ Xn[nxt])
    C = Xn[chosen].copy()
    for _ in range(iters):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign, Xn)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            # reseed each empty cluster to the point farthest from its
            # current assignment (largest cosine distance)
            far = np.argsort(-(1.0 - (Xn * Cn[assign]).sum(axis=1)))
            for ci, pi in zip(np.nonzero(empty)[0], far):
                newC[ci] = Xn[pi]
                counts[ci] = 1
        C = newC / counts[:, None]
        if np.allclose(
            C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12), Cn
        ):
            break
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def _centroid_matrix(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str,
    key_col: str,
    centroids: str | np.ndarray,
    seed: int,
) -> np.ndarray:
    """Resolve the (K x dim) coarse-quantizer centroid matrix shared by
    ivf_topk and semantic_dedup: "minkey" = the n_centroids corpus vectors
    with the smallest keys (deterministic — DuckDB oracles re-derive the
    exact buckets; a recall heuristic, not a quality choice), "kmeans" =
    sampled spherical k-means (seeded, bounded driver footprint), or a
    precomputed ndarray handed through verbatim."""
    if isinstance(centroids, np.ndarray):
        return np.asarray(centroids, dtype=np.float64)
    if centroids == "kmeans":
        return kmeans_centroids(
            corpus, n_centroids, vec_col=vec_col, key_col=key_col, seed=seed
        )
    cent_rows = (
        corpus.select(key_col, vec_col).orderBy(key_col).limit(n_centroids).collect()
    )
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in cent_rows])


def make_ivf_assign_udf(centroids: np.ndarray, top: int):
    """Cluster assignment for IVF: one (batch x dim) @ (dim x K) matmul per
    Arrow batch over L2-normalized vectors; returns the `top` nearest
    centroid indices (cosine order, first-index tie-break) as array<int>."""
    from pyspark.sql.types import ArrayType, IntegerType

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs.to_numpy()])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        cos = Mn @ Cn.T  # (batch, K)
        # stable top-`top`: sort by (-cos, index)
        order = np.argsort(-cos, axis=1, kind="stable")[:, :top].astype(np.int32)
        return pd.Series(list(order))

    return assign


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    probe_key: str = "probe_id",
    centroids: str | np.ndarray = "minkey",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path next to LSH: corpus vectors partition into centroid buckets via one
    matmul Arrow UDF (map-only, no shuffle), probes search their `nprobe`
    nearest buckets, exact cosine rerank inside.

    centroids:
    - "minkey" (default): the n_centroids corpus vectors with the smallest
      keys — deterministic, so the DuckDB oracle can re-derive the exact
      buckets.  A recall heuristic, not a quality choice.
    - "kmeans": sampled spherical k-means (``kmeans_centroids`` — seeded,
      deterministic, bounded driver footprint).  Better-balanced buckets
      and recall; the oracle twin keeps "minkey" because DuckDB cannot
      re-run Lloyd's.
    - an ndarray: precomputed (K x dim) centroid matrix, handed verbatim
      to the same assign UDF.

    At 10^12 rows the bucket column doubles as the Iceberg partition key,
    making probe-side reads partition-pruned scans."""
    C = _centroid_matrix(corpus, n_centroids, vec_col, key_col, centroids, seed)
    a1 = make_ivf_assign_udf(C, 1)
    ap = make_ivf_assign_udf(C, nprobe)
    c = corpus.withColumn("cluster", a1(F.col(vec_col))[0])
    p = (
        probes.withColumn("cluster", F.explode(ap(F.col(vec_col))))
        .select(probe_key, F.col(vec_col).alias("__pvec"), "cluster")
    )
    cands = c.join(F.broadcast(p), "cluster").select(
        probe_key, key_col, vec_col, "__pvec"
    )
    cos = make_pair_cosine_udf()(F.col(vec_col), F.col("__pvec"))
    w = Window.partitionBy(probe_key).orderBy(F.col("cos").desc(), F.col(key_col).asc())
    return (
        cands.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_key, key_col, "cos", "rank")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    nbits: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs (cos >= threshold), LSH-bucketed self-join."""
    planes = _hyperplanes(dim, nbits, seed)
    sig_udf = make_lsh_sig_udf(planes)
    base = corpus.select(F.col(key_col).alias("k"), F.col(vec_col).alias("v"))
    sig = _banded(
        base.withColumn("__sig", sig_udf(F.col("v"))),  # Arrow barrier — see lsh_topk
        "__sig", bands, nbits,
    )
    l, r = sig.alias("l"), sig.alias("r")
    # dedupe on KEYS first, rejoin vectors after: a pair that collides in
    # several bands would otherwise carry 2 x dim floats through the
    # distinct's shuffle — this way the distinct moves 16 bytes per pair and
    # the vectors ride two key-partitioned joins of the slim corpus
    pair_keys = (
        l.join(r, ["band", "block"])
        .filter(F.col("l.k") < F.col("r.k"))
        .select(F.col("l.k").alias("key_a"), F.col("r.k").alias("key_b"))
        .distinct()
    )
    pairs = pair_keys.join(
        base.select(F.col("k").alias("key_a"), F.col("v").alias("va")), "key_a"
    ).join(base.select(F.col("k").alias("key_b"), F.col("v").alias("vb")), "key_b")
    return (
        pairs.withColumn("cos", make_pair_cosine_udf()(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("key_a", "key_b", "cos")
    )


# --------------------------------------------------------------------------
# Int8 embedding quantization (4x storage/shuffle reduction at corpus scale)
# --------------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q = round(v / scale) with
    scale = max|v| / 127, so q in [-127, 127].

    At 10^12-doc scale the embedding column dominates storage and shuffle
    width; int8 cuts both 4x while cosine ranking is untouched in
    EXPECTATION and — because symmetric quantization is a pure per-vector
    rescale — cosine computed ON the int arrays equals cosine of the
    dequantized vectors exactly (the scales cancel in the normalized
    ratio).  Pure codegen expressions (no UDF): rounding is
    floor(x/scale + 0.5), which every engine evaluates identically on
    IEEE doubles — the driver oracle exploits that for byte-identical
    cross-engine parity.  Zero vectors quantize to all-zero with scale 0."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    raw = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    # NaN guard: Spark orders NaN above every double, so a NaN element would
    # take the quantize branch and crash the ANSI int cast — null-propagate
    # instead (null/NaN vectors rank last in quantized_cosine, they don't
    # fail the job; same contract as the pair-cosine kernel's null mask)
    scale = F.when(F.isnan(raw), F.lit(None).cast("double")).otherwise(raw)
    q = F.when(
        F.col("q8_scale") > 0,
        F.transform(v, lambda x: F.floor(x / F.col("q8_scale") + F.lit(0.5)).cast("int")),
    ).when(F.col("q8_scale") == 0, F.transform(v, lambda x: F.lit(0)))
    return df.withColumn("q8_scale", scale).withColumn("q8", q)


def dequantize_embedding(q_col: Column, scale_col: Column) -> Column:
    """array<double> reconstruction: q * scale (max abs error scale/2)."""
    return F.transform(q_col, lambda x: x.cast("double") * scale_col)


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over int8 arrays with EXACT integer dot/norm accumulation
    (long sums; products <= 127^2 * dim stay far inside 2^63), finalized as
    one double ratio — bit-identical across engines for identical ints."""
    d = F.aggregate(
        F.zip_with(qa, qb, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    na = F.aggregate(
        F.transform(qa, lambda a: (a * a).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    ).cast("double")
    nb = F.aggregate(
        F.transform(qb, lambda b: (b * b).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    ).cast("double")
    return F.when(
        (na > 0) & (nb > 0), d / (F.sqrt(na) * F.sqrt(nb))
    ).otherwise(F.lit(0.0))


def quantized_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    probe_key: str = "probe_id",
) -> DataFrame:
    """brute_force_topk over int8-quantized vectors: the memory-bandwidth
    baseline for ANN at scale (same broadcast-probes plan, quarter-width
    corpus column).  Returns (probe_id, vec_id, qcos, rank)."""
    qc = quantize_embeddings(corpus, vec_col).select(key_col, "q8")
    qp = quantize_embeddings(probes, vec_col).select(
        F.col(probe_key), F.col("q8").alias("__pq8")
    )
    joined = qc.join(F.broadcast(qp))
    w = Window.partitionBy(probe_key).orderBy(
        F.col("qcos").desc(), F.col(key_col).asc()
    )
    return (
        joined.withColumn("qcos", quantized_cosine(F.col("q8"), F.col("__pq8")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_key, key_col, "qcos", "rank")
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic near-duplicate removal over embedding space
# --------------------------------------------------------------------------


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    centroids: str | np.ndarray = "minkey",
    seed: int = 42,
    max_cluster: int = 100_000,
    canonical: str = "minkey",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540): remove
    documents that are SEMANTIC duplicates — same meaning, different
    surface text — which MinHash/SimHash (lexical) and embedding_neardup
    (pairwise epsilon ~ 1e-3) both miss.  The paper's recipe: coarse
    k-means clustering of the embeddings, exact pairwise cosine WITHIN
    each cluster only, and collapse every epsilon-ball (cos >= threshold)
    to one kept exemplar.

    Pipeline (every stage an existing audited shape):
      1. coarse assignment — one (batch x dim) @ (dim x K) matmul Arrow
         UDF per batch (map-only, no shuffle; make_ivf_assign_udf, the
         same kernel ann_ivf_topk hash-verifies cross-engine);
      2. within-cluster candidate pairs — a self-join on the cluster id
         carrying ONLY (cluster, key): 16 bytes per pair through the
         exchange, vectors rejoin by key afterwards (the
         embedding_neardup_pairs slim-pair discipline);
      3. exact cosine >= threshold filter via the null-safe batched pair
         kernel;
      4. connected components (large-star/small-star) over the verified
         pair list -> one row per corpus vector with its semantic cluster
         id and a deterministic canonical-survivor flag.  Filter
         ``is_canonical = 1`` to materialize the deduplicated corpus.

    Returns (key_col, cluster, sem_cluster_id, is_canonical): ``cluster``
    is the coarse quantizer bucket (int), ``sem_cluster_id`` the min key
    reachable through the epsilon-ball graph (vectors with no >= threshold
    neighbour are their own singleton cluster).

    Scale shape (10^12 docs): a coarse cluster of B members emits
    B(B-1)/2 pairs, so K must grow with the corpus (the paper uses
    K ~ N / 10^4; clusters of ~10k -> ~5e7 comparisons each, embarrassingly
    parallel since stage 2 shuffles keys only).  ``max_cluster`` (default
    100k) drops over-cap clusters from pairing entirely — identical
    rationale to the LSH/SimHash band caps, except here skipped members
    simply stay un-deduped (raise K instead of the cap at production
    scale; the cap is job-death insurance, not a tuning knob).

    ``canonical`` picks the survivor rule:
    - "minkey" (default): the MIN-KEY member — deterministic,
      engine-portable, consistent with dedup_clusters' canonical rule,
      and what the driver oracle replays.
    - "centroid_far": the paper's rule — keep the member with the LOWEST
      cosine to its coarse centroid (favouring in-ball outliers;
      Abbas et al. §3), ties broken by min key.  The cosine is a pure
      expression against the centroid literal array (no extra UDF); the
      selection is one row_number window over the semantic cluster.
    Either way ``sem_cluster_id`` stays the min reachable key — only the
    is_canonical flag moves.

    Production note: Catalyst rebuilds the corpus lineage for the two
    vector-rejoin branches and the final label join, re-running the scan
    + assign matmul (cheap, map-only).  At 100 TB persist/checkpoint the
    assigned frame before calling this, or write the cluster column as
    the table's partition key (it doubles as the IVF bucket) so every
    branch is a pruned scan.

    ``key_col`` must be castable to long (the connected-components label
    domain — same contract as dedup_clusters); string doc ids need a
    numeric surrogate first.
    """
    from tilekiln_spark.operators.dedup import connected_components

    C = _centroid_matrix(corpus, n_centroids, vec_col, key_col, centroids, seed)
    a1 = make_ivf_assign_udf(C, 1)
    # keys cast to long up front (the connected-components contract, same
    # guard as dedup_clusters): a non-castable key would otherwise null out
    # inside the CC edge list and silently dedup nothing
    base = corpus.select(
        F.col(key_col).cast("long").alias("k"), F.col(vec_col).alias("v")
    )
    assigned = base.withColumn("cluster", a1(F.col("v"))[0])
    # r6: the slim (cluster, key) frame is referenced by the pair build
    # (twice), the size rollup and the final label attach — without a
    # lineage cut each reference re-runs the scan + assign matmul.  A lazy
    # localCheckpoint (16 bytes/row, GC-reclaimed — the two_pass_global_rank
    # pattern) runs the matmul exactly ONCE; vectors re-attach by key from
    # the plain scan, never through the UDF again.
    slim = assigned.select("cluster", "k").localCheckpoint(eager=False)
    sizes = slim.groupBy("cluster").agg(F.count("*").alias("__csz"))
    paired = slim.join(
        sizes.filter(F.col("__csz") <= max_cluster).select("cluster"), "cluster"
    )
    l, r = paired.alias("l"), paired.alias("r")
    pair_keys = (
        l.join(r, "cluster")
        .filter(F.col("l.k") < F.col("r.k"))
        .select(F.col("l.k").alias("key_a"), F.col("r.k").alias("key_b"))
    )
    pairs = (
        pair_keys.join(
            base.select(F.col("k").alias("key_a"), F.col("v").alias("va")), "key_a"
        )
        .join(base.select(F.col("k").alias("key_b"), F.col("v").alias("vb")), "key_b")
        .withColumn("cos", make_pair_cosine_udf()(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("key_a", "key_b")
    )
    labels = connected_components(pairs)
    out = (
        base.select(F.col("k").alias("node"), "v")
        .join(slim.select(F.col("k").alias("node"), "cluster"), "node")
        .join(labels, "node", "left")
    )
    labeled = out.select(
        F.col("node").alias(key_col),
        "v",
        "cluster",
        F.coalesce("component", "node").alias("sem_cluster_id"),
    )
    if canonical == "centroid_far":
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        cmat = F.array(
            *[F.array(*[F.lit(float(x)) for x in row]) for row in Cn]
        )
        # round-6 before ranking: scaled near-copies have centroid cosines
        # equal in exact math but an ulp apart per engine — the rounded
        # tie falls to the key, keeping the exemplar engine-portable
        ccos = F.round(
            cosine_sim(F.col("v"), F.element_at(cmat, F.col("cluster") + 1)), 6
        )
        w = Window.partitionBy("sem_cluster_id").orderBy(
            F.col("__ccos").asc(), F.col(key_col).asc()
        )
        return (
            labeled.withColumn("__ccos", ccos)
            .withColumn("__rn", F.row_number().over(w))
            .select(
                key_col,
                "cluster",
                "sem_cluster_id",
                (F.col("__rn") == 1).cast("int").alias("is_canonical"),
            )
        )
    return labeled.select(
        key_col,
        "cluster",
        "sem_cluster_id",
        (F.col(key_col) == F.col("sem_cluster_id")).cast("int").alias("is_canonical"),
    )
