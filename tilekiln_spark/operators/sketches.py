"""Distributed data sketches: HyperLogLog, KMV, count-min, Bloom.

At 10^12 rows, `count(DISTINCT url)` per host is the query that kills
clusters: the exact form shuffles every distinct key.  Sketches are the
standard answer (HLL for distinct counts, count-min for heavy-hitter
frequencies, Bloom filters for membership/decontamination pre-filters) —
and, unlike Spark's built-in `approx_count_distinct`, the operators here
are **engine-portable and deterministic**: every hash is derived from
``md5(prefix:key)`` (the corpus convention from ``operators/sampling.py``),
and every sketch combine step is an order-independent algebra —

- HLL registers merge with ``max`` (commutative, idempotent),
- count-min counters merge with integer ``sum`` (exact in doubles),
- Bloom bit sets merge with set-union (``collect_set`` / ``DISTINCT``),
- KMV keeps the k smallest hash values (a rank, not a running state),

so the same sketch computed by Spark at any parallelism and by the DuckDB
oracle twin is **bit-identical**, not just statistically close.  The one
float in HLL (``2^-M_j``) is a dyadic rational: with 26-bit rho domains
and m ≤ 256 registers the harmonic sum needs < 40 mantissa bits, so the
distributed double sum is EXACT and aggregation order is immaterial.

Scale shape: every builder is one partial-aggregated ``groupBy`` on
(group, bucket/slot) followed by a tiny per-group rollup — map-side
combine does almost all the work, and the shuffle carries m (64) register
rows per group instead of the distinct-key set.  Nothing collects to the
driver.

Reference parity: the reference (tilekiln) delegates all statistics to
PostgreSQL; these sketches are the Spark-native replacements for the
`count(DISTINCT …)` / top-k rollups a 100 TB corpus cannot run exactly
(cf. /root/reference/tilekiln/storage.py:505-533's exact stats, which
this engine also implements exactly in storage/tilestore.py — sketches
are the at-scale tier above them).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tilekiln_spark.operators.sampling import md5_u32

__all__ = [
    "hll_alpha",
    "hll_distinct",
    "kmv_distinct",
    "cms_counters",
    "cms_point_estimate",
    "bloom_bits",
    "bloom_probe",
]

_U32 = float(1 << 32)


def _bitlen(col: Column) -> Column:
    """Bit length of a non-negative integer column: length of its binary
    representation (0 -> 1, matching DuckDB ``length(bin(x))`` and Spark
    ``length(conv(x, 10, 2))`` — both render 0 as '0')."""
    return F.length(F.conv(col.cast("string"), 10, 2))


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant (Flajolet et al. 2007, Fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    key: Column,
    group_cols: list[str] | None = None,
    p: int = 6,
    out_col: str = "hll_est",
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group.

    hash = md5_u32("hll:" || key)  (32 uniform bits, engine-portable);
    bucket = top ``p`` bits; rho = position of the leftmost 1 in the
    remaining w = 32-p bits (w+1 when they are all zero).  Registers are
    ``max(rho)`` per (group, bucket); the estimate is

        E = alpha_m * m^2 / (V + sum_present 2^-M_j)

    with V = number of never-touched registers contributing 2^0 = 1 each,
    plus the small-range linear-counting correction E <= 2.5m, V > 0 ->
    m * ln(m / V).  Every sum is exact (dyadic rationals + integers), so
    the result is deterministic under any partitioning; the final value is
    rounded to 6 and returned alongside the register-occupancy count.

    Output: group_cols + [out_col, hll_registers_used].
    One (group, bucket) partial-agg shuffle -> one per-group rollup.
    """
    m = 1 << p
    w = 32 - p
    alpha = hll_alpha(m)
    gcols = list(group_cols or [])
    h = md5_u32(F.concat(F.lit("hll:"), key.cast("string")))
    bucket = F.floor(h / float(1 << w)).cast("int")
    rest = (h % (1 << w)).cast("long")
    rho = (
        F.when(rest == 0, F.lit(w + 1))
        .otherwise(F.lit(w) - _bitlen(rest) + 1)
        .cast("int")
    )
    regs = (
        df.select(*gcols, bucket.alias("_bkt"), rho.alias("_rho"))
        .groupBy(*gcols, "_bkt")
        .agg(F.max("_rho").alias("_m"))
    )
    per = regs.groupBy(*gcols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_hsum"),
        F.count("*").alias("_used"),
    )
    v = F.lit(float(m)) - F.col("_used").cast("double")
    raw = F.lit(alpha * m * m) / (v + F.col("_hsum"))
    est = F.when(
        (raw <= 2.5 * m) & (v > 0.0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return per.select(
        *gcols,
        (F.round(est, 6) + F.lit(0.0)).alias(out_col),
        F.col("_used").cast("long").alias("hll_registers_used"),
    )


def kmv_distinct(
    df: DataFrame,
    key: Column,
    group_cols: list[str] | None = None,
    k: int = 16,
    out_col: str = "kmv_est",
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count estimate per group.

    Map each key to u = md5_u32("kmv:" || key) (deduped — the sketch is
    over DISTINCT hash values); if the group holds >= k distinct hashes,
    the estimator is (k-1) / (h_k / 2^32) with h_k the k-th smallest;
    below k the sketch is exact and returns the distinct-hash count
    (Bar-Yossef et al. 2002).  The k-th smallest is a rank over distinct
    integers — no float state, fully order-independent.

    Output: group_cols + [out_col, kmv_exact_below_k (bool)].
    Shuffle shape: dedup on (group, hash), then a literal
    ``row_number() <= k`` rank — Catalyst's WindowGroupLimit prunes each
    map partition to its local bottom-k BEFORE the rank shuffle, so a
    whale group ships k hashes per input partition, never its full
    distinct set (the stratified_quota_sample pattern from sampling.py).
    The below-k exactness test needs the group's distinct count, which is
    a separate partial-agg ``groupBy.count`` on the deduped frame,
    broadcast back (group cardinality is the small dim by construction).
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    h = md5_u32(F.concat(F.lit("kmv:"), key.cast("string")))
    hashes = df.select(*gcols, h.alias("_h")).distinct()
    wrank = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("_h")
    ranked = hashes.select(
        *gcols, "_h", F.row_number().over(wrank).alias("_rn")
    ).where(F.col("_rn") <= k)
    nd = hashes.groupBy(*gcols).agg(F.count("*").alias("_nd"))
    per = ranked.groupBy(*gcols).agg(
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_kth"),
    )
    per = (
        per.join(F.broadcast(nd), gcols) if gcols
        else per.crossJoin(F.broadcast(nd))
    )
    est = F.when(
        F.col("_nd") >= k,
        F.lit(float(k - 1)) * F.lit(_U32) / F.col("_kth").cast("double"),
    ).otherwise(F.col("_nd").cast("double"))
    return per.select(
        *gcols,
        (F.round(est, 4) + F.lit(0.0)).alias(out_col),
        (F.col("_nd") < k).alias("kmv_exact_below_k"),
    )


def cms_counters(
    df: DataFrame,
    key: Column,
    depth: int = 3,
    width: int = 32,
    weight: Column | None = None,
) -> DataFrame:
    """Count-min sketch counter table: ``depth`` independent hash rows x
    ``width`` counters; row d's slot for a key is
    ``md5_u32("cms<d>:" || key) % width``.  Counters are exact integer
    sums (of ``weight``, default 1 per row) — merging partial sketches is
    plain addition, which is why CMS is THE distributed heavy-hitter
    sketch (Cormode & Muthukrishnan 2005).

    Output: [d, slot, c].  One explode(depth) + one partial-agg groupBy —
    the shuffle carries at most depth*width rows total.
    """
    wcol = weight if weight is not None else F.lit(1.0)
    rows = df.select(
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
        key.cast("string").alias("_k"),
        wcol.cast("double").alias("_w"),
    )
    slot = (
        md5_u32(F.concat(F.lit("cms"), F.col("d").cast("string"), F.lit(":"), F.col("_k")))
        % width
    ).cast("int")
    return (
        rows.select("d", slot.alias("slot"), "_w")
        .groupBy("d", "slot")
        .agg(F.sum("_w").alias("c"))
    )


def cms_point_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 32,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-query the CMS: estimate(key) = min over the ``depth`` rows of
    the counter at that key's slot — never an underestimate.  The probe
    side is exploded to its (d, slot) addresses and equi-joined to the
    (broadcastable: depth*width rows) counter table; ties/misses cannot
    occur because every slot the build touched exists and probe keys map
    into the same space."""
    p = probes.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    )
    slot = (
        md5_u32(
            F.concat(
                F.lit("cms"), F.col("d").cast("string"), F.lit(":"),
                F.col(key_col).cast("string"),
            )
        )
        % width
    ).cast("int")
    j = p.select(F.col(key_col), "d", slot.alias("slot")).join(
        F.broadcast(counters), ["d", "slot"], "left"
    )
    return j.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0.0))).alias(out_col)
    )


def bloom_bits(
    df: DataFrame, key: Column, m_bits: int = 256, k_hashes: int = 3
) -> DataFrame:
    """The set of Bloom-filter bit positions lit by ``df``'s keys:
    position_j(key) = md5_u32("b<j>:" || key) % m_bits for j < k_hashes.
    Returned as a one-column [pos] DataFrame (<= m_bits rows — broadcast
    it to probes); set-union merge means any partitioning yields the same
    bit set."""
    rows = df.select(
        F.explode(F.array(*[F.lit(j) for j in range(k_hashes)])).alias("j"),
        key.cast("string").alias("_k"),
    )
    pos = (
        md5_u32(F.concat(F.lit("b"), F.col("j").cast("string"), F.lit(":"), F.col("_k")))
        % m_bits
    ).cast("int")
    return rows.select(pos.alias("pos")).distinct()


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 256,
    k_hashes: int = 3,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership test: a probe key hits iff ALL ``k_hashes`` of its bit
    positions are set.  Explode the probe to its positions, broadcast-join
    the bit set, count matches == k.  No false negatives by construction;
    false-positive rate ~ (1 - e^{-kn/m})^k — the caller sizes m_bits.

    At 100 TB this is the decontamination pre-filter shape: the bit set is
    tiny and broadcast, the probe side is map-only + one per-key count —
    the exact-match join only runs on the survivors."""
    p = probes.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(j) for j in range(k_hashes)])).alias("j"),
    )
    pos = (
        md5_u32(
            F.concat(
                F.lit("b"), F.col("j").cast("string"), F.lit(":"),
                F.col(key_col).cast("string"),
            )
        )
        % m_bits
    ).cast("int")
    j = p.select(F.col(key_col), pos.alias("pos")).join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), ["pos"], "left"
    )
    return j.groupBy(key_col).agg(
        (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == k_hashes).alias(out_col)
    )
