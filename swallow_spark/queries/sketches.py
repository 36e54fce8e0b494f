"""Sketch-based approximate counting: a count-min sketch built and probed
entirely with DataFrame ops (no Python in the hot path).

Complements the existing approximate family (agg_approx_distinct = HLL,
agg_approx_percentile = KLL): the CMS answers point frequency queries
("how often does token X occur?") in O(d*w) memory regardless of
cardinality — the backbone of heavy-hitter detection over a 100 TB token
stream where an exact groupBy(token) shuffle would be dominated by the
long tail.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import POLY_P, poly_hash, rnd, sql_poly_hash_duck, sql_rnd
from ..io import load
from ..registry import register

_D, _W = 4, 1024  # depth (hash functions) x width (buckets per row)

# Row-i hash: ((2i+1)*H + 97i + 13) mod P mod W — pairwise-distinct affine
# maps of the shared portable polynomial hash H (conform.poly_hash). H < P
# ≈ 2^30, multiplier ≤ 7, so everything stays far inside int64 in both
# engines.


def _bucketed(col_df, token_col="token"):
    """Explode each token into its _D (seed, bucket) sketch coordinates."""
    h = poly_hash(token_col)
    coords = F.array(
        *[
            F.struct(
                F.lit(i).alias("seed"),
                (
                    (F.lit(2 * i + 1) * h + F.lit(97 * i + 13)) % F.lit(POLY_P)
                    % F.lit(_W)
                ).alias("bucket"),
            )
            for i in range(_D)
        ]
    )
    return col_df.select(*col_df.columns, F.explode(coords).alias("sb")).select(
        *col_df.columns, F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket")
    )


_CMS_SQL = f"""
WITH tok AS (
  SELECT t AS token
  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
  WHERE t <> ''
),
tc AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
coords AS (
  SELECT token, cnt, s.seed,
         ((2 * s.seed + 1) * {sql_poly_hash_duck('token')} + 97 * s.seed + 13)
           % {POLY_P} % {_W} AS bucket
  FROM tc, unnest(generate_series(CAST(0 AS BIGINT), {_D - 1})) AS s(seed)
),
sketch AS (SELECT seed, bucket, SUM(cnt) AS c FROM coords GROUP BY seed, bucket),
top20 AS (SELECT token, cnt AS exact_cnt FROM tc
          ORDER BY cnt DESC, token LIMIT 20)
SELECT t.token,
       CAST(t.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(MIN(sk.c) AS BIGINT) AS est_cnt
FROM top20 t
JOIN coords pc ON pc.token = t.token
JOIN sketch sk ON sk.seed = pc.seed AND sk.bucket = pc.bucket
GROUP BY 1, 2
ORDER BY exact_cnt DESC, t.token
"""


@register("sketch_count_min", oracle=_CMS_SQL, tier="T2")
def sketch_count_min(spark, sf_dir):
    """Count-min sketch frequency estimation for the corpus's top-20 tokens.

    Build: exact per-token counts (needed for the probe comparison anyway)
    feed d affine bucket hashes per DISTINCT token — each string is hashed
    once, not once per occurrence — then one groupBy (seed, bucket) SUM
    produces at most d*w (= 4096) cells no matter how many distinct tokens
    exist. Probe: the candidate tokens join the (broadcast) sketch on their
    coordinates and take min() across the d rows — the classic CMS
    upper-bound estimate (est >= exact always; collisions only inflate).

    ORACLE-CHECKED: hashes use conform.poly_hash, the portable polynomial
    hash both engines compute identically, so DuckDB rebuilds the entire
    sketch bit-for-bit (promoted from rows-only in round 4; the CMS
    upper-bound property stays asserted in tests/test_sketches.py).

    Scale note: at 100 TB you stream occurrences into the sketch without
    the exact groupBy (that is the point of a CMS); both shapes are one
    map-side-combinable aggregate over the token stream, and the sketch
    itself never exceeds d*w cells, so the probe-side broadcast is O(1).
    """
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token"))
        .filter(F.col("token") != "")
    )
    tc = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    coords = _bucketed(tc)
    sketch = coords.groupBy("seed", "bucket").agg(F.sum("cnt").alias("c"))
    exact_top = (
        tc.withColumnRenamed("cnt", "exact_cnt")
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(20)
    )
    return (
        _bucketed(exact_top)
        .join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("c").alias("est_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
    )


@register("agg_hll_reaggregate", oracle=None, tier="T3")
def agg_hll_reaggregate(spark, sf_dir):
    """Re-aggregable distinct counting: per (event_type, day) HLL sketches
    built once, then UNIONED across days per type — the pattern for rolling
    / incremental distinct-user counts at 100 TB, where re-scanning history
    for every window is impossible but sketch union is a few KB per group.

    Output carries the exact countDistinct alongside the estimate; the
    relative-error bound (lgConfigK=12 → ~1.6% typical) is asserted in
    tests/test_sketches.py. Rows-only: DuckDB has no Datasketches HLL.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return est.join(exact, "event_type").orderBy("event_type")


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
""",
    tier="T2",
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT re-aggregable distinct counting via bitmaps (the exact
    complement of agg_hll_reaggregate): each user_id maps to a (bucket,
    bit-position); bitmap_construct_agg builds one bitmap per (group,
    bucket) and popcounts sum to the exact distinct count. Bitmaps OR-merge
    associatively, so incremental/rollup re-aggregation stays exact — the
    pattern for precise distinct-user ladders where HLL error is
    unacceptable. Oracle: plain COUNT(DISTINCT)."""
    e = load(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    per_bucket = b.groupBy("event_type", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------- bloom filter
_BF_K, _BF_M = 3, 131_072  # hash functions x bit-array width
_BF_SEG = "BUILDING"  # membership set: one segment's customer keys


def _bf_positions_spark(key_expr: str):
    """The k salted bit positions of a key — same affine family as the CMS."""
    h = poly_hash(key_expr)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("seed"),
                (
                    (F.lit(2 * i + 1) * h + F.lit(97 * i + 13)) % F.lit(POLY_P)
                    % F.lit(_BF_M)
                ).alias("pos"),
            )
            for i in range(_BF_K)
        ]
    )


def _bf_positions_sql(key_expr: str) -> str:
    h = sql_poly_hash_duck(key_expr)
    return (
        "["
        + ", ".join(
            f"{{'seed': {i}, 'pos': ((2 * {i} + 1) * {h} + 97 * {i} + 13)"
            f" % {POLY_P} % {_BF_M}}}"
            for i in range(_BF_K)
        )
        + "]"
    )


_BF_SQL = f"""
WITH bits AS (
  SELECT DISTINCT p.seed, p.pos
  FROM customer, unnest({_bf_positions_sql("CAST(c_custkey AS VARCHAR)")}) AS t(p)
  WHERE c_mktsegment = '{_BF_SEG}'
),
probe AS (
  SELECT c_custkey, c_mktsegment, p.seed, p.pos
  FROM customer, unnest({_bf_positions_sql("CAST(c_custkey AS VARCHAR)")}) AS t(p)
),
hits AS (
  SELECT pr.c_custkey, pr.c_mktsegment, COUNT(*) AS k_hit
  FROM probe pr JOIN bits b ON pr.seed = b.seed AND pr.pos = b.pos
  GROUP BY pr.c_custkey, pr.c_mktsegment
),
verdicts AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CASE WHEN h.k_hit = {_BF_K} THEN 1 ELSE 0 END AS positive
  FROM customer c LEFT JOIN hits h ON c.c_custkey = h.c_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(positive) AS BIGINT) AS n_bloom_positive,
       (FLOOR(CASE WHEN c_mktsegment = '{_BF_SEG}' THEN 0.0
              ELSE CAST(SUM(positive) AS DOUBLE) / COUNT(*) END * 1000000 + 0.5)
        / 1000000) AS fp_rate
FROM verdicts
GROUP BY c_mktsegment
"""


@register("sketch_bloom_filter", oracle=_BF_SQL, tier="T2")
def sketch_bloom_filter(spark, sf_dir):
    """Portable Bloom filter (k=3, m=131072): build the bit set from one
    segment's customer keys, probe EVERY customer, report per-segment
    bloom-positive counts and the measured false-positive rate (0 by
    definition for the member segment — no false negatives, a property
    the oracle proves since its n_bloom_positive equals the segment
    count). The join-prefilter primitive: ship the small side's bloom to
    the 100 TB side and drop non-candidates before the shuffle.

    Determinism: bit positions come from conform.poly_hash's affine
    family (same ints in both engines), so the filter — collisions, false
    positives and all — is bit-identical; the one rate division half-up
    rounds to 6dp.

    Scale note: the bit set is ≤ k·|members| distinct (seed, pos) rows —
    broadcast territory (the DataFrame analog of shipping the m-bit
    array); the probe explodes k rows per key, hash-joins the broadcast
    bits, and reduces per key — map-side work, one |keys|-row shuffle.
    """
    c = load(spark, sf_dir, "customer")
    key = "CAST(c_custkey AS STRING)"
    bits = (
        c.filter(F.col("c_mktsegment") == _BF_SEG)
        .select(F.explode(_bf_positions_spark(key)).alias("p"))
        .select(F.col("p.seed").alias("seed"), F.col("p.pos").alias("pos"))
        .distinct()
    )
    probe = c.select(
        "c_custkey", "c_mktsegment", F.explode(_bf_positions_spark(key)).alias("p")
    ).select("c_custkey", "c_mktsegment", F.col("p.seed").alias("seed"), F.col("p.pos").alias("pos"))
    hits = (
        probe.join(F.broadcast(bits), ["seed", "pos"])
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("k_hit"))
    )
    verdicts = (
        c.select("c_custkey", "c_mktsegment")
        .join(hits.select("c_custkey", "k_hit"), "c_custkey", "left")
        .select(
            "c_mktsegment",
            F.when(F.col("k_hit") == _BF_K, 1).otherwise(0).alias("positive"),
        )
    )
    return verdicts.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("positive").cast("long").alias("n_bloom_positive"),
        (
            F.floor(
                F.when(F.col("c_mktsegment") == _BF_SEG, F.lit(0.0))
                .otherwise(F.sum("positive").cast("double") / F.count(F.lit(1)))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("fp_rate"),
    )


_LOG2H_SQL = """
WITH b AS (
  SELECT length(bin(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))) - 1
           AS bucket
  FROM orders WHERE o_totalprice IS NOT NULL
),
h AS (
  SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY bucket
),
c AS (
  SELECT bucket, cnt,
         CAST(SUM(cnt) OVER (ORDER BY bucket
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM h
)
SELECT bucket, cnt, cum,
       CASE WHEN cum - cnt < (n + 1) // 2 AND cum >= (n + 1) // 2
            THEN TRUE ELSE FALSE END AS holds_median
FROM c
"""


@register("sketch_log2_histogram", oracle=_LOG2H_SQL, tier="T2")
def sketch_log2_histogram(spark, sf_dir):
    """Mergeable log₂ price histogram — the DDSketch/HdrHistogram shape
    with γ = 2: bucket = floor(log₂ cents), guaranteed ≤ 2× relative
    error on any quantile read, fully mergeable across shards (bucket
    counts just add — the property approx_percentile's digest shares but
    exact percentiles lack). holds_median marks the bucket containing the
    exact median rank (n+1)//2, read straight off the cumulative counts.

    Determinism: the bucket is the INTEGER form length(bin(cents)) − 1 —
    never floor(ln/ln2), whose libm last-ulp differences flip exact
    powers of two between engines (the §conform hazard); counts/cumsums
    are exact. Scale note: map-side bucketing to ≤ 64 buckets, one tiny
    aggregate + windowed cumsum over ≤ 64 rows — the cheapest quantile
    sketch that exists, and the merge story is a bucket-wise SUM.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    b = o.select(
        (
            F.length(F.bin(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")))
            - 1
        )
        .cast("long")
        .alias("bucket")
    )
    h = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c = h.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(w_cum).cast("long").alias("cum"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    med = ((F.col("n") + 1) / 2).cast("long")
    return c.select(
        "bucket",
        "cnt",
        "cum",
        ((F.col("cum") - F.col("cnt") < med) & (F.col("cum") >= med)).alias(
            "holds_median"
        ),
    )


# ---- portable HyperLogLog: m = 64 registers, integer multiplicative hashes,
# register sum kept as an exact scaled integer so the only float operation is
# one final division — which is why an APPROXIMATE-counting sketch can be
# ORACLE-CHECKED (unlike agg_approx_distinct, whose JVM HLL++ internals are
# not reproducible in DuckDB).

_HLL_M = 64
_HLL_WBITS = 30
# alpha_64 * m^2 * 2^31 (the register-sum scale), folded to one literal so
# both engines evaluate a single identical IEEE divide
_HLL_NUM = 0.709 * _HLL_M * _HLL_M * (1 << 31)


@register(
    "sketch_hll_portable",
    oracle=f"""
WITH hx AS (
  SELECT o_orderpriority AS grp, o_custkey AS k,
         list_reduce(list_transform(generate_series(1, 13),
           i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(o_custkey AS VARCHAR)), CAST(i AS INT), 1)) - 1
                AS BIGINT)),
           (acc, d) -> acc * 16 + d) AS h
  FROM orders
),
h AS (
  SELECT grp, k, h % {_HLL_M} AS bucket,
         (h // {_HLL_M}) % {1 << _HLL_WBITS} AS w
  FROM hx
),
reg AS (
  SELECT grp, bucket,
         MAX(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                  ELSE {_HLL_WBITS} - (length(bin(w)) - 1) END) AS r
  FROM h GROUP BY grp, bucket
),
z AS (
  SELECT grp,
         CAST(SUM(CAST(1 AS BIGINT) << (31 - r)) AS BIGINT)
           + ({_HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 31) AS z_scaled,
         {_HLL_M} - COUNT(*) AS n_empty
  FROM reg GROUP BY grp
),
ex AS (SELECT o_orderpriority AS grp, COUNT(DISTINCT o_custkey) AS exact_distinct
       FROM orders GROUP BY grp)
SELECT z.grp,
       CAST(z.z_scaled AS BIGINT) AS z_scaled,
       CAST(z.n_empty AS BIGINT) AS n_empty,
       {sql_rnd(f'{_HLL_NUM!r} / CAST(z.z_scaled AS DOUBLE)', 4)} AS est_distinct,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
FROM z JOIN ex USING (grp)
""",
    tier="T2",
)
def sketch_hll_portable(spark, sf_dir):
    """Portable HyperLogLog distinct-count of customers per order priority:
    m = 64 registers, bucket/width bits from the low 52 bits of md5 (the
    one real mixer both engines share — multiplicative integer hashes were
    tried first and their lattice structure biased the estimate 60% low;
    Spark parses the hex via conv(), DuckDB via a base-16 character fold),
    register value rho = leading-zero rank of the 30-bit
    word (the integer length(bin(w))-1 floor-log2 — never libm, per the
    power-of-two boundary hazard), and the harmonic-mean denominator kept
    as Σ 2^(31-r) — an EXACT int64 (≤ 64·2^31), so summation order cannot
    perturb it. The only float op is the final alpha·m²·2^31 / Z divide,
    a single identical IEEE operation in both engines; the exact distinct
    count rides along for self-evaluation (observed error ~2-12% at m=64).

    Mergeability — the property that matters at 100 TB — falls out of
    MAX(rho) per (group, bucket): register tables from any partitioning
    combine by element-wise MAX, which is exactly how the two-phase
    HashAggregate executes this plan. Empty buckets enter the sum via the
    closed form (m − present)·2^31 instead of a scaffold join.

    Scale note: one partial+final aggregate keyed (grp, bucket) — 64 rows
    per group after combine regardless of input size — then a 5-row join
    with the exact twin. The exact COUNT(DISTINCT) twin is the expensive
    side here; in production you would drop it and keep the sketch.
    """
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), F.col("o_custkey").alias("k")
    )
    hv = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    h = o.select(
        "grp",
        "k",
        (hv % _HLL_M).alias("bucket"),
        ((hv / _HLL_M).cast("long") % (1 << _HLL_WBITS)).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS) - (F.length(F.bin("w")) - 1)
    )
    reg = h.select("grp", "bucket", rho.alias("rho")).groupBy("grp", "bucket").agg(
        F.max("rho").alias("r")
    )
    z = reg.groupBy("grp").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(31 - r AS INT))"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(1 << 31).cast("long")
        ).cast("long").alias("z_scaled"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("long").alias("n_empty"),
    )
    ex = o.groupBy("grp").agg(F.count_distinct("k").alias("exact_distinct"))
    return z.join(ex, "grp").select(
        "grp",
        "z_scaled",
        "n_empty",
        rnd(F.lit(_HLL_NUM) / F.col("z_scaled").cast("double"), 4).alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


# --------------------------------------------------- KMV (bottom-k) sketch
_KMV_K = 32
# (k-1) * 2^52 — the KMV numerator; 31·2^52 has a 5-bit mantissa, so the
# int64 literal is exactly representable as a DOUBLE in both engines
_KMV_NUM = (_KMV_K - 1) * (1 << 52)


@register(
    "sketch_kmv_distinct",
    oracle=f"""
WITH hx AS (
  SELECT event_type AS grp,
         list_reduce(list_transform(generate_series(1, 13),
           i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1
                AS BIGINT)),
           (acc, d) -> acc * 16 + d) AS h
  FROM events
),
dh AS (SELECT DISTINCT grp, h FROM hx),
rk AS (SELECT grp, h,
              row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       FROM dh),
bk AS (SELECT grp, MAX(h) AS kth_hash, COUNT(*) AS k_used
       FROM rk WHERE rn <= {_KMV_K} GROUP BY grp),
ex AS (SELECT event_type AS grp,
              COUNT(DISTINCT user_id) AS exact_distinct
       FROM events GROUP BY event_type)
SELECT b.grp,
       CAST(b.kth_hash AS BIGINT) AS kth_hash,
       CAST(b.k_used AS BIGINT) AS k_used,
       {sql_rnd(f'CASE WHEN b.k_used < {_KMV_K} THEN CAST(b.k_used AS DOUBLE) ELSE CAST({_KMV_NUM} AS DOUBLE) / CAST(b.kth_hash AS DOUBLE) END', 4)}
         AS est_distinct,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
FROM bk b JOIN ex USING (grp)
""",
    tier="T2",
)
def sketch_kmv_distinct(spark, sf_dir):
    """Portable KMV (bottom-k / k-minimum-values) distinct-count sketch of
    users per event type, k = 32: hash each distinct user to the low 52
    bits of md5 (the HLL key's shared mixer — Spark conv(), DuckDB base-16
    character fold), keep the k SMALLEST distinct hash values, and read
    the estimate off the kth order statistic: D̂ = (k−1)·2⁵²/h₍ₖ₎ — the
    uniform-order-statistics estimator. Unlike HLL this sketch also
    supports set operations (union = merge-and-retrim; intersection via
    the overlap of bottom-k sets), which is why engines ship both.

    ORACLE-CHECKED despite being approximate: every kept hash is a
    deterministic integer, the kth value is an exact MAX over a row_number
    prefix, and the single estimate divide is one identical IEEE operation
    (numerator 31·2⁵² carries a 5-bit mantissa — double-exact in both
    engines). Groups smaller than k degrade to the exact count, the KMV
    convention. The exact COUNT(DISTINCT) twin rides along (observed
    error ~10-25% at k=32).

    Scale note: the distinct-hash dedup and the per-group bottom-k are one
    shuffle each on grp; at 100 TB the window becomes a partial bottom-k
    per partition merged by re-trimming to k (the sketch is a mergeable
    32-long state, which is the point) — the window spelling here keeps
    the oracle expressible.
    """
    e = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"), F.col("user_id").alias("k")
    )
    hv = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    dh = e.select("grp", hv.alias("h")).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    bk = (
        dh.select("grp", "h", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("grp")
        .agg(
            F.max("h").alias("kth_hash"),
            F.count(F.lit(1)).cast("long").alias("k_used"),
        )
    )
    ex = e.groupBy("grp").agg(F.count_distinct("k").alias("exact_distinct"))
    est = F.when(
        F.col("k_used") < _KMV_K, F.col("k_used").cast("double")
    ).otherwise(F.lit(_KMV_NUM).cast("double") / F.col("kth_hash").cast("double"))
    return bk.join(ex, "grp").select(
        "grp",
        "kth_hash",
        "k_used",
        rnd(est, 4).alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


# --------------------------------------------------- linear counting
_LC_M = 1024


@register(
    "sketch_linear_counting",
    oracle=f"""
WITH hx AS (
  SELECT event_type AS grp,
         list_reduce(list_transform(generate_series(1, 13),
           i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1
                AS BIGINT)),
           (acc, d) -> acc * 16 + d) % {_LC_M} AS bucket
  FROM events WHERE user_id IS NOT NULL
),
used AS (
  SELECT grp, CAST(COUNT(DISTINCT bucket) AS BIGINT) AS used
  FROM hx GROUP BY grp
),
ex AS (
  SELECT event_type AS grp,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events WHERE user_id IS NOT NULL GROUP BY event_type
)
SELECT u.grp, u.used,
       CASE WHEN u.used >= {_LC_M} THEN NULL
            ELSE CAST(FLOOR({_LC_M} * ln(CAST({_LC_M} AS DOUBLE)
                                         / ({_LC_M} - u.used)) * 1000)
                      AS BIGINT) END AS est_milli,
       ex.exact_distinct
FROM used u JOIN ex USING (grp)
ORDER BY grp
""",
    tier="T2",
)
def sketch_linear_counting(spark, sf_dir):
    """Linear (probabilistic) counting of distinct users per event type,
    m = 1024 buckets: hash each user into a bitmap bucket with the sketch
    family's shared md5-52-bit mixer, count occupied buckets, and read the
    estimate off n̂ = m·ln(m/empty) — the Whang-Vander-Zanden-Taylor
    estimator that beats HLL below ~m distinct values and is the standard
    small-range companion sketch ([[sketch_hll_portable]] covers the large
    range, [[sketch_kmv_distinct]] the mergeable-set-ops case).

    ORACLE-CHECKED despite being approximate: the occupied-bucket count is
    an exact integer, m/(m−used) is ONE identical IEEE divide (m a power
    of two), ln is the single library call both engines evaluate on an
    identical double (the quantize-then-floor recipe), and saturation
    (used = m) degrades to NULL on both sides. The exact COUNT(DISTINCT)
    twin rides along.

    Scale note: the sketch state is a 1024-bit bitmap per group —
    partial-aggregable with bit-OR merges; the spelling here (distinct
    buckets) keeps the oracle expressible and shuffles at most m rows per
    group.
    """
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        % _LC_M
    )
    used = (
        e.select(F.col("event_type").alias("grp"), bucket.alias("bucket"))
        .groupBy("grp")
        .agg(F.count_distinct("bucket").cast("long").alias("used"))
    )
    ex = e.groupBy(F.col("event_type").alias("grp")).agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        used.join(ex, "grp")
        .select(
            "grp",
            "used",
            F.expr(
                f"""CASE WHEN used >= {_LC_M} THEN NULL
                     ELSE CAST(FLOOR({_LC_M} * ln(CAST({_LC_M} AS DOUBLE)
                                                  / ({_LC_M} - used)) * 1000)
                               AS BIGINT) END"""
            ).alias("est_milli"),
            "exact_distinct",
        )
        .orderBy("grp")
    )


# ------------------------------------------------ KMV shard-merge (union)
# The mergeability proof for the KMV sketch: per-shard bottom-k states,
# merged by union + re-trim, must equal the direct global bottom-k — the
# exact property that makes the sketch a map-side-combinable aggregate at
# 100 TB. Shards come from a portable md5 nibble of the key, so both
# engines shard identically.

_KMV_MERGE_SQL = f"""
WITH hx AS (
  SELECT event_type AS grp,
         CAST(strpos('0123456789abcdef',
              substr(md5(CAST(user_id AS VARCHAR)), 14, 1)) - 1 AS BIGINT) % 4
           AS shard,
         list_reduce(list_transform(generate_series(1, 13),
           i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1
                AS BIGINT)),
           (acc, d) -> acc * 16 + d) AS h
  FROM events
),
dhs AS (SELECT DISTINCT grp, shard, h FROM hx),
shard_bk AS (
  SELECT grp, shard, h
  FROM (SELECT grp, shard, h,
               row_number() OVER (PARTITION BY grp, shard ORDER BY h) AS rn
        FROM dhs)
  WHERE rn <= {_KMV_K}
),
merged AS (
  SELECT grp, h
  FROM (SELECT grp, h,
               row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM (SELECT DISTINCT grp, h FROM shard_bk))
  WHERE rn <= {_KMV_K}
),
merged_k AS (SELECT grp, MAX(h) AS kth_merged, COUNT(*) AS k_used
             FROM merged GROUP BY grp),
direct AS (
  SELECT grp, MAX(h) AS kth_direct
  FROM (SELECT grp, h,
               row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM (SELECT DISTINCT grp, h FROM dhs))
  WHERE rn <= {_KMV_K}
  GROUP BY grp
)
SELECT m.grp,
       CAST(m.kth_merged AS BIGINT) AS kth_merged,
       CAST(d.kth_direct AS BIGINT) AS kth_direct,
       CAST(m.k_used AS BIGINT) AS k_used,
       CAST(CASE WHEN m.kth_merged = d.kth_direct THEN 1 ELSE 0 END AS BIGINT)
         AS merge_exact,
       {sql_rnd(f'CASE WHEN m.k_used < {_KMV_K} THEN CAST(m.k_used AS DOUBLE) ELSE CAST({_KMV_NUM} AS DOUBLE) / CAST(m.kth_merged AS DOUBLE) END', 4)}
         AS est_distinct
FROM merged_k m JOIN direct d USING (grp)
"""


@register("sketch_kmv_merge", oracle=_KMV_MERGE_SQL, tier="T2")
def sketch_kmv_merge(spark, sf_dir):
    """KMV sketch MERGE: per-shard bottom-32 states (4 portable md5-nibble
    shards per group) unioned and re-trimmed, proven equal to the direct
    global bottom-32 (`merge_exact` is structurally 1 — every global
    bottom-k hash is necessarily in its own shard's bottom-k). This is the
    property that makes [[sketch_kmv_distinct]] a map-side-combinable
    aggregate at 100 TB: partitions keep 32 longs each, the combiner is
    union+trim, and the estimate is read off the merged state.

    Determinism: hashes, shards, order statistics and the equality flag
    are exact integers; the one estimate divide is the shared 5-bit-
    mantissa numerator over an exact int64 ([[sketch_kmv_distinct]]'s
    recipe).

    Scale note: the shard windows are (grp, shard)-partitioned (parallel
    across shards), the merge window runs over ≤ 4k rows per group by
    construction, and the direct window here exists only as the oracle's
    ground truth — a production pipeline keeps the per-shard states.
    """
    e = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"), F.col("user_id").alias("k")
    )
    md5s = F.md5(F.col("k").cast("string"))
    hv = F.conv(F.substring(md5s, 1, 13), 16, 10).cast("long")
    shard = (F.conv(F.substring(md5s, 14, 1), 16, 10).cast("long") % 4).alias(
        "shard"
    )
    dhs = e.select("grp", shard, hv.alias("h")).distinct()
    ws = Window.partitionBy("grp", "shard").orderBy("h")
    shard_bk = (
        dhs.select("grp", "shard", "h", F.row_number().over(ws).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
        .select("grp", "h")
    )
    wg = Window.partitionBy("grp").orderBy("h")
    merged = (
        shard_bk.distinct()
        .select("grp", "h", F.row_number().over(wg).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
    )
    merged_k = merged.groupBy("grp").agg(
        F.max("h").alias("kth_merged"), F.count(F.lit(1)).alias("k_used")
    )
    direct = (
        dhs.select("grp", "h")
        .distinct()
        .select("grp", "h", F.row_number().over(wg).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("grp")
        .agg(F.max("h").alias("kth_direct"))
    )
    est = (
        f"CASE WHEN k_used < {_KMV_K} THEN CAST(k_used AS DOUBLE) "
        f"ELSE CAST({_KMV_NUM} AS DOUBLE) / CAST(kth_merged AS DOUBLE) END"
    )
    return merged_k.join(direct, "grp").select(
        "grp",
        F.col("kth_merged").cast("long").alias("kth_merged"),
        F.col("kth_direct").cast("long").alias("kth_direct"),
        F.col("k_used").cast("long").alias("k_used"),
        F.expr(
            "CAST(CASE WHEN kth_merged = kth_direct THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("merge_exact"),
        rnd(F.expr(est), 4).alias("est_distinct"),
    )


# --------------------------------------- KMV set-operation estimates
# Jaccard / intersection from two KMV sketches: take the k smallest hashes
# of the UNION of the two bottom-k states; the fraction of those that live
# in BOTH sketches estimates Jaccard, and intersection ≈ J · D̂(union).
# Pure order statistics — deterministic, oracle-checkable.

_KMV_INT_SQL = f"""
WITH hx AS (
  SELECT event_type AS grp,
         list_reduce(list_transform(generate_series(1, 13),
           i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1
                AS BIGINT)),
           (acc, d) -> acc * 16 + d) AS h
  FROM events WHERE event_type IN ('view', 'purchase')
),
dh AS (SELECT DISTINCT grp, h FROM hx),
bk AS (
  SELECT grp, h
  FROM (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM dh)
  WHERE rn <= {_KMV_K}
),
uni AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS sides
  FROM bk GROUP BY h
),
topu AS (
  SELECT h, sides
  FROM (SELECT h, sides, row_number() OVER (ORDER BY h) AS rn FROM uni)
  WHERE rn <= {_KMV_K}
),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(MAX(h) AS BIGINT) AS kth_hash
  FROM topu
),
ex AS (
  SELECT CAST(COUNT(DISTINCT CASE WHEN v > 0 AND p > 0 THEN user_id END)
              AS BIGINT) AS exact_intersection
  FROM (SELECT user_id,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id)
)
SELECT st.k_used, st.n_both, st.kth_hash,
       CAST(st.n_both * 1000000 // st.k_used AS BIGINT) AS jaccard_micro,
       {sql_rnd(f'(CAST(st.n_both AS DOUBLE) / st.k_used) * (CASE WHEN st.k_used < {_KMV_K} THEN CAST(st.k_used AS DOUBLE) ELSE CAST({_KMV_NUM} AS DOUBLE) / CAST(st.kth_hash AS DOUBLE) END)', 4)}
         AS est_intersection,
       ex.exact_intersection
FROM st CROSS JOIN ex
"""


@register("sketch_kmv_intersect", oracle=_KMV_INT_SQL, tier="T2")
def sketch_kmv_intersect(spark, sf_dir):
    """KMV set-operation estimate: audience overlap between 'view' and
    'purchase' users from their bottom-32 sketches alone — Jaccard =
    fraction of the union-sketch's k smallest hashes present in BOTH
    sketches, intersection ≈ J · D̂(union). With [[sketch_kmv_merge]]
    (union) this completes the set algebra that makes KMV preferable to
    HLL when audiences must be intersected at 100 TB without rescanning.

    Determinism: pure order statistics on exact int64 hashes (shared md5
    mixer); Jaccard is one non-negative micro `//`; the intersection
    estimate multiplies two deterministic IEEE doubles (count ratio ×
    the 5-bit-mantissa-numerator estimator) and rounds once. The exact
    intersection rides along (one conditional COUNT(DISTINCT)).

    Scale note: production keeps only the two 32-long states — this key's
    full-scan legs exist to ground-truth the estimate; the sketch-side
    math is O(k log k) on the driver-equivalent 1-row path (here spelled
    as bounded windows so the oracle stays expressible).
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    dh = e.select(F.col("event_type").alias("grp"), hv.alias("h")).distinct()
    wg = Window.partitionBy("grp").orderBy("h")
    bk = (
        dh.select("grp", "h", F.row_number().over(wg).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
        .select("grp", "h")
    )
    uni = bk.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("sides"))
    wu = Window.orderBy("h")
    topu = (
        uni.select("h", "sides", F.row_number().over(wu).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
    )
    st = topu.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum(F.when(F.col("sides") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_both"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    ex = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "p"
            ),
        )
        .agg(
            F.count_distinct(
                F.when((F.col("v") > 0) & (F.col("p") > 0), F.col("user_id"))
            )
            .cast("long")
            .alias("exact_intersection")
        )
    )
    est = (
        f"(CAST(n_both AS DOUBLE) / k_used) * "
        f"(CASE WHEN k_used < {_KMV_K} THEN CAST(k_used AS DOUBLE) "
        f"ELSE CAST({_KMV_NUM} AS DOUBLE) / CAST(kth_hash AS DOUBLE) END)"
    )
    return st.crossJoin(F.broadcast(ex)).select(
        "k_used",
        "n_both",
        "kth_hash",
        F.expr("CAST(n_both * 1000000 DIV k_used AS BIGINT)").alias(
            "jaccard_micro"
        ),
        rnd(F.expr(est), 4).alias("est_intersection"),
        "exact_intersection",
    )
