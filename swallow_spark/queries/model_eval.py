"""Model-evaluation operators: ranking-quality (AUC-ROC), decile lift
tables, and multiple-testing control (Benjamini-Hochberg FDR) — the
offline-eval battery a training pipeline runs on every scored dataset.

The "model" under evaluation is a deterministic fixture stand-in (score =
order price, label = order status), so the operators exercise the exact
rank/threshold machinery without needing a trained artifact. All three are
exact-integer to the hash: ranks come from cumulative counts over
distinct-value tables (the stats_spearman recipe), rates/lifts are integer
cross-products with one truncating division, and the FDR p-values are exact
rationals from a deterministic md5 sign-flip permutation scheme.

Scale notes: AUC's rank window runs over the per-segment DISTINCT-score
table (bounded by |distinct prices|, not rows); the lift table's ntile sort
is partitioned by segment; the permutation replicates are generated in-flight
by a sequence-explode and collapse into a (group, replicate) partial+final
aggregate — the standard map-side-combine bootstrap shape. Int64 headroom is
documented per key; beyond ~4M rows per group carry the rank sums as
DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import cents
from ..io import load
from ..ops.parallel import fan_out
from ..registry import register

# ------------------------------------------------------------------ AUC-ROC

_AUC_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS s,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL
),
g AS (
  SELECT segment, s,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(pos) AS BIGINT) AS pc,
         SUM(COUNT(*)) OVER (PARTITION BY segment ORDER BY s) AS cum
  FROM base GROUP BY segment, s
),
a AS (
  SELECT segment,
         CAST(SUM(pc) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - pc) AS BIGINT) AS n_neg,
         CAST(SUM(pc * (2 * cum - cnt + 1)) AS BIGINT) AS sr2
  FROM g GROUP BY segment
)
SELECT segment, n_pos, n_neg,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            ELSE ((sr2 - n_pos * (n_pos + 1)) * 1000000) // (2 * n_pos * n_neg)
       END AS auc_micro
FROM a
ORDER BY segment
"""


@register("stats_auc_roc", oracle=_AUC_SQL, tier="T2")
def stats_auc_roc(spark, sf_dir):
    """Per-segment AUC-ROC of score = order price against label =
    (orderstatus = 'F') — the Mann-Whitney rank formulation
    AUC = (Σ ranks(pos) − n₁(n₁+1)/2) / (n₁n₀), ties averaged.

    Determinism: ranks are exact integer cumulative counts over the
    per-segment DISTINCT-score table; a tie block's average rank is carried
    DOUBLED (2·cum − cnt + 1, always integer — the stats_spearman recipe),
    so AUC's numerator 2·Σranks − n₁(n₁+1) is an exact int64 and the single
    division is a truncating integer DIV of a non-negative numerator
    (identical in Spark DIV and DuckDB //; the negative-operand divergence
    pinned in text_perplexity_buckets cannot arise). Micro-units (1e-6).
    Int64 headroom: numerator·1e6 < 2^63 ⟺ n₁n₀ < 4.6e12 ⟺ ~4M rows per
    segment; beyond, carry sr2 as DECIMAL(38,0).
    Scale: rank window over the distinct-value table (bounded by |distinct
    prices| per segment, not row count); customer dim broadcast; everything
    else is partial+final aggregation of the fact stream.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    c = load(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        cents(F.col("o_totalprice")).cast("long").alias("s"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    g = (
        base.groupBy("segment", "s")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pc"))
        .withColumn(
            "cum",
            F.sum("cnt").over(Window.partitionBy("segment").orderBy("s")),
        )
    )
    a = g.groupBy("segment").agg(
        F.sum("pc").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pc")).alias("n_neg"),
        F.sum(F.col("pc") * (2 * F.col("cum") - F.col("cnt") + 1)).alias("sr2"),
    )
    return a.select(
        "segment",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") == 0) | (F.col("n_neg") == 0), F.lit(None).cast("long")
        )
        .otherwise(
            F.expr("((sr2 - n_pos * (n_pos + 1)) * 1000000) DIV (2 * n_pos * n_neg)")
        )
        .alias("auc_micro"),
    ).orderBy("segment")


# -------------------------------------------------------------- lift deciles

_LIFT_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS s,
         o.o_orderkey AS k,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL
),
d AS (
  SELECT segment, pos,
         ntile(10) OVER (PARTITION BY segment ORDER BY s DESC, k) AS decile
  FROM base
),
g AS (
  SELECT segment, decile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM d GROUP BY segment, decile
),
cum AS (
  SELECT segment, decile, n, n_pos,
         CAST(SUM(n) OVER (PARTITION BY segment ORDER BY decile) AS BIGINT) AS cum_n,
         CAST(SUM(n_pos) OVER (PARTITION BY segment ORDER BY decile) AS BIGINT) AS cum_pos,
         CAST(SUM(n) OVER (PARTITION BY segment) AS BIGINT) AS tot_n,
         CAST(SUM(n_pos) OVER (PARTITION BY segment) AS BIGINT) AS tot_pos
  FROM g
)
SELECT segment, decile, n, n_pos,
       (n_pos * 1000000) // n AS pos_rate_micro,
       CASE WHEN tot_pos = 0 THEN NULL
            ELSE (cum_pos * tot_n * 1000000) // (cum_n * tot_pos)
       END AS cum_lift_micro
FROM cum
ORDER BY segment, decile
"""


@register("stats_lift_deciles", oracle=_LIFT_SQL, tier="T2")
def stats_lift_deciles(spark, sf_dir):
    """Per-segment decile lift table: rank orders by score (price) within
    segment, cut into 10 equal bins, report each bin's positive rate and
    the cumulative lift (cum_pos/cum_n) / (tot_pos/tot_n) — the campaign-
    targeting / ranking-model diagnostic.

    Determinism: the ntile order is a TOTAL order (score desc, orderkey),
    so bin assignment is unique; both engines split remainders into the
    leading bins. Rates and lifts are integer cross-products with one
    truncating division of a non-negative numerator (Spark DIV ≡ DuckDB //
    here). Int64: cum_pos·tot_n·1e6 at 30k rows/segment ≈ 1e16 — safe to
    ~1M rows per segment, then switch to DECIMAL(38,0) cross-products.
    Scale: the only sort is ntile's, partitioned by segment (a skewed
    segment re-shards with the salted-ntile recipe: pre-aggregate to
    distinct scores, assign bins by cumulative count — the AUC trick);
    the lift windows run over the 10-row-per-segment bin table.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    c = load(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        cents(F.col("o_totalprice")).cast("long").alias("s"),
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    d = base.select(
        "segment",
        "pos",
        F.ntile(10)
        .over(Window.partitionBy("segment").orderBy(F.col("s").desc(), F.col("k")))
        .alias("decile"),
    )
    g = d.groupBy("segment", "decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos")
    )
    wseg = Window.partitionBy("segment")
    wcum = wseg.orderBy("decile")
    cum = g.select(
        "segment",
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(wcum).alias("cum_n"),
        F.sum("n_pos").over(wcum).alias("cum_pos"),
        F.sum("n").over(wseg).alias("tot_n"),
        F.sum("n_pos").over(wseg).alias("tot_pos"),
    )
    return cum.select(
        "segment",
        "decile",
        "n",
        "n_pos",
        F.expr("(n_pos * 1000000) DIV n").alias("pos_rate_micro"),
        F.when(F.col("tot_pos") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(cum_pos * tot_n * 1000000) DIV (cum_n * tot_pos)"))
        .alias("cum_lift_micro"),
    ).orderBy("segment", "decile")


# ------------------------------------------------------- Benjamini-Hochberg

_B_REPS = 199  # permutation replicates; p-values are exact (1+hits)/200

_BH_SQL = f"""
WITH mu AS (
  SELECT (SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) * 1000)
         // COUNT(*) AS mu_milli
  FROM orders
),
base AS (
  SELECT o.o_custkey, o.o_orderkey,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) * 1000
           - mu.mu_milli AS r
  FROM orders o, mu
),
tagged AS (
  SELECT c.c_nationkey AS nationkey, b.o_orderkey, b.r
  FROM base b JOIN customer c ON c.c_custkey = b.o_custkey
),
obs AS (
  SELECT nationkey, ABS(SUM(r)) AS s_obs FROM tagged GROUP BY nationkey
),
hashed AS (
  SELECT nationkey, r,
         list_transform([md5(CAST(o_orderkey AS VARCHAR) || ':0'),
                         md5(CAST(o_orderkey AS VARCHAR) || ':1')],
           h -> [list_reduce(list_transform(generate_series(1, 13),
                   i -> CAST(strpos('0123456789abcdef',
                          substr(h, CAST(i AS INT), 1)) - 1 AS BIGINT)),
                 (acc, d) -> acc * 16 + d),
                 list_reduce(list_transform(generate_series(14, 26),
                   i -> CAST(strpos('0123456789abcdef',
                          substr(h, CAST(i AS INT), 1)) - 1 AS BIGINT)),
                 (acc, d) -> acc * 16 + d)]) AS hw
  FROM tagged
),
reps AS (
  SELECT t.nationkey, g.b,
         ABS(SUM(CASE WHEN
               ((t.hw[(g.b - 1) // 52 // 2 + 1][((g.b - 1) // 52) % 2 + 1]
                 >> CAST((g.b - 1) % 52 AS INT)) & 1) = 0
             THEN t.r ELSE -t.r END)) AS s_b
  FROM hashed t CROSS JOIN (SELECT unnest(generate_series(1, {_B_REPS})) AS b) g
  GROUP BY t.nationkey, g.b
),
pv AS (
  SELECT o.nationkey,
         1 + CAST(SUM(CASE WHEN r.s_b >= o.s_obs THEN 1 ELSE 0 END) AS BIGINT)
           AS p_num
  FROM obs o JOIN reps r ON r.nationkey = o.nationkey
  GROUP BY o.nationkey, o.s_obs
),
ranked AS (
  SELECT nationkey, p_num,
         CAST(ROW_NUMBER() OVER (ORDER BY p_num, nationkey) AS BIGINT) AS k,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM pv
),
stepped AS (
  SELECT nationkey, p_num, k, m,
         MAX(CASE WHEN p_num * m <= 10 * k THEN k END) OVER () AS k_max
  FROM ranked
)
SELECT nationkey, p_num, k,
       CASE WHEN k_max IS NOT NULL AND k <= k_max THEN 1 ELSE 0 END AS rejected
FROM stepped
ORDER BY k
"""


@register("stats_bh_fdr", oracle=_BH_SQL, tier="T2")
def stats_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR control (α = 0.05) over 25 per-nation
    location tests: does a nation's total order spend deviate from the
    global mean? One p-value per nation from a deterministic sign-flip
    permutation test, then the BH step-up picks the largest k with
    p₍ₖ₎ ≤ k·α/m and rejects hypotheses 1..k.

    Determinism: the test statistic is |Σ r| of exact milli-cent residuals
    r = 1000·cents − mu_milli (global mean as a truncated integer); each
    order is hashed ONCE into 208 md5-derived bits (two md5(orderkey:m)
    calls, four 13-hex-char 52-bit words — the sketch family's mixer) and
    replicate b's sign is bit (b−1) of that pad — md5 is bit-identical
    across engines, so every S_b is the same exact int64 and
    p = (1 + #{S_b ≥ S_obs})/(B+1) is an exact rational carried as its
    integer numerator p_num (B = 199). The BH threshold p ≤ k·α/m with
    α = 1/20 becomes the integer cross-product p_num·m ≤ 10·k — no float
    ever reaches a comparison.
    Scale: hashing is O(orders), NOT O(orders·B) — the original
    md5-per-(order, replicate) spelling cost 30M hashes and 19 s warm at
    sf0.1; hash-once-read-bits is 3.3 s with identical statistical
    contract (every replicate reads an independent md5 bit). The replicate
    fan-out is generated in-flight (explode of a 1..199 sequence over four
    int64 words) and collapses immediately into a partial+final aggregate
    keyed (nation, b) — shuffle carries |nations|·B rows, not B× the data;
    the global mean is the audited broadcast 1-row scalar crossjoin; the
    BH windows run over the 25-row p-value table.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    mu = o.agg(
        F.expr(
            "(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) * 1000)"
            " DIV COUNT(*)"
        ).alias("mu_milli")
    )
    base = o.crossJoin(F.broadcast(mu)).select(
        "o_custkey",
        "o_orderkey",
        (cents(F.col("o_totalprice")).cast("long") * 1000 - F.col("mu_milli")).alias(
            "r"
        ),
    )
    tagged = base.join(F.broadcast(c), base.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nationkey"), "o_orderkey", "r"
    )
    obs = tagged.groupBy("nationkey").agg(F.abs(F.sum("r")).alias("s_obs"))
    word = (
        "CAST(conv(substr(md5(CAST(o_orderkey AS STRING) || ':{m}'), {lo}, 13),"
        " 16, 10) AS BIGINT)"
    )
    # fan_out (round-11, guide §2.5): the md5 pad + 199-replicate explode is
    # ~200x the input rows and ran inside the single-split scan stage — one
    # core did the whole permutation fan-out. The repartition is a tiny
    # 3-column shuffle of |orders| rows and is a no-op on a multi-split scan.
    hashed = fan_out(tagged).select(
        "nationkey",
        "r",
        F.expr(word.format(m=0, lo=1)).alias("h0"),
        F.expr(word.format(m=0, lo=14)).alias("h1"),
        F.expr(word.format(m=1, lo=1)).alias("h2"),
        F.expr(word.format(m=1, lo=14)).alias("h3"),
    )
    reps = (
        hashed.select(
            "nationkey",
            "r",
            "h0",
            "h1",
            "h2",
            "h3",
            F.explode(F.sequence(F.lit(1), F.lit(_B_REPS))).alias("b"),
        )
        .select(
            "nationkey",
            "b",
            F.when(
                F.expr(
                    """(shiftright(CASE (b - 1) DIV 52 WHEN 0 THEN h0
                                   WHEN 1 THEN h1 WHEN 2 THEN h2 ELSE h3 END,
                                   CAST((b - 1) % 52 AS INT)) & 1) = 0"""
                ),
                F.col("r"),
            )
            .otherwise(-F.col("r"))
            .alias("sr"),
        )
        .groupBy("nationkey", "b")
        .agg(F.abs(F.sum("sr")).alias("s_b"))
    )
    pv = (
        obs.join(reps, "nationkey")
        .groupBy("nationkey", "s_obs")
        .agg(
            (
                F.lit(1)
                + F.sum(F.when(F.col("s_b") >= F.col("s_obs"), 1).otherwise(0))
            )
            .cast("long")
            .alias("p_num")
        )
        .select("nationkey", "p_num")
    )
    ranked = pv.select(
        "nationkey",
        "p_num",
        F.row_number()
        .over(Window.orderBy("p_num", "nationkey"))
        .cast("long")
        .alias("k"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("m"),
    )
    stepped = ranked.withColumn(
        "k_max",
        F.max(
            F.when(F.col("p_num") * F.col("m") <= 10 * F.col("k"), F.col("k"))
        ).over(Window.partitionBy()),
    )
    return stepped.select(
        "nationkey",
        "p_num",
        "k",
        F.when(
            F.col("k_max").isNotNull() & (F.col("k") <= F.col("k_max")), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("rejected"),
    ).orderBy("k")


# --------------------------------------------------------- PR-AUC (AP)

_AP_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS s,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL
),
g AS (
  SELECT segment, s,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(pos) AS BIGINT) AS pc
  FROM base GROUP BY segment, s
),
cum AS (
  SELECT segment, s, pc,
         CAST(SUM(cnt) OVER (PARTITION BY segment ORDER BY s DESC) AS BIGINT) AS cn,
         CAST(SUM(pc) OVER (PARTITION BY segment ORDER BY s DESC) AS BIGINT) AS cp,
         CAST(SUM(pc) OVER (PARTITION BY segment) AS BIGINT) AS npos
  FROM g
),
terms AS (
  SELECT segment, npos,
         CASE WHEN pc = 0 OR npos = 0 THEN 0
              ELSE (pc * cp * 1000000000) // (cn * npos) END AS t_nano
  FROM cum
)
SELECT segment,
       MAX(npos) AS n_pos,
       CASE WHEN MAX(npos) = 0 THEN NULL
            ELSE CAST(SUM(t_nano) AS BIGINT) // 1000 END AS ap_micro
FROM terms GROUP BY segment
ORDER BY segment
"""


@register("stats_auc_pr", oracle=_AP_SQL, tier="T2")
def stats_auc_pr(spark, sf_dir):
    """Per-segment average precision (PR-AUC, step interpolation): sweep
    the score threshold down through the distinct values; at each block the
    term is ΔTP · precision, AP = Σ terms / n_pos — the ranking metric that
    (unlike ROC-AUC) stays informative under heavy class imbalance.

    Determinism: each block term is floored to int64 nano-units BEFORE the
    cross-block sum — (pc·cp·1e9) DIV (cn·npos), all non-negative, so Spark
    DIV ≡ DuckDB // and the sum is partition-order independent (the
    vec_centroid_drift rule: never sum raw DOUBLE terms across groups).
    ap_micro = Σnano DIV 1000. Int64: pc·cp·1e9 at 30k rows/segment ≈
    ~1e17 — safe to ~100k rows per segment with cp ≈ n/2; beyond, drop to
    1e6-unit terms (precision loss documented) or DECIMAL(38,0).
    Scale: identical shape to stats_auc_roc — windows over the per-segment
    distinct-score table, customer dim broadcast, one partial+final
    aggregate per stage.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    c = load(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        cents(F.col("o_totalprice")).cast("long").alias("s"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    g = base.groupBy("segment", "s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pc")
    )
    wdesc = Window.partitionBy("segment").orderBy(F.col("s").desc())
    cum = g.select(
        "segment",
        "pc",
        F.sum("cnt").over(wdesc).cast("long").alias("cn"),
        F.sum("pc").over(wdesc).cast("long").alias("cp"),
        F.sum("pc").over(Window.partitionBy("segment")).cast("long").alias("npos"),
    )
    terms = cum.select(
        "segment",
        "npos",
        F.when((F.col("pc") == 0) | (F.col("npos") == 0), F.lit(0).cast("long"))
        .otherwise(F.expr("(pc * cp * 1000000000) DIV (cn * npos)"))
        .alias("t_nano"),
    )
    return (
        terms.groupBy("segment")
        .agg(
            F.max("npos").alias("n_pos"),
            F.when(F.max("npos") == 0, F.lit(None).cast("long"))
            .otherwise(F.expr("CAST(SUM(t_nano) AS BIGINT) DIV 1000"))
            .alias("ap_micro"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------- effect sizes

_EFFECT_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice + 0.5) AS BIGINT) AS x,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS grp
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL
),
s AS (
  SELECT segment,
         CAST(SUM(grp) AS BIGINT) AS n1,
         CAST(SUM(grp * x) AS BIGINT) AS s1,
         CAST(SUM(grp * x * x) AS BIGINT) AS q1,
         CAST(SUM(1 - grp) AS BIGINT) AS n2,
         CAST(SUM((1 - grp) * x) AS BIGINT) AS s2,
         CAST(SUM((1 - grp) * x * x) AS BIGINT) AS q2
  FROM base GROUP BY segment
)
SELECT segment, n1, n2,
       CASE WHEN n1 < 2 OR n2 < 2 THEN NULL ELSE
         CAST(FLOOR(
           (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
           / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                 + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                  / (n1 + n2 - 2))
           * 1000000) AS BIGINT) END AS d_micro,
       CASE WHEN n1 < 2 OR n2 < 2 THEN NULL ELSE
         CAST(FLOOR(
           (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
           / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                 + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                  / (n1 + n2 - 2))
           * (1.0 - 3.0 / (4.0 * (n1 + n2 - 2) - 1.0))
           * 1000000) AS BIGINT) END AS g_micro
FROM s
ORDER BY segment
"""


@register("stats_effect_sizes", oracle=_EFFECT_SQL, tier="T2")
def stats_effect_sizes(spark, sf_dir):
    """Standardized effect sizes per segment: Cohen's d (pooled-SD mean
    difference between finished and open orders' prices) and Hedges' g
    (d with the small-sample bias correction 1 − 3/(4·df−1)) — the numbers
    that make A/B deltas comparable across metrics and segments.

    Determinism (the stats_ttest_welch discipline): n/Σx/Σx² are exact
    int64 in integer DOLLARS — cents would push Σx² past 2^53 at sf0.1
    (30k rows · (5e7)² ≈ 7.5e19); dollars keep it ≤ ~7.5e15 < 2^53, so the
    one int→double conversion is exact — then every double op (two
    divides, one sqrt — IEEE-exact-rounded — two multiplies) is spelled
    identically in both engines, and the results floor to micro-units.
    Pooled SS is computed as q − s²/n in doubles, NOT as (n·q − s²)/n
    (the integer form overflows int64 and Spark wraps silently while
    DuckDB promotes to HUGEINT — the stats_variance_merge hazard).

    Scale: single map-side-combinable aggregate over the broadcast-joined
    scan; one row per segment crosses the shuffle.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    c = load(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)").alias("x"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("grp"),
    )
    s = base.groupBy("segment").agg(
        F.sum("grp").cast("long").alias("n1"),
        F.sum(F.col("grp") * F.col("x")).cast("long").alias("s1"),
        F.sum(F.col("grp") * F.col("x") * F.col("x")).cast("long").alias("q1"),
        F.sum(F.lit(1) - F.col("grp")).cast("long").alias("n2"),
        F.sum((F.lit(1) - F.col("grp")) * F.col("x")).cast("long").alias("s2"),
        F.sum((F.lit(1) - F.col("grp")) * F.col("x") * F.col("x")).cast("long").alias("q2"),
    )
    d_expr = """
        (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
              + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
               / (n1 + n2 - 2))
    """
    return s.select(
        "segment",
        "n1",
        "n2",
        F.expr(
            f"CASE WHEN n1 < 2 OR n2 < 2 THEN NULL ELSE "
            f"CAST(FLOOR(({d_expr}) * 1000000) AS BIGINT) END"
        ).alias("d_micro"),
        F.expr(
            f"CASE WHEN n1 < 2 OR n2 < 2 THEN NULL ELSE "
            f"CAST(FLOOR(({d_expr}) * (1.0 - 3.0 / (4.0 * (n1 + n2 - 2) - 1.0))"
            f" * 1000000) AS BIGINT) END"
        ).alias("g_micro"),
    ).orderBy("segment")
