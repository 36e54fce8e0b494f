"""Deterministic sampling / dataset splitting — training-data pipeline
staples (beyond the §2.K inventory, same north star).

Sampling by `rand()` is non-reproducible across retries/partitionings; these
use pure integer arithmetic on the record key, so the same row lands in the
same split on every run, every engine, every cluster size — the property a
100 TB training corpus split must have.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import rnd
from ..io import load
from ..ops.dist_rank import distributed_prefix
from ..ops.materialize import materialize
from ..registry import register

_MULT = 2654435761  # Knuth multiplicative hash constant
_MOD = 1_000_003  # prime
_SYS_BUCKETS = 64  # two-phase-rank range buckets (raise with cluster width)


def _slot_sql(key: str) -> str:
    # ((key % MOD) * MULT) % MOD keeps every product < 2^51 (ANSI-safe)
    return f"(((({key} % {_MOD}) * {_MULT}) % {_MOD}) % 1000)"


def _slot(col):
    return F.pmod(F.pmod(F.pmod(col, F.lit(_MOD)) * F.lit(_MULT), F.lit(_MOD)), F.lit(1000))


@register(
    "sample_deterministic",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_slot_sql('doc_id')} < 100
""",
    tier="T2",
)
def sample_deterministic(spark, sf_dir):
    """~10% key-hash sample: stable under reruns and repartitioning."""
    d = load(spark, sf_dir, "documents")
    return d.filter(_slot(F.col("doc_id")) < 100).select("doc_id", "lang", "source")


@register(
    "dataset_split",
    oracle=f"""
SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM (
  SELECT lang,
         CASE WHEN {_slot_sql('doc_id')} < 900 THEN 'train' ELSE 'test' END AS split
  FROM documents
)
GROUP BY split
""",
    tier="T2",
)
def dataset_split(spark, sf_dir):
    """Deterministic 90/10 train/test assignment + per-split sanity stats."""
    d = load(spark, sf_dir, "documents")
    split = F.when(_slot(F.col("doc_id")) < 900, "train").otherwise("test")
    return (
        d.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@register("ann_ivf_kmeans", oracle=None, tier="T3")
def ann_ivf_kmeans(spark, sf_dir):
    """IVF-style ANN: deterministic k-means (8 cells, 3 Lloyd iterations,
    init = 8 lowest vec_ids), then per-probe brute-force over the nprobe=5
    nearest cells only (probe-side-only fan-out; the corpus is indexed once
    by home cell, so raising nprobe costs nothing corpus-side — same trick
    as the LSH multi-probe) (rows-only: iterative algorithm, §2.0 rule 6;
    exact twin = sim_cosine_topk).

    Scale notes: centroids are tiny (k × dim) and live on the driver /
    broadcast — the canonical IVF layout. Assignment is a map-only pass;
    each Lloyd iteration is one groupBy(cell) aggregate of exact integer
    1e-4-unit sums (single division at the end), so the centroids — and
    therefore near-tie cell assignments — are partition-order independent
    like the rest of the vector family. Cell id becomes the shuffle key for
    search, bounding the candidate set per probe.
    """
    from ..ops.vectors import ESCALE, SCALE, dot_int, int_units

    # cache once: the Lloyd loop + final assignment otherwise re-scan the
    # parquet per iteration (4 scans of the embedding table saved)
    e = load(spark, sf_dir, "embeddings").persist()
    dim = 64
    k = 8

    def dist2_to(centroid):
        # squared L2 distance to a literal centroid vector
        arr = F.array(*[F.lit(float(c)) for c in centroid])
        return F.aggregate(
            F.zip_with(F.col("embedding"), arr, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # deterministic init: the 8 lowest vec_ids
    centroids = [
        r.embedding
        for r in e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]
    for _ in range(3):  # Lloyd iterations (centroid table is tiny by design)
        d2 = [dist2_to(c).alias(f"d{i}") for i, c in enumerate(centroids)]
        assigned = e.select("vec_id", "embedding", *d2)
        cell = F.lit(0)
        best = F.col("d0")
        for i in range(1, k):
            cell = F.when(F.col(f"d{i}") < best, i).otherwise(cell)
            best = F.least(best, F.col(f"d{i}"))
        assigned = assigned.select("vec_id", "embedding", cell.alias("cell"))
        means = (
            assigned.select(
                "cell", F.posexplode(F.col("embedding")).alias("i", "x")
            )
            .groupBy("cell", "i")
            # exact int64 1e-4-unit sums, ONE division afterwards:
            # partition-order independent, unlike a double F.avg
            .agg(
                F.sum(
                    F.floor(F.col("x").cast("double") * F.lit(ESCALE) + F.lit(0.5)).cast("long")
                ).alias("s"),
                F.count("*").alias("cnt"),
            )
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "s", "cnt"))).alias("ims"))
            .select(
                "cell",
                F.transform(
                    "ims",
                    lambda t: (t.getField("s").cast("double") / t.getField("cnt").cast("double"))
                    / F.lit(float(ESCALE)),
                ).alias("c"),
            )
            .collect()
        )
        new = {r.cell: r.c for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(k)]

    d2 = [dist2_to(c).alias(f"d{i}") for i, c in enumerate(centroids)]
    assigned = e.select("vec_id", "label", "embedding", *d2)
    cell = F.lit(0)
    best = F.col("d0")
    for i in range(1, k):
        cell = F.when(F.col(f"d{i}") < best, i).otherwise(cell)
        best = F.least(best, F.col(f"d{i}"))
    # nprobe=5: rank cells by distance via array_sort of (dist, idx) structs
    nprobe = 5
    cells_ranked = F.array_sort(
        F.array(*[F.struct(F.col(f"d{i}").alias("d"), F.lit(i).alias("i")) for i in range(k)])
    )
    assigned = assigned.select(
        "vec_id",
        "label",
        int_units(F.col("embedding")).alias("iv"),
        *[
            cells_ranked.getItem(j).getField("i").alias(f"cell{j}")
            for j in range(nprobe)
        ],
    )
    nrm = F.sqrt(dot_int(F.col("iv"), F.col("iv")).cast("double") / F.lit(SCALE))
    # zero-norm vectors excluded: cosine undefined (see llm_similarity note)
    n = assigned.withColumn("nrm", nrm).filter(F.col("nrm") > 0)
    # corpus indexed by its home cell; probes fan out to their nprobe=5
    # nearest cells (probe-side-only cost — the index is built once)
    corpus = n.select("vec_id", "iv", "nrm", F.col("cell0").alias("cell"))
    probes = n.filter(F.col("vec_id") < 10).select(
        "vec_id", "iv", "nrm",
        F.explode(F.array(*[f"cell{j}" for j in range(nprobe)])).alias("cell"),
    )
    cos = (
        dot_int(F.col("a.iv"), F.col("b.iv")).cast("double") / F.lit(SCALE)
    ) / (F.col("a.nrm") * F.col("b.nrm"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "neighbor_id")
    out = (
        probes.alias("a")
        .join(
            corpus.alias("b"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("probe_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            cos.alias("cos"),
        )
        .dropDuplicates(["probe_id", "neighbor_id"])
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("probe_id", "neighbor_id", rnd(F.col("cos"), 4).alias("cosine"), "rk")
        .transform(materialize)
    )
    # materialize, then release the cached base table (no recompute risk)
    e.unpersist()
    return out


# temperature-sampling of the corpus source mix (multilingual-style rebalance)
_TEMP_TAU = "0.7"
_TEMP_TARGET = 10_000  # documents drawn in the hypothetical mixed epoch

_TEMP_SQL = f"""
WITH src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM src),
pw AS (
  SELECT source, n,
         CAST(FLOOR(POW(CAST(n AS DOUBLE) / total, {_TEMP_TAU}) * 1000000 + 0.5)
              AS BIGINT) AS w_micro
  FROM src CROSS JOIN tot
),
z AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS zsum FROM pw)
SELECT source, n AS n_docs,
       (FLOOR(CAST(n AS DOUBLE) / (SELECT total FROM tot) * 1000000 + 0.5)
        / 1000000) AS p_raw,
       (FLOOR(CAST(w_micro AS DOUBLE) / zsum * 1000000 + 0.5) / 1000000) AS p_mixed,
       CAST(FLOOR(CAST(w_micro AS DOUBLE) / zsum * {_TEMP_TARGET} + 0.5) AS BIGINT)
         AS expected_draws
FROM pw CROSS JOIN z
""".strip()


@register("sample_temperature_mix", oracle=_TEMP_SQL, tier="T2")
def sample_temperature_mix(spark, sf_dir):
    """Temperature-based corpus mixing (τ=0.7): per-source raw share
    p_i, rebalanced share p_i^τ / Σp_j^τ, and the expected document draws
    in a 10 000-doc epoch — the standard multilingual/multi-domain
    rebalance that up-samples small sources without flattening the mix
    (τ=1 keeps raw proportions, τ→0 approaches uniform).

    Determinism: the only libm call (POW) is floored to integer
    micro-units immediately — the same quantize-then-sum recipe
    text_unigram_logprob uses for ln() — so normalization runs on exact
    ints with one mirrored division per output.

    Scale note: |sources| rows after the first count — everything
    downstream is broadcast scalar math; the count itself is the only
    corpus-wide aggregate.
    """
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = src.agg(F.sum("n").alias("total"))
    pw = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "total",
        F.floor(
            F.pow(F.col("n").cast("double") / F.col("total"), F.lit(float(_TEMP_TAU)))
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w_micro"),
    )
    z = pw.agg(F.sum("w_micro").alias("zsum"))
    return pw.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("n").alias("n_docs"),
        (
            F.floor(F.col("n").cast("double") / F.col("total") * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("p_raw"),
        (
            F.floor(F.col("w_micro").cast("double") / F.col("zsum") * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("p_mixed"),
        F.floor(
            F.col("w_micro").cast("double") / F.col("zsum") * _TEMP_TARGET + F.lit(0.5)
        )
        .cast("long")
        .alias("expected_draws"),
    )


_RESV_K = 10  # per-group sample size

_RESV_SQL = f"""
WITH ranked AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY (c_custkey * 2654435761) % 1000000007, c_custkey) AS rk
  FROM customer
)
SELECT c_mktsegment, c_custkey,
       (FLOOR(c_acctbal * 100 + 0.5) / 100) AS acctbal,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_RESV_K}
"""


@register("sample_reservoir_per_group", oracle=_RESV_SQL, tier="T2")
def sample_reservoir_per_group(spark, sf_dir):
    """Fixed-size (k=10) per-segment sample — the deterministic analog of
    per-group reservoir sampling: rank rows inside each group by a
    Knuth-multiplicative hash of the key and keep the first k. Rerun- and
    partition-stable (same sample every run, any cluster size), which
    true random reservoirs are not — the property an eval-set builder
    needs.

    Determinism: the hash is pure int64 arithmetic ((key · 2654435761)
    mod 1e9+7 — fits: key ≤ ~1.5e7 at sf100 × 2.65e9 ≈ 4e16 « 2^63) with
    the raw key as tiebreak; ranks are exact.

    Scale note: one shuffle on the group key; the rank filter is a
    WindowGroupLimit pushdown (top-k per group never materializes full
    partitions in memory). At extreme group sizes switch to the
    max_by-ladder (join_argmax_rows) or a two-phase threshold sample.
    """
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        (F.col("c_custkey") * F.lit(2654435761)) % F.lit(1000000007), "c_custkey"
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _RESV_K)
        .select(
            "c_mktsegment",
            "c_custkey",
            (F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)) / 100).alias("acctbal"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


@register(
    "sample_systematic",
    oracle="""
WITH rk AS (
  SELECT c_custkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (ORDER BY c_custkey) AS r
  FROM customer
)
SELECT c_custkey, c_mktsegment, cents
FROM rk WHERE (r - 1) % 25 = 0
""",
    tier="T2",
)
def sample_systematic(spark, sf_dir):
    """Systematic (every k-th) sampling: rank the population in a total
    key order and keep ranks 1, k+1, 2k+1, ... — the audit-sampling
    design (uniform coverage across the ordered key space, no clumps)
    that complements the hash samples (sample_deterministic) when the
    auditor wants evenly spaced exemplars rather than random ones. k=25
    here (a 4% sample).

    Distributed two-phase rank (ops/dist_rank.py — NO global window; a
    `Window.orderBy` with no partitionBy serializes the whole population
    through one reducer, the classic 100 TB cliff): DIV-bucket on the
    dense c_custkey, per-bucket counts → broadcast exclusive offsets,
    within-bucket row_number + offset = the exact global rank.

    Determinism: rank over the total c_custkey order; pure integer
    modulus. Caveat documented: systematic samples are biased if the
    order correlates with a periodic pattern of the same wavelength —
    use the hash sample when in doubt.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    ranked = distributed_prefix(
        c, F.col("c_custkey"), ["c_custkey"], buckets=_SYS_BUCKETS, rank="r"
    )
    return ranked.filter((F.col("r") - 1) % 25 == 0).select(
        "c_custkey", "c_mktsegment", "cents"
    )


@register(
    "sample_label_balance",
    oracle=f"""
WITH c AS (
  SELECT label, COUNT(*) AS cnt FROM embeddings GROUP BY label
),
m AS (SELECT label, MIN(cnt) OVER () AS mincnt FROM c),
r AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY label
                            ORDER BY {_slot_sql('vec_id')}, vec_id) AS rk
  FROM embeddings
)
SELECT r.label, r.vec_id, CAST(r.rk AS BIGINT) AS rk
FROM r JOIN m USING (label)
WHERE r.rk <= m.mincnt
""",
    tier="T2",
)
def sample_label_balance(spark, sf_dir):
    """Class-balanced downsampling: every label keeps exactly
    min-class-count rows — the standard fix for label imbalance before
    training a classifier (the alternative, loss re-weighting, is
    class_weights; together they are the two halves of the imbalance
    toolkit). Which rows survive is decided by the module's deterministic
    multiplicative slot hash ordered (slot, vec_id) — a reproducible
    pseudo-random draw: same rows kept on every run, engine, and cluster
    size, unlike rand()-based sampling.

    Output carries the within-label keep rank so the hash check pins the
    ENTIRE kept set and its selection order, not just the counts.

    Scale note: one count aggregate (tiny), one per-label window for the
    ranked draw (single shuffle on label; sub-band a hot label at 100 TB
    by salting the window partition and re-ranking the ≤ cap·salt
    survivors), and a broadcast-sized join to attach the cap.
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    c = e.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    m = c.select("label", F.min("cnt").over(w_all).alias("mincnt"))
    wr = Window.partitionBy("label").orderBy(_slot(F.col("vec_id")), "vec_id")
    r = e.select("vec_id", "label", F.row_number().over(wr).alias("rk"))
    return (
        r.join(F.broadcast(m), "label")
        .filter(F.col("rk") <= F.col("mincnt"))
        .select("label", "vec_id", F.col("rk").cast("long").alias("rk"))
    )


# --- Quality-weighted acceptance sampling (round 9) --------------------------
# The DCLM-style curation move: instead of a hard quality threshold, keep a
# document with probability proportional to its quality score — soft
# downsampling that preserves some low-quality mass for robustness while
# concentrating the corpus on high-quality text. Acceptance is DETERMINISTIC
# (integer key-hash slot vs integer micro-unit quality), so the same doc
# survives on every run, engine, and partitioning — rand()-based sampling
# cannot provide that.
from ..ops.text import STOPWORDS as _QW_STOP

_QW_STOP_IN = "('" + "', '".join(_QW_STOP) + "')"

# quality = uniq_ratio * (1 - stopword_ratio), the text_quality_score recipe
_QW_UNIQ_SQL = (
    "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
    " / len(string_split(text, ' '))"
)
_QW_STOP_SQL = (
    f"CAST(len(list_filter(string_split(text, ' '), t -> t IN {_QW_STOP_IN}))"
    " AS DOUBLE) / len(string_split(text, ' '))"
)
_QW_MICRO_SQL = (
    f"CAST(FLOOR(({_QW_UNIQ_SQL}) * (1 - {_QW_STOP_SQL}) * 1000000 + 0.5)"
    " AS BIGINT)"
)


@register(
    "sample_quality_weighted",
    oracle=f"""
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       quality_micro
FROM (
  SELECT doc_id, lang, text, {_QW_MICRO_SQL} AS quality_micro
  FROM documents WHERE text IS NOT NULL
)
WHERE {_slot_sql('doc_id')} * 1000 < quality_micro
""",
    tier="T2",
)
def sample_quality_weighted(spark, sf_dir):
    """Quality-proportional deterministic sampling: keep a document iff its
    key-hash slot (uniform in 0..999, the sample_deterministic recipe)
    scaled to micro-units falls below its quality score in micro-units
    (uniqueness ratio x (1 - stopword ratio), the text_quality_score
    recipe) — P(keep) ~= quality, decided by pure integer comparison.

    Determinism: both sides of the comparison are exact int64 (the slot is
    modular arithmetic on doc_id; quality_micro is floor(q * 1e6 + 0.5) of
    a double derived identically from integer token counts in both
    engines), so acceptance is reproducible across retries, partitionings,
    and engines — the property a 100 TB corpus-curation pass must have for
    auditable lineage.

    Scale note: map-only (filter + projection, no shuffle, no state);
    predicate and column pruning reach the parquet scan. The whole pass is
    embarrassingly parallel at any corpus size.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from ..ops.text import tokens as _tokens

    arr = _tokens(F.col("text"))
    n_tok = F.size(arr)
    uniq_ratio = F.size(F.array_distinct(arr)).cast("double") / n_tok
    stop_ratio = (
        F.size(F.filter(arr, lambda t: t.isin(*_QW_STOP))).cast("double") / n_tok
    )
    q_micro = F.floor(
        uniq_ratio * (F.lit(1) - stop_ratio) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    return (
        d.select(
            "doc_id",
            "lang",
            n_tok.cast("long").alias("n_tokens"),
            q_micro.alias("quality_micro"),
        )
        .filter(_slot(F.col("doc_id")) * F.lit(1000) < F.col("quality_micro"))
    )
