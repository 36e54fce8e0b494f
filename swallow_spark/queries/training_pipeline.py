"""End-to-end training-data cleaning pipeline as ONE oracle-checked key —
the Layer-B flagship composition (SURVEY.md §0.1): exact dedup → near-dup
pruning → quality filtering, the canonical pre-training corpus pass.

Stages (all pure DataFrame ops, one Catalyst plan):
 1. exact dedup: min doc_id survives per md5(text)
 2. near-dup prune: among 5-token-shingle Jaccard ≥ 0.8 pairs, the higher
    doc_id loses (transitive losers removed — at τ=0.8 on this corpus pair
    components are tiny, and the loser set is well-defined either way
    because losers are computed from the full pair list)
 3. quality gate: uniqueness × (1 − stopword-ratio) ≥ 0.25

Scale notes: stage 1 partial-aggregates on content hash; stage 2 reuses the
inverted-index shingle join (sub-quadratic); stage 3 is a map-only filter.
The loser set is broadcast (near-dup losers are a vanishing fraction of a
100 TB corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import rnd, sql_rnd
from ..io import load
from ..ops.text import STOPWORDS, sql_shingles, tokens
from ..registry import register

_STOP_IN = "('" + "', '".join(STOPWORDS) + "')"
_UNIQ = "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' '))"
_STOPR = (
    f"CAST(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_IN})) AS DOUBLE)"
    " / len(string_split(text, ' '))"
)
_QUALITY = f"({_UNIQ}) * (1 - {_STOPR})"


@register(
    "training_data_clean",
    oracle=f"""
WITH exact_survivors AS (
  SELECT doc_id, text, lang
  FROM documents
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
),
sh AS (
  SELECT doc_id, unnest({sql_shingles('text')}) AS s FROM exact_survivors
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
near_losers AS (
  SELECT DISTINCT d2 AS loser
  FROM pairs p JOIN sz x ON p.d1 = x.doc_id JOIN sz y ON p.d2 = y.doc_id
  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
)
SELECT doc_id, lang, {sql_rnd(_QUALITY, 4)} AS quality
FROM exact_survivors
WHERE doc_id NOT IN (SELECT loser FROM near_losers)
  AND {_QUALITY} >= 0.25
""",
    tier="T2",
)
def training_data_clean(spark, sf_dir):
    """Exact-dedup → near-dup-prune → quality-gate corpus cleaning pass."""
    d = load(spark, sf_dir, "documents")

    # 1. exact dedup
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "lang")
    )

    # 2. near-dup losers (higher doc_id in any Jaccard>=0.8 pair)
    from ..ops.dedup import shingle_jaccard_pairs

    pairs, jac = shingle_jaccard_pairs(exact)
    losers = (
        pairs.filter(jac >= 0.8).select(F.col("d2").alias("doc_id")).distinct()
    )

    # 3. quality gate over the remaining survivors
    arr = tokens(F.col("text"))
    uniq_ratio = F.size(F.array_distinct(arr)).cast("double") / F.size(arr)
    stop_ratio = (
        F.size(F.filter(arr, lambda t: t.isin(*STOPWORDS))).cast("double") / F.size(arr)
    )
    quality = uniq_ratio * (F.lit(1) - stop_ratio)
    return (
        exact.join(F.broadcast(losers), "doc_id", "left_anti")
        .filter(quality >= 0.25)
        .select("doc_id", "lang", rnd(quality, 4).alias("quality"))
    )


@register(
    "training_epoch_shuffle",
    oracle="""
WITH sh AS (
  SELECT e.epoch, d.doc_id,
         (d.doc_id * 2654435761 + e.epoch * 97) % 1000000007 AS h
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS epoch) e
),
r AS (
  SELECT epoch, doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS pos
  FROM sh
)
SELECT epoch, CAST(pos AS BIGINT) AS pos, doc_id, CAST(h AS BIGINT) AS h
FROM r WHERE pos <= 20
""",
    tier="T2",
)
def training_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch corpus shuffle — the training-loader verb
    that gives every epoch a DIFFERENT but fully reproducible document
    order (same seed → same batches on any cluster size, the property
    data-order-debugging and exact run-resumption depend on; true random
    shuffles lose it). Order key: Knuth-multiplicative hash of
    (doc_id, epoch); the declared key pins the first 20 positions of
    epochs 0 and 1.

    Determinism: pure int64 arithmetic (doc_id·2.65e9 « 2^63 up to
    doc_id ≈ 3e9; mod doc_id first beyond), identical in both engines;
    (h, doc_id) is a total order.

    Scale notes: the epoch dimension explodes map-side; the top-20 pin is
    a WindowGroupLimit (per-partition heap, no full sort). A real loader
    materializes the WHOLE epoch order instead with
    repartition(N, h).sortWithinPartitions(h, doc_id) — a single shuffle
    whose output files ARE the shuffled shards, no global sort needed.
    """
    d = load(spark, sf_dir, "documents").select("doc_id")
    sh = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("epoch"),
        "doc_id",
    ).select(
        "epoch",
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761) + F.col("epoch") * 97) % F.lit(1000000007)).alias("h"),
    )
    w = Window.partitionBy("epoch").orderBy("h", "doc_id")
    return (
        sh.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 20)
        .select("epoch", F.col("pos").cast("long").alias("pos"), "doc_id", F.col("h").cast("long").alias("h"))
    )
