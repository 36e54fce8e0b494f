"""Retrieval-evaluation metrics over the BM25 ranking — the measurement
half of a corpus-search stack (round 7). text_bm25_search produces the
ranking; these keys score it against a deterministic boolean ground truth
(a document is RELEVANT to the fixed query iff it contains ALL query
terms; GRADED relevance = how many of the terms it contains), the way a
curation pipeline validates its retrieval layer before trusting it for
decontamination sweeps or targeted sampling.

All metric arithmetic is PURE int64: ranks and hit counts are integers,
ratios are micro-units via a single negation-safe `//`, and the NDCG
position discounts are precomputed micro-unit constants
w_i = round(1e6 / log2(i+1)) — the integer-form answer to the
floor(ln/ln) 1-ulp hazard (log2 of power-of-two positions lands EXACTLY on
representable integers, where a JVM-vs-C libm ulp flips a naive
quantization; baked constants cannot).

The ranking order key is the raw integer micro-unit BM25 sum (never the
rounded double), tie-broken by doc_id — identical in both engines by
construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from .llm_text import _BM25_CONTRIB, _BM25_TERMS, _TOK_SQL, _tok

# round(1e6 / log2(i+1)) for ranking positions i = 1..10
_NDCG_W = [1000000, 630930, 500000, 430677, 386853, 356207, 333333,
           315465, 301030, 289065]

_TERMS_SQL = str(_BM25_TERMS)

# shared ranking pipeline: BM25 micro-unit scores for any-term docs,
# graded relevance, rank over (score desc, doc_id)
_RANKED_SQL = f"""
tok AS ({_TOK_SQL}),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl) AS avgdl
          FROM documents),
qt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok WHERE token IN {_TERMS_SQL} GROUP BY 1, 2),
dfq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok WHERE token IN {_TERMS_SQL} GROUP BY 1),
contrib AS (
  SELECT qt.doc_id,
         CAST(FLOOR(({_BM25_CONTRIB}) * 1000000 + 0.5) AS BIGINT) AS c_micro
  FROM qt JOIN dfq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
),
scores AS (SELECT doc_id, CAST(SUM(c_micro) AS BIGINT) AS s_units
           FROM contrib GROUP BY doc_id),
grades AS (SELECT doc_id, CAST(COUNT(DISTINCT token) AS BIGINT) AS g
           FROM tok WHERE token IN {_TERMS_SQL} GROUP BY doc_id),
ranked AS (
  SELECT s.doc_id, g.g,
         CAST(ROW_NUMBER() OVER (ORDER BY s.s_units DESC, s.doc_id)
              AS BIGINT) AS rk
  FROM scores s JOIN grades g USING (doc_id)
)
"""

_RANK_METRICS_SQL = f"""
WITH {_RANKED_SQL},
rel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM grades WHERE g = 3),
fr AS (SELECT MIN(rk) AS fr FROM ranked WHERE g = 3),
ks AS (SELECT unnest([5, 10, 20]) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       MAX(rel.n_rel) AS n_relevant,
       CAST(SUM(CASE WHEN ranked.g = 3 AND ranked.rk <= ks.k
                     THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       CAST(SUM(CASE WHEN ranked.g = 3 AND ranked.rk <= ks.k
                     THEN 1 ELSE 0 END) * 1000000 // ks.k AS BIGINT)
         AS precision_micro,
       CASE WHEN MAX(rel.n_rel) = 0 THEN NULL
            ELSE CAST(SUM(CASE WHEN ranked.g = 3 AND ranked.rk <= ks.k
                               THEN 1 ELSE 0 END) * 1000000
                      // MAX(rel.n_rel) AS BIGINT) END AS recall_micro,
       CASE WHEN MAX(fr.fr) IS NULL THEN NULL
            ELSE CAST(1000000 // MAX(fr.fr) AS BIGINT) END AS mrr_micro
FROM ks CROSS JOIN ranked CROSS JOIN rel LEFT JOIN fr ON TRUE
GROUP BY ks.k
ORDER BY k
"""


@register("eval_retrieval_rank_metrics", oracle=_RANK_METRICS_SQL, tier="T2")
def eval_retrieval_rank_metrics(spark, sf_dir):
    """Precision@k, recall@k, hits@k (k = 5/10/20) and MRR of the BM25
    ranking against boolean all-terms relevance — the sanity gate a
    retrieval layer must pass before a curation stack trusts it.

    Determinism: the ranking orders by the integer micro-unit BM25 sum
    (doc_id tiebreak), every metric is an integer or a micro-unit ratio
    with non-negative `//` operands; no-relevant and empty-ranking
    degenerate cases yield NULL (not division errors).

    Scale: the ranking reuses text_bm25_search's shape (query terms filter
    the token stream before any shuffle; df/stats broadcast); the metric
    layer adds one |matched|-row window and three 1-row broadcasts
    (relevant count, first-relevant rank, the k values) — bounded
    scalar-subquery crossJoins, annotated in BNLJ_ALLOWED.
    """
    tok = _tok(spark, sf_dir).select("doc_id", "token")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    from ..io import load as _load

    d = _load(spark, sf_dir, "documents")
    stats = d.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        F.broadcast(
            dl.agg(
                (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
            )
        )
    )
    q = tok.filter(F.col("token").isin(*_BM25_TERMS))
    tf = q.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfq = q.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scores = (
        tf.join(F.broadcast(dfq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                f"CAST(FLOOR(({_BM25_CONTRIB}) * 1000000 + 0.5) AS BIGINT)"
            ).alias("c_micro"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c_micro").cast("long").alias("s_units"))
    )
    grades = q.groupBy("doc_id").agg(
        F.countDistinct("token").cast("long").alias("g")
    )
    ranked = scores.join(grades, "doc_id").select(
        "doc_id",
        "g",
        F.row_number()
        .over(Window.orderBy(F.col("s_units").desc(), "doc_id"))
        .cast("long")
        .alias("rk"),
    )
    rel = ranked.filter(F.col("g") == 3).agg(
        F.count(F.lit(1)).cast("long").alias("n_rel"),
        F.min("rk").alias("fr"),
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(10), F.lit(20))).alias("k")
    )
    return (
        ks.crossJoin(ranked)
        .crossJoin(F.broadcast(rel))
        .groupBy("k")
        .agg(
            F.max("n_rel").alias("n_relevant"),
            F.sum(
                F.when((F.col("g") == 3) & (F.col("rk") <= F.col("k")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("hits"),
            F.max("fr").alias("_fr"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            "n_relevant",
            "hits",
            F.expr("CAST(hits * 1000000 DIV k AS BIGINT)").alias(
                "precision_micro"
            ),
            F.expr(
                """CASE WHEN n_relevant = 0 THEN NULL
                        ELSE CAST(hits * 1000000 DIV n_relevant AS BIGINT)
                   END"""
            ).alias("recall_micro"),
            F.expr(
                """CASE WHEN _fr IS NULL THEN NULL
                        ELSE CAST(1000000 DIV _fr AS BIGINT) END"""
            ).alias("mrr_micro"),
        )
        .orderBy("k")
    )


_GAIN_SQL = "CASE WHEN g = 1 THEN 1 WHEN g = 2 THEN 3 ELSE 7 END"
_W_CASE = " ".join(
    f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W)
)

_NDCG_SQL = f"""
WITH {_RANKED_SQL},
ideal AS (
  SELECT g, CAST(ROW_NUMBER() OVER (ORDER BY g DESC, doc_id) AS BIGINT) AS rk
  FROM grades
),
dcg AS (
  SELECT CAST(SUM(({_GAIN_SQL}) * (CASE rk {_W_CASE} END)) AS BIGINT)
           AS dcg_micro
  FROM ranked WHERE rk <= 10
),
idcg AS (
  SELECT CAST(SUM(({_GAIN_SQL}) * (CASE rk {_W_CASE} END)) AS BIGINT)
           AS idcg_micro
  FROM ideal WHERE rk <= 10
)
SELECT dcg.dcg_micro, idcg.idcg_micro,
       CASE WHEN idcg.idcg_micro IS NULL OR idcg.idcg_micro = 0 THEN NULL
            ELSE CAST(dcg.dcg_micro * 1000000 // idcg.idcg_micro AS BIGINT)
       END AS ndcg_micro
FROM dcg CROSS JOIN idcg
"""


@register("eval_retrieval_ndcg", oracle=_NDCG_SQL, tier="T2")
def eval_retrieval_ndcg(spark, sf_dir):
    """NDCG@10 of the BM25 ranking under graded relevance (gain 2^g − 1
    for g = how many of the query terms the doc contains) — the
    order-sensitive retrieval metric precision@k can't see.

    Determinism: PURE int64 — gains are the CASE-mapped integers 1/3/7 and
    the position discounts are the baked micro-unit constants
    round(1e6/log2(i+1)) (the integer-form rule for log2-boundary
    hazards: log2(2)=1, log2(4)=2, log2(8)=3 land exactly on floor
    boundaries where a libm ulp flips a computed-log quantization; baked
    constants cannot flip). DCG and IDCG are exact integer sums;
    the final ratio is one non-negative `//`.

    Scale: same bounded shape as eval_retrieval_rank_metrics plus one
    |docs|-row window for the ideal ranking; both windows are global but
    over the MATCHED set only (query-filtered before any shuffle) — at
    100 TB the matched set for a targeted query is the small side by
    construction; a dense query would swap in the top-k-per-partition
    pre-cut (TakeOrderedAndProject) before the global rank.
    """
    tok = _tok(spark, sf_dir).select("doc_id", "token")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    from ..io import load as _load

    d = _load(spark, sf_dir, "documents")
    stats = d.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        F.broadcast(
            dl.agg(
                (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
            )
        )
    )
    q = tok.filter(F.col("token").isin(*_BM25_TERMS))
    tf = q.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfq = q.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scores = (
        tf.join(F.broadcast(dfq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                f"CAST(FLOOR(({_BM25_CONTRIB}) * 1000000 + 0.5) AS BIGINT)"
            ).alias("c_micro"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c_micro").cast("long").alias("s_units"))
    )
    grades = q.groupBy("doc_id").agg(
        F.countDistinct("token").cast("long").alias("g")
    )
    gain = F.expr(_GAIN_SQL)
    w_of_rk = F.expr(f"CASE rk {_W_CASE} END")
    ranked = (
        scores.join(grades, "doc_id")
        .select(
            "g",
            F.row_number()
            .over(Window.orderBy(F.col("s_units").desc(), "doc_id"))
            .cast("long")
            .alias("rk"),
        )
        .filter(F.col("rk") <= 10)
        .agg(F.sum(gain * w_of_rk).cast("long").alias("dcg_micro"))
    )
    ideal = (
        grades.select(
            "g",
            F.row_number()
            .over(Window.orderBy(F.col("g").desc(), "doc_id"))
            .cast("long")
            .alias("rk"),
        )
        .filter(F.col("rk") <= 10)
        .agg(F.sum(gain * w_of_rk).cast("long").alias("idcg_micro"))
    )
    return ranked.crossJoin(F.broadcast(ideal)).select(
        "dcg_micro",
        "idcg_micro",
        F.expr(
            """CASE WHEN idcg_micro IS NULL OR idcg_micro = 0 THEN NULL
                    ELSE CAST(dcg_micro * 1000000 DIV idcg_micro AS BIGINT)
               END"""
        ).alias("ndcg_micro"),
    )


# ------------------------------------------------------------ ROUGE-L
# Candidate docs 1..50 paired with reference doc_id+100, both truncated to
# their first 20 tokens — a bounded, deterministic summarization-eval grid.

_ROUGE_SQL = """
WITH RECURSIVE
base AS (
  SELECT doc_id, string_split(text, ' ')[1:20] AS toks
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
pairs AS (
  SELECT c.doc_id AS cand_id, r.doc_id AS ref_id, c.toks AS ct, r.toks AS rt
  FROM base c JOIN base r ON r.doc_id = c.doc_id + 100
  WHERE c.doc_id <= 50
),
walk(cand_id, i, row) AS (
  SELECT cand_id, 0,
         list_transform(generate_series(1, len(rt)), j -> CAST(0 AS BIGINT))
  FROM pairs
  UNION ALL
  SELECT w.cand_id, w.i + 1,
         list_reduce(
           [CAST([] AS BIGINT[])]
             || list_transform(generate_series(1, len(p.rt)), j -> [j]),
           (acc, x) -> acc || [
             CASE WHEN p.ct[w.i + 1] = p.rt[x[1]]
                  THEN (CASE WHEN x[1] = 1 THEN 0
                             ELSE w.row[x[1] - 1] END) + 1
                  ELSE greatest(
                         w.row[x[1]],
                         CASE WHEN x[1] = 1 THEN 0 ELSE acc[len(acc)] END)
             END]
         )
  FROM walk w JOIN pairs p ON p.cand_id = w.cand_id
  WHERE w.i < len(p.ct)
)
SELECT w.cand_id, p.ref_id,
       CAST(len(p.ct) AS BIGINT) AS n_cand,
       CAST(len(p.rt) AS BIGINT) AS n_ref,
       CAST(w.row[len(w.row)] AS BIGINT) AS lcs_len,
       CAST(w.row[len(w.row)] * 1000000 // len(p.ct) AS BIGINT) AS p_micro,
       CAST(w.row[len(w.row)] * 1000000 // len(p.rt) AS BIGINT) AS r_micro,
       CAST(w.row[len(w.row)] * 2000000 // (len(p.ct) + len(p.rt))
            AS BIGINT) AS f1_micro
FROM walk w JOIN pairs p USING (cand_id)
WHERE w.i = len(p.ct)
"""


@register("text_rouge_l", oracle=_ROUGE_SQL, tier="T2")
def text_rouge_l(spark, sf_dir):
    """ROUGE-L (longest-common-subsequence precision/recall/F1) between
    deterministic candidate/reference doc pairs — the summarization /
    generation eval metric, over the fixture's (doc d, doc d+100) pairs
    truncated to their first 20 tokens.

    Determinism: PURE int64 — the LCS DP
    L[i][j] = ct[i]=rt[j] ? L[i−1][j−1]+1 : max(L[i−1][j], L[i][j−1])
    is integer-valued by construction, and the DuckDB twin replays the
    identical DP as a recursive CTE over DP rows, each row built by a left
    list-fold (the [[]] || [[j]…] empty-accumulator trick that resolves
    the in-row L[i][j−1] dependency — the [[ts_dtw_profile]] recipe with
    max-recurrence instead of min). P = lcs/|cand|, R = lcs/|ref| and the
    β=1 F-measure collapses to 2·lcs/(|cand|+|ref|) exactly, so all three
    are single non-negative `//` micro-ratios.

    Scale note: the pair set is the bounded eval grid (50 pairs, ≤20
    tokens each ⇒ ≤400-cell DPs); both join sides carry pushed-down
    doc_id range filters so the scans prune to the eval slice. A
    corpus-scale ROUGE sweep would block pairs first (the dedup recipe)
    and run the same Arrow-batched DP per block.
    """
    import numpy as np

    from ..io import load as _load

    d = _load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    toks = F.slice(F.split("text", " "), 1, 20)
    cand = d.filter(F.col("doc_id") <= 50).select(
        F.col("doc_id").alias("cand_id"), toks.alias("ct")
    )
    # doc_ids start at 0 ⇒ candidates 0..50 pair with references 100..150
    ref = d.filter(F.col("doc_id").between(100, 150)).select(
        F.col("doc_id").alias("ref_id"), toks.alias("rt")
    )
    pairs = cand.join(
        F.broadcast(ref), ref.ref_id == cand.cand_id + 100
    )

    @F.pandas_udf("long")
    def lcs(ct: pd.Series, rt: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(ct, rt):
            a, b = list(a), list(b)
            m = len(b)
            prev = np.zeros(m + 1, dtype=np.int64)
            for tok in a:
                cur = np.zeros(m + 1, dtype=np.int64)
                for j in range(1, m + 1):
                    if tok == b[j - 1]:
                        cur[j] = prev[j - 1] + 1
                    else:
                        cur[j] = max(prev[j], cur[j - 1])
                prev = cur
            out.append(int(prev[m]))
        return pd.Series(out)

    return pairs.select(
        "cand_id",
        "ref_id",
        F.size("ct").cast("long").alias("n_cand"),
        F.size("rt").cast("long").alias("n_ref"),
        lcs("ct", "rt").alias("lcs_len"),
        "ct",
        "rt",
    ).select(
        "cand_id",
        "ref_id",
        "n_cand",
        "n_ref",
        "lcs_len",
        F.expr("CAST(lcs_len * 1000000 DIV n_cand AS BIGINT)").alias("p_micro"),
        F.expr("CAST(lcs_len * 1000000 DIV n_ref AS BIGINT)").alias("r_micro"),
        F.expr(
            "CAST(lcs_len * 2000000 DIV (n_cand + n_ref) AS BIGINT)"
        ).alias("f1_micro"),
    )
