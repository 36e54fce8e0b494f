"""Hybrid retrieval: BM25 lexical ranking fused with embedding-cosine
semantic ranking by Reciprocal Rank Fusion (RRF, k=60) — the standard
two-tower corpus-search shape (sparse ⊕ dense) used for curation search
and decontamination probes. Composes the two independently oracle-checked
stacks (text_bm25_search, sim_cosine_topk's cosine machinery) into one
declared key.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import rnd, sql_rnd
from ..registry import register
from .llm_similarity import _COS_SQL, _NORMS_SQL, _norms, _pair_cos
from .llm_text import _BM25_SQL, text_bm25_search

_RRF_K = 60
_TOPN = 20
_PROBE_ID = 0  # query vector: embedding of doc 0 (embeddings.vec_id = doc_id)

_HYBRID_SQL = f"""
WITH {_NORMS_SQL},
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
  FROM ({_BM25_SQL})
),
sem AS (
  SELECT neighbor_id AS doc_id,
         row_number() OVER (ORDER BY cos DESC, neighbor_id) AS r_sem
  FROM (
    SELECT b.vec_id AS neighbor_id, {_COS_SQL} AS cos
    FROM norms a JOIN norms b ON b.vec_id != a.vec_id
    WHERE a.vec_id = {_PROBE_ID}
    ORDER BY cos DESC, neighbor_id LIMIT {_TOPN}
  )
),
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         lex.r_lex AS r_lex, sem.r_sem AS r_sem,
         COALESCE(1.0 / ({_RRF_K} + lex.r_lex), 0)
           + COALESCE(1.0 / ({_RRF_K} + sem.r_sem), 0) AS s
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id,
       CAST(COALESCE(r_lex, 0) AS BIGINT) AS r_lex,
       CAST(COALESCE(r_sem, 0) AS BIGINT) AS r_sem,
       {sql_rnd('s', 6)} AS rrf
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {_TOPN}
"""


@register("search_hybrid_rrf", oracle=_HYBRID_SQL, tier="T2")
def search_hybrid_rrf(spark, sf_dir):
    """Hybrid search: top-20 BM25 docs for the fixed keyword query and
    top-20 cosine neighbors of the probe embedding, fused with RRF
    (score = Σ 1/(60 + rank); rank 0-coalesced to drop the term). Missing
    ranks surface as 0 in the output (NULL-free scalar columns).

    Determinism: both input rankings carry total tie-breaks (score DESC,
    doc_id), RRF adds exactly two mirrored double divisions in a fixed
    order, and the final (rrf DESC, doc_id) order pins the top-20 cut.

    Scale note: both arms end in TakeOrderedAndProject top-20, so the
    fusion join handles ≤40 rows — broadcast territory regardless of
    corpus size. The arms themselves carry the scale design of their
    donor keys (term-filtered token stream; broadcast probe × corpus
    scan, which at 100 TB is where the IVF/LSH ANN keys substitute in).
    """
    lex = text_bm25_search(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("r_lex"),
    )
    n = _norms(spark, sf_dir)
    probe = n.filter(F.col("vec_id") == _PROBE_ID).alias("a")
    corpus = n.alias("b")
    sem = (
        F.broadcast(probe)
        .join(corpus, F.col("b.vec_id") != F.col("a.vec_id"))
        .select(F.col("b.vec_id").alias("doc_id"), _pair_cos().alias("cos"))
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(_TOPN)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("cos").desc(), "doc_id"))
            .alias("r_sem"),
        )
    )
    # both arms are ≤20-row top-K lists, but FULL OUTER cannot broadcast —
    # the SHUFFLE_HASH hint replaces the planner's sort-both-sides SMJ with
    # a per-partition hash build of the (tiny) semantic arm (r11 s6 audit)
    fused = (
        lex.join(sem.hint("shuffle_hash"), "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            (
                F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_sem")), F.lit(0.0))
            ).alias("s"),
        )
    )
    return (
        fused.select(
            "doc_id",
            F.coalesce(F.col("r_lex"), F.lit(0)).cast("long").alias("r_lex"),
            F.coalesce(F.col("r_sem"), F.lit(0)).cast("long").alias("r_sem"),
            rnd(F.col("s"), 6).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_TOPN)
    )
