"""Corpus-statistics operators over `documents`: character-entropy quality
scoring, Zipf rank-frequency slope, and per-token burstiness (variance-to-
mean dispersion) — the classic corpus-health battery a pretraining-data
pipeline runs before/after filtering (low char entropy ⇒ repetitive junk;
a Zipf slope far from −1 ⇒ unnatural token mix; high burstiness ⇒ topical
terms vs function words).

Determinism recipe (house rules): every ln() is floored to integer units
BEFORE any cross-row sum (the vec_centroid_drift rule), all divisions of
possibly-negative quantities are negated into non-negative space first
(Spark DIV truncates, DuckDB // floors — the text_perplexity_buckets
hazard class), and burstiness is PURE int64 arithmetic end-to-end (the
variance-to-mean ratio of counts needs no float at all:
VMR·1e6 = (D·Σc² − (Σc)²)·1e6 DIV (D·Σc)).

Scale notes: the char explode carries only (doc_id, ch) — two narrow
columns — and partial aggregation collapses it to ≤|alphabet| rows per doc
per partition before the shuffle; zipf's regression runs over a top-R rank
table (R=50 rows on the driver-scale side of a TakeOrdered); burstiness is
one partial+final aggregate over (token) plus a broadcast 1-row doc-count
(audited scalar-subquery crossjoin, see tests/test_plans.py BNLJ_ALLOWED).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import register

# ---------------------------------------------------- char entropy

_ENTROPY_SQL = """
WITH chars AS (
  SELECT d.doc_id, substr(d.text, g.i, 1) AS ch
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(1, length(d.text))) AS i) g
  WHERE d.text IS NOT NULL AND length(d.text) > 0
),
cnts AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
  FROM chars GROUP BY doc_id, ch
),
docs AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
              AS BIGINT) AS sum_u
  FROM cnts GROUP BY doc_id
)
SELECT doc_id, n,
       CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) - sum_u // n
         AS ent_micronats
FROM docs
ORDER BY ent_micronats, doc_id
LIMIT 20
"""


@register("text_char_entropy", oracle=_ENTROPY_SQL, tier="T2")
def text_char_entropy(spark, sf_dir):
    """Per-document character-level Shannon entropy (micro-nats), lowest-20
    first — the cheap junk detector: near-zero entropy means the document is
    one repeated symbol; natural prose sits near the alphabet's log.

    H = ln(n) − (Σ c·ln c)/n over per-char counts c. Each ln is floored to
    int64 micro-nat units BEFORE the per-doc sum, so the result is exact
    integer arithmetic after the two quantized log calls and identical in
    both engines regardless of aggregation order. ent ≥ 0 structurally
    (floor is monotone and c ≤ n), so the single DIV is on non-negative
    operands. Total order (ent_micronats, doc_id).

    Scale: explode(split(text,'')) emits (doc_id, ch) only; map-side partial
    agg collapses each partition's chars to ≤|alphabet| rows per doc before
    the hash shuffle on doc_id — the shuffle is O(docs·alphabet), not
    O(corpus bytes). The top-20 is a TakeOrderedAndProject, no global sort.
    """
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    )
    cnts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    docs = cnts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(
            F.col("c")
            * F.floor(F.log(F.col("c").cast("double")) * 1000000).cast("long")
        )
        .cast("long")
        .alias("sum_u"),
    )
    return (
        docs.select(
            "doc_id",
            "n",
            (
                F.floor(F.log(F.col("n").cast("double")) * 1000000).cast("long")
                - F.expr("sum_u DIV n")
            ).alias("ent_micronats"),
        )
        .orderBy("ent_micronats", "doc_id")
        .limit(20)
    )


# ---------------------------------------------------- Zipf slope

_ZIPF_SQL = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS f
  FROM tok WHERE token <> '' GROUP BY token
),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r
  FROM freq
),
pts AS (
  SELECT CAST(FLOOR(ln(CAST(r AS DOUBLE)) * 1000) AS BIGINT) AS x,
         CAST(FLOOR(ln(CAST(f AS DOUBLE)) * 1000) AS BIGINT) AS y
  FROM ranked WHERE r <= 50
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT n AS n_ranks,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            WHEN n * sxy - sx * sy >= 0
              THEN ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
            ELSE -(((sx * sy - n * sxy) * 1000000) // (n * sxx - sx * sx))
       END AS slope_micro
FROM s
"""


@register("text_zipf_slope", oracle=_ZIPF_SQL, tier="T2")
def text_zipf_slope(spark, sf_dir):
    """Zipf's-law fit: least-squares slope of ln(frequency) vs ln(rank) over
    the top-50 token ranks — natural corpora sit near −1; a word-salad or
    template-heavy corpus drifts toward 0. One row: (n_ranks, slope_micro).

    Determinism: logs floored to int64 MILLI-units (micro would overflow —
    Σx·Σy·1e6 crosses 2^63 at corpus scale; milli keeps the worst product
    ≈1e17), the regression sums are then exact integers, and the final
    divide is negated into non-negative space before DIV because the slope
    is negative (Spark DIV truncates toward zero, DuckDB // floors — they
    diverge exactly on negative operands; the text_perplexity_buckets rule).

    Scale: the frequency table is one partial+final aggregate over (token);
    the top-50 cut is `ORDER BY f DESC LIMIT 50` — a distributed
    TakeOrderedAndProject — and only THEN a rank window over the 50
    surviving rows (bounded frame), so nothing vocabulary-sized ever
    passes through one reducer.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    freq = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    top = freq.orderBy(F.col("f").desc(), "token").limit(50)
    # window over the ≤50-row TakeOrdered survivors — bounded frame
    ranked = top.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), "token"))
        .alias("r"),
    )
    pts = ranked.select(
        F.floor(F.log(F.col("r").cast("double")) * 1000).cast("long").alias("x"),
        F.floor(F.log(F.col("f").cast("double")) * 1000).cast("long").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        F.col("n").alias("n_ranks"),
        F.expr(
            """CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    WHEN n * sxy - sx * sy >= 0
                      THEN ((n * sxy - sx * sy) * 1000000) DIV (n * sxx - sx * sx)
                    ELSE -(((sx * sy - n * sxy) * 1000000) DIV (n * sxx - sx * sx))
               END"""
        ).alias("slope_micro"),
    )


# ---------------------------------------------------- burstiness (VMR)

_BURST_SQL = """
WITH d AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents WHERE text IS NOT NULL
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
per_doc AS (
  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok WHERE token <> '' GROUP BY token, doc_id
),
per_tok AS (
  SELECT token,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(c * c) AS BIGINT) AS ssq
  FROM per_doc GROUP BY token
)
SELECT token, total,
       (d.n_docs * ssq - total * total) * 1000000 // (d.n_docs * total)
         AS vmr_micro
FROM per_tok, d
ORDER BY total DESC, token
LIMIT 20
"""


@register("text_burstiness", oracle=_BURST_SQL, tier="T2")
def text_burstiness(spark, sf_dir):
    """Token burstiness for the top-20 tokens by corpus frequency: the
    variance-to-mean ratio (Fisher dispersion) of per-document counts,
    zero-counting documents that lack the token. VMR ≈ 1 is Poisson
    (function words); VMR ≫ 1 marks bursty/topical terms — the Church-Gale
    dispersion statistic used to pick keyword candidates.

    PURE int64 end-to-end: with D docs, per-token total T = Σc and Σc²
    over docs containing it, the zero-inflated variance-to-mean is exactly
    VMR·1e6 = (D·Σc² − T²)·1e6 DIV (D·T) — numerator ≥ 0 by Cauchy-Schwarz,
    so truncating DIV ≡ flooring //; no float exists anywhere in the key.

    Scale: (token, doc_id) partial counts collapse map-side; the per-token
    aggregate is the only shuffle; the doc count D is a broadcast 1-row
    scalar-subquery crossjoin (audited in BNLJ_ALLOWED). Top-20 is
    TakeOrderedAndProject.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    per_doc = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_tok = per_doc.groupBy("token").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ssq"),
    )
    return (
        per_tok.crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "total",
            F.expr(
                "(n_docs * ssq - total * total) * 1000000 DIV (n_docs * total)"
            ).alias("vmr_micro"),
        )
        .orderBy(F.col("total").desc(), "token")
        .limit(20)
    )


# ---------------------------------------------------- MATTR diversity

_MATTR_W = 25

_MATTR_SQL = f"""
WITH tok AS (
  SELECT doc_id, g.i AS pos, string_split(text, ' ')[g.i] AS token,
         len(string_split(text, ' ')) AS n
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, len(string_split(text, ' '))))
                AS i) g
  WHERE text IS NOT NULL AND length(text) > 0
),
prevs AS (
  SELECT doc_id, pos, n,
         COALESCE(lag(pos) OVER (PARTITION BY doc_id, token ORDER BY pos), 0)
           AS prev_pos
  FROM tok
),
contrib AS (
  SELECT doc_id, n,
         GREATEST(0, LEAST(pos + {_MATTR_W - 1}, n)
                     - GREATEST(pos, prev_pos + {_MATTR_W}, {_MATTR_W}) + 1)
           AS c
  FROM prevs WHERE n >= {_MATTR_W}
)
SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tok,
       CAST(MAX(n) - {_MATTR_W - 1} AS BIGINT) AS n_windows,
       (CAST(SUM(c) AS BIGINT) * 1000000)
         // ({_MATTR_W} * (MAX(n) - {_MATTR_W - 1})) AS mattr_micro
FROM contrib
GROUP BY doc_id
ORDER BY mattr_micro, doc_id
LIMIT 20
"""


@register("text_mattr_diversity", oracle=_MATTR_SQL, tier="T2")
def text_mattr_diversity(spark, sf_dir):
    """MATTR — moving-average type-token ratio with a 25-token sliding
    window — the length-independent lexical-diversity score (plain TTR
    decays with document length; MATTR doesn't), lowest-20 docs first: the
    template/boilerplate detector that complements [[text_char_entropy]]
    (characters) at the token level.

    Computed WITHOUT materializing windows: position j counts as a
    distinct type in window [i−24, i] iff its previous same-token
    occurrence is outside it, so j's total contribution is the closed-form
    overlap max(0, min(j+24, n) − max(j, prev_j+25, 25) + 1) — pure
    int64 per position, summed exactly; MATTR_micro = Σ·1e6 DIV (25·W).
    One lag window over (doc, token) gives prev_j; no float anywhere.

    Scale: the token explode carries (doc_id, token, pos); the lag window
    shuffles on (doc, token) — both linear in corpus tokens; the per-doc
    sum is a partial+final aggregate and the top-20 a TakeOrdered.
    """
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token", "n")
    wprev = Window.partitionBy("doc_id", "token").orderBy("pos")
    prevs = tok.select(
        "doc_id",
        "pos",
        "n",
        F.coalesce(F.lag("pos").over(wprev), F.lit(0)).alias("prev_pos"),
    )
    W = _MATTR_W
    contrib = prevs.filter(F.col("n") >= W).select(
        "doc_id",
        "n",
        F.greatest(
            F.lit(0),
            F.least(F.col("pos") + (W - 1), F.col("n"))
            - F.greatest(F.col("pos"), F.col("prev_pos") + W, F.lit(W))
            + 1,
        ).alias("c"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_tok"),
            (F.max("n") - (W - 1)).cast("long").alias("n_windows"),
            F.expr(
                f"(CAST(SUM(c) AS BIGINT) * 1000000)"
                f" DIV ({W} * (MAX(n) - {W - 1}))"
            ).alias("mattr_micro"),
        )
        .orderBy("mattr_micro", "doc_id")
        .limit(20)
    )


# ---------------------------------------------------- hapax ratio

_HAPAX_SQL = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS f
  FROM tok WHERE token <> '' GROUP BY lang, token
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(SUM(f) AS BIGINT) AS tokens,
       CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE (CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  * 1000000) // COUNT(*) END AS hapax_ratio_micro
FROM freq
GROUP BY lang
ORDER BY lang
"""


@register("text_hapax_ratio", oracle=_HAPAX_SQL, tier="T2")
def text_hapax_ratio(spark, sf_dir):
    """Hapax legomena ratio per language: the fraction of vocabulary seen
    exactly once — high hapax share means productive/natural text (or OCR
    noise); near-zero means a closed template vocabulary. The pointwise
    companion to [[text_vocab_growth]]'s Heaps-law curve and a standard
    corpus-health column next to [[text_zipf_slope]].

    Determinism: PURE int64 — frequency table, an exact =1 count, and one
    truncating DIV on non-negative operands.

    Scale: one partial+final aggregate on (lang, token) then a per-lang
    rollup — the token explode feeds straight into map-side combine.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    freq = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    return (
        freq.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.sum("f").cast("long").alias("tokens"),
            F.expr(
                """CASE WHEN COUNT(*) = 0 THEN NULL
                        ELSE (CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END)
                                   AS BIGINT) * 1000000) DIV COUNT(*) END"""
            ).alias("hapax_ratio_micro"),
        )
        .orderBy("lang")
    )
