"""§2.K — text-analysis operators over `documents`: token counts, stopwords,
n-grams, tf-idf, language stats, lexicon sentiment, length analysis,
n-gram-profile language ID, quality scoring, BPE-ish token counting,
rolling-hash fingerprinting.

Scale notes: all token pipelines project to (id, token) before exploding so
the explode→shuffle carries two narrow columns; profile/lexicon tables are
tiny and broadcast. No Python UDFs anywhere — pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import rnd, sql_rnd
from ..io import load
from ..ops.dist_rank import distributed_prefix, ntile_from_rank
from ..ops.parallel import fan_out
from ..ops.text import STOPWORDS, shingles, sql_shingles, tokens
from ..registry import register

_TOK_SQL = "SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS token FROM documents"
_STOP_IN = "('" + "', '".join(STOPWORDS) + "')"


def _tok(spark, sf_dir):
    # fan_out measured a LOSS for _tok consumers (round-11 interleaved A/B:
    # tokenize_counts 0.56 -> 0.98 s, tfidf 1.52 -> 2.39 s): split+explode
    # are cheap codegen — the added exchange's stage overhead exceeds the
    # single-core tokenize cost at any consumer. Left on the scan split.
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", "source", F.explode(tokens(F.col("text"))).alias("token")
    )


@register(
    "text_tokenize_counts",
    oracle=f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM ({_TOK_SQL})
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
""",
    tier="T1",
)
def text_tokenize_counts(spark, sf_dir):
    """Global top-20 tokens by (count desc, token) — total order per §2.0."""
    return (
        _tok(spark, sf_dir)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@register(
    "text_stopword_filter",
    oracle=f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM ({_TOK_SQL})
WHERE token NOT IN {_STOP_IN}
GROUP BY token
""",
    tier="T2",
)
def text_stopword_filter(spark, sf_dir):
    """Token counts after removing the fixed stopword list."""
    return (
        _tok(spark, sf_dir)
        .filter(~F.col("token").isin(*STOPWORDS))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_ngrams",
    oracle="""
SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT lang, unnest(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bigram
  FROM documents
)
GROUP BY lang, bigram
""",
    tier="T2",
)
def text_ngrams(spark, sf_dir):
    """Bigram counts per language (index-zip over the token array).

    The token array is lambda-bound via a single-element transform so the
    split() runs once per row — Catalyst does not hoist loop-invariant
    subexpressions out of higher-order-function lambdas (BENCH.md lesson;
    referencing `arr` directly inside the index transform re-splits the
    text per element). A 1-token doc yields ZERO bigrams in both engines
    (Spark sequence(1, 0) would count DOWN, and element_at past the end is
    an ANSI crash — guarded with an explicit size >= 2 branch)."""
    d = load(spark, sf_dir, "documents")
    bigrams = F.expr(
        """
        element_at(transform(array(split(text, ' ')), a ->
          CASE WHEN size(a) >= 2 THEN
            transform(sequence(1, size(a) - 1),
              i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))
          ELSE array() END), 1)
        """
    )
    return (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_tfidf_topk",
    oracle=f"""
WITH tok AS ({_TOK_SQL}),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, {sql_rnd('tf * ln(CAST(n_docs AS DOUBLE) / df)', 4)} AS score,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT tf.doc_id, tf.token, tf.tf, df.df, n.n_docs,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                                     tf.token) AS rk
  FROM tf JOIN df USING (token) CROSS JOIN n
)
WHERE rk <= 3
""",
    tier="T2",
)
def text_tfidf_topk(spark, sf_dir):
    """tf-idf: top-3 terms per doc, idf = ln(N/df), tie-break on token.

    Scale note: two aggregations over the exploded tokens + a broadcast join
    of the (tiny) df/N tables back onto tf — no per-doc collect.
    """
    tok = _tok(spark, sf_dir)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        tok.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = load(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_docs"))
    raw = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(raw.desc(), "token")
    return (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", rnd(raw, 4).alias("score"), "rk")
    )


@register(
    "text_lang_stats",
    oracle=f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       {sql_rnd('CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)', 2)} AS avg_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
GROUP BY lang
""",
    tier="T1",
)
def text_lang_stats(spark, sf_dir):
    """Per-language doc count, avg length (exact int sum), distinct sources."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 2).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


_LEXICON = [("fast", 1), ("big", 1), ("fresh", 1), ("slow", -1), ("small", -1), ("dup", -1)]
_LEX_VALUES = ", ".join(f"('{t}', {w})" for t, w in _LEXICON)


@register(
    "text_sentiment_lexicon",
    oracle=f"""
WITH tok AS ({_TOK_SQL}),
lex(token, w) AS (VALUES {_LEX_VALUES}),
scores AS (
  SELECT t.doc_id, CAST(SUM(l.w) AS BIGINT) AS s
  FROM tok t JOIN lex l USING (token) GROUP BY 1
)
SELECT d.source,
       {sql_rnd('CAST(SUM(COALESCE(sc.s, 0)) AS DOUBLE) / COUNT(*)', 4)} AS mean_sentiment,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d LEFT JOIN scores sc ON d.doc_id = sc.doc_id
GROUP BY d.source
""",
    tier="T2",
)
def text_sentiment_lexicon(spark, sf_dir):
    """Lexicon-based sentiment (±1 word lists), mean score per source.

    The lexicon is a literal broadcast DataFrame — the standard shape for
    joining a small reference table onto an exploded token stream.
    """
    d = load(spark, sf_dir, "documents")
    lex = spark.createDataFrame(_LEXICON, "token string, w int")
    scores = (
        _tok(spark, sf_dir)
        .join(F.broadcast(lex), "token")
        .groupBy("doc_id")
        .agg(F.sum("w").cast("long").alias("s"))
    )
    return (
        d.join(scores, "doc_id", "left")
        .groupBy("source")
        .agg(
            rnd(
                F.sum(F.coalesce(F.col("s"), F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_sentiment"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@register(
    "text_length_analysis",
    oracle=f"""
SELECT lang,
       {sql_rnd('CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)', 2)} AS avg_chars,
       {sql_rnd('quantile_cont(n_chars, 0.5)', 4)} AS p50_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       {sql_rnd("CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)", 2)} AS avg_words
FROM documents
GROUP BY lang
""",
    tier="T2",
)
def text_length_analysis(spark, sf_dir):
    """Char/word length distribution stats per language."""
    d = load(spark, sf_dir, "documents").withColumn(
        "n_words", F.size(tokens(F.col("text"))).cast("long")
    )
    return d.groupBy("lang").agg(
        rnd(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 2).alias("avg_chars"),
        rnd(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50_chars"),
        F.max("n_chars").alias("max_chars"),
        rnd(F.sum("n_words").cast("double") / F.count(F.lit(1)), 2).alias("avg_words"),
    )


@register(
    "text_language_id",
    oracle=f"""
WITH tok AS ({_TOK_SQL}),
counts AS (SELECT lang, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
prof AS (
  SELECT lang AS cand_lang, token
  FROM (SELECT lang, token,
               row_number() OVER (PARTITION BY lang ORDER BY c DESC, token) AS rk
        FROM counts)
  WHERE rk <= 10
),
doc_tok AS (SELECT DISTINCT doc_id, lang, token FROM tok),
ovl AS (
  SELECT dt.doc_id, dt.lang, p.cand_lang, CAST(COUNT(*) AS BIGINT) AS overlap
  FROM doc_tok dt JOIN prof p USING (token)
  GROUP BY 1, 2, 3
)
SELECT doc_id, lang AS actual_lang, cand_lang AS predicted_lang, overlap
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY overlap DESC, cand_lang) AS rk
      FROM ovl)
WHERE rk = 1
""",
    tier="T2",
)
def text_language_id(spark, sf_dir):
    """N-gram-profile language ID: per-lang top-10 token profiles built from
    the corpus; each doc classified by max profile overlap (tie-break lang).

    Scale note: profiles are tiny (langs × 10) and broadcast; the only wide
    shuffle is the distinct over (doc, token).
    """
    tok = _tok(spark, sf_dir)
    counts = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    wprof = Window.partitionBy("lang").orderBy(F.col("c").desc(), "token")
    prof = (
        counts.withColumn("rk", F.row_number().over(wprof))
        .filter(F.col("rk") <= 10)
        .select(F.col("lang").alias("cand_lang"), "token")
    )
    doc_tok = tok.select("doc_id", "lang", "token").distinct()
    overlaps = (
        doc_tok.join(F.broadcast(prof), "token")
        .groupBy("doc_id", "lang", "cand_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    wbest = Window.partitionBy("doc_id").orderBy(F.col("overlap").desc(), "cand_lang")
    return (
        overlaps.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("actual_lang"),
            F.col("cand_lang").alias("predicted_lang"),
            "overlap",
        )
    )


_UNIQ_RATIO_SQL = (
    "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
    " / len(string_split(text, ' '))"
)
_STOP_RATIO_SQL = (
    f"CAST(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_IN})) AS DOUBLE)"
    " / len(string_split(text, ' '))"
)


@register(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
       {sql_rnd(_UNIQ_RATIO_SQL, 4)} AS uniq_ratio,
       {sql_rnd(_STOP_RATIO_SQL, 4)} AS stopword_ratio,
       {sql_rnd(f"({_UNIQ_RATIO_SQL}) * (1 - {_STOP_RATIO_SQL})", 4)} AS quality
FROM documents
""",
    tier="T2",
)
def text_quality_score(spark, sf_dir):
    """Heuristic quality scoring: uniqueness ratio × (1 − stopword ratio)."""
    d = load(spark, sf_dir, "documents")
    arr = tokens(F.col("text"))
    n_tok = F.size(arr)
    n_uniq = F.size(F.array_distinct(arr))
    n_stop = F.size(F.filter(arr, lambda t: t.isin(*STOPWORDS)))
    uniq_ratio = n_uniq.cast("double") / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_uniq"),
        rnd(uniq_ratio, 4).alias("uniq_ratio"),
        rnd(stop_ratio, 4).alias("stopword_ratio"),
        rnd(uniq_ratio * (F.lit(1) - stop_ratio), 4).alias("quality"),
    )


@register(
    "text_token_count",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace
FROM documents
""",
    tier="T2",
)
def text_token_count(spark, sf_dir):
    """Token counting two ways: whitespace split + BPE-ish regex pieces."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long").alias(
            "n_chars_nospace"
        ),
    )


# polynomial base 131 powers mod 1e9+7, j = 0..7
_POW = [1, 131, 17161, 2248091, 294499921, 579489385, 913108810, 617253277]
_MOD = 1_000_000_007
_POW_SQL = "[" + ", ".join(str(p) for p in _POW) + "]"


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       CAST(list_min(list_transform(
         generate_series(1, greatest(length(text) - 7, 1)),
         i -> CAST(list_sum(list_transform(generate_series(0, 7),
                j -> CAST(ascii(substr(text, CAST(i + j AS INT), 1)) AS BIGINT)
                     * ({_POW_SQL}[j + 1]))) AS BIGINT) % {_MOD})) AS BIGINT) AS fingerprint,
       CAST(greatest(length(text) - 7, 1) AS BIGINT) AS n_windows
FROM documents
""",
    tier="T2",
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprint: min of Karp-Rabin polynomial hashes over all
    8-char windows (winnowing building block) — pure integer math, identical
    in both engines.

    Implementation: Arrow-batched mapInPandas — code points via a utf-32
    reinterpret (vectorized ord), all windows as one strided int64 matmul
    mod p. Exact integer arithmetic, so parity with the SQL oracle is
    bit-for-bit (max term ≈ 1.1e6 · 1e9 · 8 « 2^63). Replaces an
    interpreted higher-order-function pipeline ~3× slower per batch.

    Scale note: linear per doc, no shuffle; the Arrow batch is the unit of
    work so executors stream arbitrarily long corpora.
    """
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def fp_batches(it):
        pw = np.array(_POW, dtype=np.int64)
        for pdf in it:
            fps = []
            for s in pdf["text"]:
                if s is None:
                    # NULL text → NULL fingerprint, exactly like the oracle's
                    # length(NULL)/generate_series(NULL) propagation
                    fps.append(None)
                    continue
                c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                if len(c) < 8:
                    # mirror the oracle exactly: its single padded window reads
                    # ascii(substr(..)) past the end as ascii('') = 0, i.e. the
                    # codepoints are zero-padded to the window width
                    c = np.pad(c, (0, 8 - len(c)))
                h = (sliding_window_view(c, 8) @ pw) % _MOD
                fps.append(int(h.min()))
            lens = pdf["text"].str.len()  # NaN for NULL text
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fingerprint": pd.array(fps, dtype="Int64"),
                    "n_windows": pd.array(
                        # NULL text → 1, because the oracle's
                        # greatest(length(NULL) - 7, 1) IGNORES the NULL arg
                        # (DuckDB and Spark greatest both skip NULLs)
                        [1 if pd.isna(x) else max(int(x) - 7, 1) for x in lens],
                        dtype="Int64",
                    ),
                }
            )

    # fan_out measured a LOSS here (round-11 A/B, 0.80 -> 1.22 s): the
    # window-hash numpy pass is light enough that the exchange dominates.
    return d.mapInPandas(fp_batches, "doc_id long, fingerprint long, n_windows long")


@register(
    "text_pii_redact",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '[a-z0-9._]+@[a-z0-9]+\.[a-z]+')) AS BIGINT)
         AS n_pii,
       regexp_replace(aug, '[a-z0-9._]+@[a-z0-9]+\.[a-z]+', '[EMAIL]', 'g')
         AS redacted
FROM (SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or '
               || 'admin.' || CAST(doc_id AS VARCHAR) || '@corp.net ' || text
               AS aug
      FROM documents) t
""",
    tier="T2",
)
def text_pii_redact(spark, sf_dir):
    """PII scrubbing for training corpora: count and mask email addresses
    with a single vectorized regexp pass (JVM-side, no Python). The fixture
    text is synthetic and PII-free, so two deterministic addresses are
    prepended per doc before scrubbing — the oracle checks the fully
    redacted text byte-for-byte.

    The pattern sticks to regex constructs Java and RE2 interpret
    identically (char classes, +, literal dot). Scale: linear per-row pass,
    no shuffle; at 100 TB this pipelines with the quality/lang filters in
    one stage."""
    d = load(spark, sf_dir, "documents")
    pat = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+"
    aug = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or admin."), F.col("doc_id").cast("string"),
        F.lit("@corp.net "), F.col("text"),
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias("n_pii"),
        F.regexp_replace(aug, pat, "[EMAIL]").alias("redacted"),
    )


@register(
    "text_html_strip",
    oracle=r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(aug, '<[^>]+>', ' ', 'g'),
                           ' +', ' ', 'g')) AS clean,
       CAST(len(regexp_extract_all(aug, '<[^>]+>')) AS BIGINT) AS n_tags
FROM (SELECT doc_id,
             '<html><body><h1>doc ' || CAST(doc_id AS VARCHAR)
               || '</h1><p class="x">' || replace(text, ' the ', ' <b>the</b> ')
               || '</p></body></html>' AS aug
      FROM documents) t
""",
    tier="T2",
)
def text_html_strip(spark, sf_dir):
    """Markup removal for crawled corpora: strip every tag with one
    vectorized regexp pass, collapse whitespace, count removed tags. The
    fixture text is markup-free, so deterministic HTML (wrapper + inline
    <b> around 'the') is synthesized first; the oracle byte-compares the
    cleaned text. Tag pattern '<[^>]+>' reads identically in Java and RE2.
    Scale: linear per-row, fuses with the rest of the cleaning stage."""
    d = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.lit("<html><body><h1>doc "), F.col("doc_id").cast("string"),
        F.lit('</h1><p class="x">'),
        F.regexp_replace(F.col("text"), " the ", " <b>the</b> "),
        F.lit("</p></body></html>"),
    )
    stripped = F.regexp_replace(aug, "<[^>]+>", " ")
    return d.select(
        "doc_id",
        F.trim(F.regexp_replace(stripped, " +", " ")).alias("clean"),
        F.size(F.regexp_extract_all(aug, F.lit("<[^>]+>"), F.lit(0)))
        .cast("bigint")
        .alias("n_tags"),
    )


@register(
    "dedup_url_canonicalize",
    oracle=r"""
SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_variants
FROM (
  SELECT regexp_replace(
           regexp_replace(lower(url), ':80/', '/', 'g'),
           '[?&]utm_[a-z]+=[^&]*', '', 'g') AS canonical
  FROM (SELECT 'HTTP://Docs.Example.com:80/doc/'
                 || CAST(doc_id % 25 AS VARCHAR)
                 || CASE WHEN doc_id % 2 = 0
                         THEN '?utm_source=' || source ELSE '' END AS url
        FROM documents) u
) c
GROUP BY canonical
HAVING COUNT(*) > 1
""",
    tier="T2",
)
def dedup_url_canonicalize(spark, sf_dir):
    """Crawl-frontier URL dedup: canonicalize (lowercase, strip default
    :80 port, drop utm_* tracking params) then group — URL variants that
    differ only in case/port/tracking collapse to one canonical form. The
    synthesized URLs alias doc_id mod 25 (≥2 variants per canonical even
    at sf0.001's 50 docs — the r1 mod-500 fixture produced 0 rows at
    sf0.01, a vacuous pass flagged in VERDICT r1) and carry `source` in a
    stripped utm param so raw URLs still differ. Same string pipeline in
    both engines."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTP://Docs.Example.com:80/doc/"),
        (F.col("doc_id") % 25).cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit("?utm_source="), F.col("source"))
        ).otherwise(F.lit("")),
    )
    canonical = F.regexp_replace(
        F.regexp_replace(F.lower(url), ":80/", "/"),
        r"[?&]utm_[a-z]+=[^&]*",
        "",
    )
    return (
        d.select(canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_variants"))
        .filter(F.col("n_variants") > 1)
    )


_N_EVAL = 5  # doc_id < 5 plays the held-out eval set

_CONTAM_SQL = f"""
WITH eval_sh AS (
  SELECT DISTINCT unnest({sql_shingles('text')}) AS s
  FROM documents WHERE doc_id < {_N_EVAL}
),
corpus_sh AS (
  SELECT doc_id, unnest({sql_shingles('text')}) AS s
  FROM documents WHERE doc_id >= {_N_EVAL}
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_overlap_shingles
FROM corpus_sh c JOIN eval_sh e ON c.s = e.s
GROUP BY c.doc_id
"""


@register("text_contamination_ngram", oracle=_CONTAM_SQL, tier="T2")
def text_contamination_ngram(spark, sf_dir):
    """Benchmark-contamination check: flag training docs sharing ≥1 verbatim
    5-token shingle with a held-out eval set (here: the 5 lowest doc_ids) —
    the standard n-gram-collision screen run before an LLM training corpus
    ships. Emits each contaminated doc with its overlapping-shingle count.

    Scale note: the eval side is tiny by construction, so its distinct
    shingle set BROADCASTS — the 100 TB corpus is scanned once, shingles
    stream through a broadcast-hash semi-join, and only matching (doc,
    shingle) rows reach the one aggregate. No corpus-wide shuffle on text.
    """
    d = load(spark, sf_dir, "documents")
    eval_sh = (
        d.filter(F.col("doc_id") < _N_EVAL)
        .select(F.explode(shingles(F.col("text"))).alias("s"))
        .distinct()
    )
    corpus_sh = d.filter(F.col("doc_id") >= _N_EVAL).select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("s")
    )
    return (
        corpus_sh.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap_shingles"))
    )


# ------------------------------------------------------------------- BM25
_BM25_TERMS = ("hash", "join", "scan")
_BM25_K1, _BM25_B = 1.2, 0.75

# Per-(doc, term) BM25 contribution — ONE shared SQL fragment so Spark and
# DuckDB evaluate the identical IEEE operation sequence; summed across query
# terms in integer micro-units (conform.py technique) so the 3-term addition
# order cannot flip a bit.
_BM25_CONTRIB = (
    f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * {_BM25_K1 + 1}) "
    f"/ (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
)

_BM25_SQL = f"""
WITH tok AS ({_TOK_SQL}),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl) AS avgdl
          FROM documents),
qt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok WHERE token IN {str(_BM25_TERMS)}
       GROUP BY 1, 2),
dfq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok WHERE token IN {str(_BM25_TERMS)} GROUP BY 1),
contrib AS (
  SELECT qt.doc_id,
         CAST(FLOOR(({_BM25_CONTRIB}) * 1000000 + 0.5) AS BIGINT) AS c_micro
  FROM qt JOIN dfq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, {sql_rnd('CAST(SUM(c_micro) AS DOUBLE) / 1000000', 4)} AS bm25
FROM contrib
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


@register("text_bm25_search", oracle=_BM25_SQL, tier="T2")
def text_bm25_search(spark, sf_dir):
    """Okapi BM25 (k1=1.2, b=0.75, Lucene idf) top-20 documents for a fixed
    query — the retrieval scorer a training-data curation stack uses for
    targeted corpus search and decontamination probes.

    Determinism: the per-(doc, term) contribution is one shared SQL fragment
    evaluated by both engines, then rounded to integer micro-units BEFORE
    the cross-term sum — float addition order can't flip the hash.

    Scale note: query terms filter the exploded token stream BEFORE any
    aggregation (predicate pushdown to the scan), so tf/df shuffles carry
    only matching rows; df and corpus stats are tiny broadcasts; top-20 is
    TakeOrderedAndProject, no global sort.
    """
    tok = _tok(spark, sf_dir).select("doc_id", "token")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    d = load(spark, sf_dir, "documents")
    stats = d.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        F.broadcast(dl.agg((F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")))
    )
    q = tok.filter(F.col("token").isin(*_BM25_TERMS))
    tf = q.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfq = q.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(f"CAST(FLOOR(({_BM25_CONTRIB}) * 1000000 + 0.5) AS BIGINT)").alias(
                "c_micro"
            ),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg((F.sum("c_micro").cast("double") / F.lit(1000000)).alias("s"))
        .select("doc_id", rnd(F.col("s"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


# -------------------------------------------------------- repetition ratio
_REP_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
base AS (
  SELECT doc_id, ts,
         CASE WHEN len(ts) < 2 THEN []
              ELSE list_transform(generate_series(1, len(ts) - 1),
                                  i -> ts[i] || ' ' || ts[i + 1]) END AS bg
  FROM t
),
bgc AS (
  SELECT doc_id, b.bigram, COUNT(*) AS c
  FROM base, unnest(bg) AS b(bigram)
  GROUP BY 1, 2
),
top_bg AS (SELECT doc_id, MAX(c) AS top_c FROM bgc GROUP BY doc_id)
SELECT base.doc_id,
       CAST(len(ts) AS BIGINT) AS n_tokens,
       {sql_rnd('CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts)', 4)} AS distinct_ratio,
       CASE WHEN len(ts) < 2 THEN NULL
            ELSE {sql_rnd('CAST(top_bg.top_c AS DOUBLE) / (len(ts) - 1)', 4)} END AS top_bigram_frac
FROM base LEFT JOIN top_bg ON base.doc_id = top_bg.doc_id
WHERE len(ts) > 0
"""


@register("text_repetition_ratio", oracle=_REP_SQL, tier="T2")
def text_repetition_ratio(spark, sf_dir):
    """Gopher-style repetition quality signals per doc: distinct-token ratio
    and the fraction of bigrams taken by the single most frequent bigram —
    the screens that catch looping/boilerplate text a perplexity filter
    misses.

    Scale note: one explode over bigrams + two map-side-combinable
    aggregates keyed by doc; the bigram array is built with the token array
    lambda-bound so split() runs once per row, and the sequence() guard
    avoids Spark's descending sequence(1, 0) on 1-token docs.
    """
    d = load(spark, sf_dir, "documents")
    # Fully MAP-ONLY: bigram identity = xxhash64 over the 2-token slice
    # (tokens contain no spaces, so slice equality ⇔ joined-string
    # equality); the most-frequent-bigram count is a per-row run-length
    # fold over the SORTED hash array — no explode, no shuffle, the whole
    # key is one codegen'd projection (was explode + two shuffles).
    base = d.select(
        "doc_id",
        F.split("text", " ").alias("ts"),
    ).withColumn(
        "bg",
        F.expr(
            "CASE WHEN size(ts) < 2 THEN array() "
            "ELSE transform(sequence(1, size(ts) - 1), "
            "i -> xxhash64(slice(ts, i, 2))) END"
        ),
    ).filter(F.size("ts") > 0)
    # max run length in sort_array(bg) == max bigram multiplicity
    top_c = F.expr(
        "CASE WHEN size(ts) < 2 THEN CAST(NULL AS BIGINT) ELSE "
        "aggregate(sort_array(bg), "
        "named_struct('prev', CAST(NULL AS BIGINT), 'run', CAST(0 AS BIGINT), "
        "             'best', CAST(0 AS BIGINT)), "
        "(acc, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(x <=> acc.prev, acc.run + 1, CAST(1 AS BIGINT)), "
        "  'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, CAST(1 AS BIGINT)))), "
        "acc -> acc.best) END"
    )
    return base.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        rnd(
            F.size(F.array_distinct("ts")).cast("double") / F.size("ts"), 4
        ).alias("distinct_ratio"),
        F.when(F.size("ts") < 2, F.lit(None).cast("double")).otherwise(
            rnd(top_c.cast("double") / (F.size("ts") - 1), 4)
        ).alias("top_bigram_frac"),
    )


# ------------------------------------------------------------- RAKE keywords
_RAKE_TOPN = 20

_RAKE_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE text IS NOT NULL
),
tok AS (
  SELECT doc_id, g.pos AS pos, ts[g.pos] AS token,
         CASE WHEN ts[g.pos] IN {_STOP_IN} THEN 1 ELSE 0 END AS is_stop
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS pos) g
),
marked AS (
  SELECT doc_id, pos, token, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS phrase_id
  FROM tok
),
words AS (SELECT doc_id, phrase_id, pos, token FROM marked WHERE is_stop = 0),
phrases AS (
  SELECT doc_id, phrase_id,
         string_agg(token, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM words GROUP BY doc_id, phrase_id
),
wstat AS (
  SELECT w.token,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(p.plen) AS BIGINT) AS degree
  FROM words w JOIN phrases p
    ON w.doc_id = p.doc_id AND w.phrase_id = p.phrase_id
  GROUP BY w.token
),
scored AS (
  SELECT p.phrase, p.plen,
         CAST(SUM(s.degree * 1000000 // s.freq) AS BIGINT) AS score_micro
  FROM words w
  JOIN phrases p ON w.doc_id = p.doc_id AND w.phrase_id = p.phrase_id
  JOIN wstat s ON s.token = w.token
  GROUP BY p.doc_id, p.phrase_id, p.phrase, p.plen
)
SELECT DISTINCT phrase, CAST(plen AS BIGINT) AS n_words,
       (FLOOR(CAST(score_micro AS DOUBLE) / 1000000 * 10000 + 0.5) / 10000) AS rake
FROM scored
ORDER BY rake DESC, phrase
LIMIT {_RAKE_TOPN}
"""


@register("text_rake_keywords", oracle=_RAKE_SQL, tier="T2")
def text_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction: stopword-delimited candidate phrases,
    word score = degree/frequency over the phrase co-occurrence graph,
    phrase score = Σ word scores; corpus top-20 phrases — the classic
    unsupervised keyword extractor for corpus topic profiling.

    Determinism: word scores are integer floor-divisions in micro-units
    (degree·1e6 DIV freq) summed exactly per phrase; identical phrase
    TEXT implies identical word multiset implies identical score, so the
    cross-doc DISTINCT is well-defined; (rake DESC, phrase) pins the cut.

    Scale note: phrase segmentation is one keyed window (running stopword
    count per doc); word stats and phrase scoring are joins keyed by
    token / (doc, phrase) — explode-heavy but shuffle-bounded like the
    rest of the text family; the word-stat table is vocabulary-sized and
    broadcastable.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "token",
        F.when(F.col("token").isin(*STOPWORDS), 1).otherwise(0).alias("is_stop"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = tok.withColumn("phrase_id", F.sum("is_stop").over(w))
    words = marked.filter(F.col("is_stop") == 0).select(
        "doc_id", "phrase_id", "pos", "token"
    )
    phrases = words.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    wstat = (
        words.join(phrases.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"])
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree"))
    )
    scored = (
        words.join(phrases, ["doc_id", "phrase_id"])
        .join(F.broadcast(wstat), "token")
        .groupBy("doc_id", "phrase_id", "phrase", "plen")
        .agg(F.sum(F.expr("degree * 1000000 DIV freq")).alias("score_micro"))
    )
    return (
        scored.select(
            "phrase",
            F.col("plen").cast("long").alias("n_words"),
            (
                F.floor(
                    F.col("score_micro").cast("double") / 1000000 * 10000 + F.lit(0.5)
                )
                / 10000
            ).alias("rake"),
        )
        .distinct()
        .orderBy(F.col("rake").desc(), "phrase")
        .limit(_RAKE_TOPN)
    )


_LINE_DEDUP_W = 10  # tokens per pseudo-line (the fixture has no newlines)
_LINE_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
chunks AS (
  SELECT doc_id, i AS idx,
         array_to_string(ts[(i*{_LINE_DEDUP_W}+1):(i*{_LINE_DEDUP_W}+{_LINE_DEDUP_W})], ' ') AS chunk
  FROM toks,
       unnest(generate_series(0, CAST(ceil(len(ts)/{_LINE_DEDUP_W}.0) AS BIGINT) - 1)) AS g(i)
),
cdf AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk),
kept AS (
  SELECT c.doc_id, c.idx, c.chunk, (d.df <= 1) AS keep
  FROM chunks c JOIN cdf d ON c.chunk = d.chunk
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       (FLOOR(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
              * 1000000 + 0.5) / 1000000) AS retention,
       -- COALESCE: a fully-boilerplate doc keeps nothing; its cleaned text
       -- is the EMPTY string (length 0), matching Spark's array_join([])
       CAST(COALESCE(length(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY idx)), 0) AS BIGINT)
         AS clean_chars
FROM kept GROUP BY doc_id
"""


@register("text_line_dedup", oracle=_LINE_DEDUP_SQL, tier="T2")
def text_line_dedup(spark, sf_dir):
    """CCNet-style line-level boilerplate removal — THE standard web-corpus
    cleaning pass: split every document into lines (here fixed 10-token
    pseudo-lines, since the fixture text has no newlines), drop every line
    whose exact text occurs in MORE THAN ONE document (headers, footers,
    nav boilerplate), and report per-document retention + cleaned length.

    Scale notes: one explode to (doc_id, idx, line) narrow rows, one
    line-keyed aggregate for document frequency (map-side combinable), one
    join back on the line key, one doc-keyed aggregate to reassemble —
    all shuffle keys are either the line text or doc_id, nothing
    quadratic, no broadcast required (the df table scales with corpus
    size and stays on the shuffle path).
    """
    d = load(spark, sf_dir, "documents")
    w = _LINE_DEDUP_W
    ts = F.split(F.col("text"), " ")
    chunk_arr = F.expr(
        f"transform(sequence(0, cast(ceil(size(split(text, ' '))/{w}.0) as int) - 1), "
        f"i -> array_join(slice(split(text, ' '), i*{w}+1, {w}), ' '))"
    )
    chunks = d.select(
        "doc_id", F.posexplode(chunk_arr).alias("idx", "chunk")
    )
    cdf = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("df")
    )
    kept = chunks.join(cdf, "chunk").select(
        "doc_id", "idx", "chunk", (F.col("df") <= 1).alias("keep")
    )
    clean_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("keep"), F.struct("idx", "chunk")).otherwise(None)
                )
            ),
            lambda s: s.getField("chunk"),
        ),
        " ",
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        (
            F.floor(
                F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("retention"),
        F.length(clean_text).cast("long").alias("clean_chars"),
    )


@register(
    "text_readability_fk",
    oracle="""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       FLOOR(((CAST(39 AS DOUBLE) / 100)
                * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
              + (CAST(118 AS DOUBLE) / 10)
                * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
              - CAST(1559 AS DOUBLE) / 100) * 10000 + 0.5) / 10000
         AS fk_grade
FROM m
""",
    tier="T2",
)
def text_readability_fk(spark, sf_dir):
    """Flesch-Kincaid grade-level readability per document — the classic
    text-complexity quality signal (pretraining mixes are often curated by
    readability band; a corpus whose FK distribution drifts has a
    composition problem). Syllables use the standard vowel-group heuristic
    (runs of [aeiouy] in the lowercased text), sentences count terminal
    punctuation runs (floor 1 so fragment-only docs stay defined).

    Determinism: all three counts are exact integers from identical
    regexes in both engines; the grade is one fixed IEEE expression over
    them (the constants 0.39 / 11.8 / 15.59 are spelled as exact integer
    divisions so both engines round identically), half-up 4dp. Empty text
    counts 1 whitespace "word" and 0 syllables in both engines (split('',
    ' ') yields ['']); NULL text propagates NULL rows in both.

    Scale note: map-only (regexp_count is codegen) — no shuffle at all;
    the cost is linear regex scans of each document, the same budget as
    text_token_count.
    """
    d = load(spark, sf_dir, "documents")
    n_words = F.size(tokens(F.col("text"))).cast("long")
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    ).cast("long")
    n_syl = F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).cast("long")
    grade = (
        (F.lit(39).cast("double") / 100)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        + (F.lit(118).cast("double") / 10)
        * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
        - F.lit(1559).cast("double") / 100
    )
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            n_syl.alias("n_syllables"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syllables",
            (F.floor(grade * 10000 + F.lit(0.5)) / 10000).alias("fk_grade"),
        )
    )


@register(
    "text_template_groups",
    oracle="""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(lower(text), '[0-9]+', '#', 'g') AS tpl
  FROM documents WHERE text IS NOT NULL
),
grp AS (
  SELECT tpl, CAST(COUNT(*) AS BIGINT) AS support,
         CAST(MIN(doc_id) AS BIGINT) AS exemplar_doc,
         CAST(length(tpl) AS BIGINT) AS tpl_len
  FROM norm GROUP BY tpl
)
SELECT support, exemplar_doc, tpl_len
FROM grp WHERE support >= 2
""",
    tier="T2",
)
def text_template_groups(spark, sf_dir):
    """Template-level duplicate detection: documents that are identical
    after masking every digit run to '#' collapse into one template group
    (support ≥ 2 reported with an exemplar) — the log-line /
    boilerplate-with-IDs dedup pass that exact hashing misses (\"order
    12345 shipped\" ≡ \"order 99871 shipped\") and shingle Jaccard
    over-pays for. The canonical pre-dedup normalizer for machine-
    generated text in a pretraining corpus.

    Determinism: the digit-mask regex is identical in both engines
    (DuckDB needs the 'g' flag; Spark's regexp_replace is global by
    default); groups aggregate exact counts and a MIN exemplar. The
    template string itself stays OUT of the output (scalar-only contract);
    its length + exemplar pin identity.

    Scale note: map-side normalize, one partial+final aggregate on the
    template hash — identical shape (and cost) to dedup_exact; at 100 TB
    group on xxhash64(tpl) instead of the raw string to keep shuffle rows
    narrow.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    norm = d.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "#").alias("tpl"),
    )
    return (
        norm.groupBy("tpl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("support"),
            F.min("doc_id").cast("long").alias("exemplar_doc"),
        )
        .filter(F.col("support") >= 2)
        .select("support", "exemplar_doc", F.length("tpl").cast("long").alias("tpl_len"))
    )


_JS_SQL = """
WITH tok AS (
  SELECT COALESCE(TRY_CAST(regexp_extract(source, '[0-9]+$') AS BIGINT),
                  CAST(length(source) AS BIGINT)) % 2 AS grp,
         unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
cnt AS (
  SELECT token,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM tok GROUP BY token
),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb
        FROM cnt),
term AS (
  SELECT token, ca, cb,
         CAST(FLOOR((
           CASE WHEN ca > 0 THEN
             (CAST(5 AS DOUBLE) / 10) * (CAST(ca AS DOUBLE) / ta)
             * ln((CAST(ca AS DOUBLE) / ta)
                  / (((CAST(ca AS DOUBLE) / ta) + (CAST(cb AS DOUBLE) / tb))
                     / 2)) ELSE CAST(0 AS DOUBLE) END
           +
           CASE WHEN cb > 0 THEN
             (CAST(5 AS DOUBLE) / 10) * (CAST(cb AS DOUBLE) / tb)
             * ln((CAST(cb AS DOUBLE) / tb)
                  / (((CAST(ca AS DOUBLE) / ta) + (CAST(cb AS DOUBLE) / tb))
                     / 2)) ELSE CAST(0 AS DOUBLE) END
         ) * 1000000000) AS BIGINT) AS term_u
  FROM cnt CROSS JOIN tot
),
js AS (SELECT CAST(SUM(term_u) AS BIGINT) AS js_u FROM term)
SELECT t.token, t.ca, t.cb, t.term_u,
       FLOOR(CAST(js.js_u AS DOUBLE) / 1000000000 * 1000000 + 0.5) / 1000000
         AS js_total
FROM term t CROSS JOIN js
ORDER BY t.term_u DESC, t.token LIMIT 20
"""


@register("text_js_divergence", oracle=_JS_SQL, tier="T2")
def text_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence between the word distributions of two
    corpus halves (even vs odd trailing source number; non-numbered
    sources fall back to name length, so foreign snapshots still split
    deterministically) — the bounded, symmetric
    corpus-drift metric (0 = identical mixes, ln2 = disjoint) that data
    curation uses to compare snapshots, detect source contamination, and
    gate mixture changes; KL alone is infinite on any vocabulary gap,
    which is exactly why JS is the curation standard. Emits the top-20
    contributing tokens (the drift EXPLANATION) alongside the total.

    Determinism: counts and totals are exact ints; each token's JS term
    is ONE fixed IEEE expression (exact-ratio probabilities, the 0·ln0
    guard spelled as CASE) floored to 1e-9 units BEFORE the cross-token
    sum — the text_unigram_logprob ln-quantization recipe; the top-20 cut
    is the total order (term_u DESC, token).

    Scale note: one token-explode aggregate keyed by token (the tf-idf
    shuffle), a 1-row totals broadcast, and a TakeOrderedAndProject —
    vocabulary-bound, not corpus-bound, after the first aggregate.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        (
            F.coalesce(
                F.expr("try_cast(regexp_extract(source, '[0-9]+$', 0) AS BIGINT)"),
                F.length("source").cast("long"),
            )
            % 2
        ).alias("grp"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    cnt = tok.groupBy("token").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("cb"),
    )
    tot = cnt.agg(
        F.sum("ca").cast("long").alias("ta"), F.sum("cb").cast("long").alias("tb")
    )
    half = F.lit(5).cast("double") / 10
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    m = (pa + pb) / 2
    expr = (
        F.when(F.col("ca") > 0, half * pa * F.log(pa / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, half * pb * F.log(pb / m)).otherwise(F.lit(0.0))
    )
    term = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        "ca",
        "cb",
        F.floor(expr * 1000000000).cast("long").alias("term_u"),
    )
    js = term.agg(F.sum("term_u").cast("long").alias("js_u"))
    return (
        term.crossJoin(F.broadcast(js))
        .select(
            "token",
            "ca",
            "cb",
            "term_u",
            (
                F.floor(F.col("js_u").cast("double") / 1000000000 * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("js_total"),
        )
        .orderBy(F.col("term_u").desc(), "token")
        .limit(20)
    )


_HEAPS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
firsts AS (
  SELECT token, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM tok
  GROUP BY token
),
newv AS (
  SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM firsts GROUP BY first_doc
),
toks AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM tok GROUP BY doc_id
),
curve AS (
  SELECT t.doc_id,
         CAST(SUM(t.n_tokens) OVER w AS BIGINT) AS cum_tokens,
         CAST(SUM(COALESCE(n.new_types, 0)) OVER w AS BIGINT) AS cum_vocab
  FROM toks t LEFT JOIN newv n ON n.doc_id = t.doc_id
  WINDOW w AS (ORDER BY t.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id, cum_tokens, cum_vocab
FROM curve WHERE doc_id % 50 = 0
"""


@register("text_vocab_growth", oracle=_HEAPS_SQL, tier="T2")
def text_vocab_growth(spark, sf_dir):
    """Vocabulary-growth (Heaps' law) curve: cumulative distinct word
    types vs cumulative tokens in doc_id order, sampled every 50 docs —
    the corpus-health curve (vocab should grow ~K·nᵝ, β≈0.5; a kink
    means a new source/language joined the mix; a plateau means heavy
    duplication — the macroscopic twin of the dedup suite). Computed
    WITHOUT any running-distinct state: each type contributes at its
    FIRST document, so cumulative vocab = running sum of first-occurrence
    counts — one aggregate + one window, no O(vocab) state.

    Determinism: exact integer counts; the curve is a cumulative sum over
    the total doc_id order. Scale note: the token→min(doc) aggregate is
    the tf-idf shuffle; the running sums are the DISTRIBUTED two-phase
    prefix sums (ops/dist_rank.py: DIV-bucket on the dense doc_id,
    per-bucket subtotals → broadcast exclusive offsets, within-bucket
    cumsum + offset), never an unpartitioned O(|docs|) window.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    firsts = tok.groupBy("token").agg(F.min("doc_id").cast("long").alias("first_doc"))
    newv = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    toks = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    grain = toks.join(newv, "doc_id", "left").select(
        "doc_id", "n_tokens", F.coalesce("new_types", F.lit(0)).alias("new0")
    )
    curve = distributed_prefix(
        grain,
        F.col("doc_id"),
        ["doc_id"],
        sums={"cum_tokens": "n_tokens", "cum_vocab": "new0"},
    ).select(
        "doc_id",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
    )
    return curve.filter(F.col("doc_id") % 50 == 0)


_WINNOW_W = 4  # winnowing window over the k-gram hash sequence


@register(
    "text_winnowing",
    oracle=f"""
WITH h AS (
  SELECT doc_id, g.i AS pos,
         CAST(list_sum(list_transform(generate_series(0, 7),
                j -> CAST(ascii(substr(text, CAST(g.i + j AS INT), 1)) AS BIGINT)
                     * ({_POW_SQL}[j + 1]))) AS BIGINT) % {_MOD} AS h
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i) g
  WHERE text IS NOT NULL
),
w AS (
  SELECT doc_id, pos AS wstart,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS wmin,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS wlen,
         MAX(pos) OVER (PARTITION BY doc_id) AS npos
  FROM h
),
wf AS (
  SELECT * FROM w WHERE wlen = {_WINNOW_W} OR (wstart = 1 AND npos < {_WINNOW_W})
),
sel AS (
  SELECT f.doc_id, f.wstart, MAX(h2.pos) AS spos
  FROM wf f JOIN h h2 ON h2.doc_id = f.doc_id
        AND h2.pos BETWEEN f.wstart AND f.wstart + {_WINNOW_W - 1}
        AND h2.h = f.wmin
  GROUP BY f.doc_id, f.wstart
),
selh AS (
  SELECT DISTINCT s.doc_id, s.spos, h.h
  FROM sel s JOIN h ON h.doc_id = s.doc_id AND h.pos = s.spos
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct,
       CAST(SUM(DISTINCT h) AS BIGINT) AS fp_sum,
       CAST(MIN(h) AS BIGINT) AS fp_min,
       CAST(MAX(h) AS BIGINT) AS fp_max
FROM selh GROUP BY doc_id
""",
    tier="T2",
)
def text_winnowing(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): Karp-Rabin hashes of all 8-char windows (same base-131
    family as text_fingerprint), then from every window of 4 consecutive
    hashes select the RIGHTMOST minimum — the guarantee is that any shared
    substring of length ≥ 11 (k + w − 1) yields a shared fingerprint, which
    is what makes it the standard partial-overlap dedup signature.
    Emitted per doc as a scalar summary of the selected set (count,
    distinct count, Σ distinct, min, max) so the check is exact.

    Cross-engine determinism: hashes are exact int64 polynomial sums mod
    1e9+7; selection is pure integer comparison with an explicit tie rule
    (rightmost = MAX(pos) of the window minimum — numpy spells it as
    argmin over the reversed window). NULL text excluded on both sides;
    docs shorter than k zero-pad one window, and the single sub-w window
    of a short hash sequence is kept (wstart = 1, npos < w).

    Scale note: map-only Arrow-batched numpy per doc (vectorized
    sliding-window matmul + reversed argmin) — no shuffle, linear in
    corpus size; the oracle's window-frame + join-back spelling is the
    portable SQL equivalent. At 100 TB the selected-fingerprint rows
    (~2/w per token) would feed the same posting-list pair generation the
    jaccard/minhash keys use.
    """
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    d = load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    w = _WINNOW_W

    def winnow(it):
        pw = np.array(_POW, dtype=np.int64)
        for pdf in it:
            out = {
                "doc_id": [], "n_selected": [], "n_distinct": [],
                "fp_sum": [], "fp_min": [], "fp_max": [],
            }
            for doc_id, s in zip(pdf["doc_id"], pdf["text"]):
                c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                if len(c) < 8:
                    c = np.pad(c, (0, 8 - len(c)))  # zero-pad: ascii('') = 0
                h = (sliding_window_view(c, 8) @ pw) % _MOD
                if len(h) <= w:
                    # single (possibly short) window: rightmost min
                    spos = np.array([len(h) - 1 - int(np.argmin(h[::-1]))])
                else:
                    wins = sliding_window_view(h, w)
                    # argmin over reversed windows → rightmost minimum
                    ridx = w - 1 - np.argmin(wins[:, ::-1], axis=1)
                    spos = np.unique(np.arange(len(wins)) + ridx)
                fps = np.unique(h[spos])
                out["doc_id"].append(doc_id)
                out["n_selected"].append(len(spos))
                out["n_distinct"].append(len(fps))
                out["fp_sum"].append(int(fps.sum()))
                out["fp_min"].append(int(fps[0]))
                out["fp_max"].append(int(fps[-1]))
            if out["doc_id"]:
                yield pd.DataFrame(out)

    # fan_out measured a WIN here (round-11 interleaved A/B, 1.34 -> 0.80 s):
    # the per-doc winnowing fold is real numpy work worth spreading.
    return fan_out(d).mapInPandas(
        winnow,
        "doc_id long, n_selected long, n_distinct long, fp_sum long, "
        "fp_min long, fp_max long",
    )


@register(
    "text_bigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, g.i AS pos, toks[g.i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE text IS NOT NULL),
       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
),
vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tok),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1),
c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY w1, w2),
lp AS (
  SELECT c12.w1, c12.w2,
         CAST(FLOOR(ln(CAST(c12.n12 + 1 AS DOUBLE) / (c1.n1 + (SELECT v FROM vocab)))
              * 1000000) AS BIGINT) AS lp_units
  FROM c12 JOIN c1 USING (w1)
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       (FLOOR(CAST(SUM(l.lp_units) AS DOUBLE) / 1000000 / COUNT(*) * 10000 + 0.5)
        / 10000) AS avg_logprob
FROM big b JOIN lp l ON l.w1 = b.w1 AND l.w2 = b.w2
GROUP BY b.doc_id
""",
    tier="T2",
)
def text_bigram_logprob(spark, sf_dir):
    """Per-doc average bigram log-probability under the corpus's own add-1
    smoothed bigram LM — the next step up from text_unigram_logprob as a
    perplexity-proxy quality filter: p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V).
    Log-probs quantize to integer 1e-6 units BEFORE the per-doc sum (the
    conform trick: exact, order-independent summation).

    Scale note: bigrams come from a lead() window per doc (one shuffle on
    doc_id — at 100 TB tokens of one doc co-locate by construction); the
    bigram LM table is vocabulary²-bounded in principle but Zipf-sparse in
    practice and broadcast here; V is the audited 1-row broadcast.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    vocab = tok.agg(F.count_distinct("w").alias("v"))
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    big = tok.select(
        "doc_id", F.col("w").alias("w1"), F.lead("w").over(wnd).alias("w2")
    ).filter(F.col("w2").isNotNull())
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    lp = (
        c12.join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.floor(
                F.log((F.col("n12") + 1).cast("double") / (F.col("n1") + F.col("v")))
                * 1000000
            ).cast("long").alias("lp_units"),
        )
    )
    return (
        big.join(F.broadcast(lp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.floor(
                    F.sum("lp_units").cast("double")
                    / 1000000
                    / F.count(F.lit(1))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("avg_logprob"),
        )
    )


@register(
    "text_gopher_rules",
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         length(replace(text, ' ', '')) AS nchars,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         len(regexp_extract_all(text, '\\.\\.\\.')) AS n_ellipsis,
         len(list_filter(string_split(text, ' '),
                         t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha,
         len(list_distinct(list_filter(string_split(text, ' '),
                                       t -> t IN {_STOP_IN}))) AS n_stop
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       (FLOOR(CAST(nchars AS DOUBLE) / n_words * 10000 + 0.5) / 10000)
         AS mean_word_len,
       (n_words >= 3 AND n_words <= 100000) AS ok_word_count,
       (nchars >= 2 * n_words AND nchars <= 12 * n_words) AS ok_mean_len,
       (10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words) AS ok_symbols,
       (5 * n_alpha >= 4 * n_words) AS ok_alpha_words,
       (n_stop >= 2) AS ok_stopwords,
       (n_words >= 3 AND n_words <= 100000
        AND nchars >= 2 * n_words AND nchars <= 12 * n_words
        AND 10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words
        AND 5 * n_alpha >= 4 * n_words
        AND n_stop >= 2) AS gopher_pass
FROM g
""",
    tier="T2",
)
def text_gopher_rules(spark, sf_dir):
    """The Gopher/Falcon-style document quality ruleset — the standard
    pre-training corpus filter battery, each rule a named boolean: word
    count in [3, 100000]; mean word length in [2, 12] chars; symbol
    pollution (hash marks, ellipses) ≤ 10% of words; ≥ 80% of words
    contain an alphabetic character; ≥ 2 distinct stopwords present (the
    "is this prose at all" check). Emits the per-rule verdicts AND the
    conjunction, so downstream filtering can report WHY documents died —
    the operational requirement real corpus pipelines have that a bare
    quality score (text_quality_score) doesn't meet.

    Determinism: every threshold is an exact integer CROSS-MULTIPLICATION
    (nchars ≥ 2·n_words, not nchars/n_words ≥ 2.0) — no float ever
    reaches a boolean, so rule flips cannot happen at representation
    boundaries; the one reported ratio (mean word length) is half-up 4dp
    display only. n_words ≥ 1 always (split of '' is ['']), so no
    division guards needed.

    Scale note: map-only — per-document expressions in one codegen stage,
    no shuffle, no UDF; the stopword set is a literal IN-list. At 100 TB
    this is the cheapest possible shape: a scan that prunes to
    (doc_id, text) and emits booleans.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    arr = tokens(F.col("text"))
    n_words = F.size(arr)
    nchars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_hash = F.length(F.col("text")) - F.length(
        F.replace(F.col("text"), F.lit("#"), F.lit(""))
    )
    n_ellipsis = F.regexp_count(F.col("text"), F.lit(r"\.\.\."))
    n_alpha = F.size(F.filter(arr, lambda t: t.rlike("[a-zA-Z]")))
    n_stop = F.size(F.array_distinct(F.filter(arr, lambda t: t.isin(*STOPWORDS))))
    ok_wc = (n_words >= 3) & (n_words <= 100000)
    ok_ml = (nchars >= 2 * n_words) & (nchars <= 12 * n_words)
    ok_sym = (10 * n_hash <= n_words) & (10 * n_ellipsis <= n_words)
    ok_alpha = 5 * n_alpha >= 4 * n_words
    ok_stop = n_stop >= 2
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        rnd(nchars.cast("double") / n_words, 4).alias("mean_word_len"),
        ok_wc.alias("ok_word_count"),
        ok_ml.alias("ok_mean_len"),
        ok_sym.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_ml & ok_sym & ok_alpha & ok_stop).alias("gopher_pass"),
    )


_FERT_BPE = "SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))"
_FERT_WORDS = "SUM(len(string_split(text, ' ')))"
_FERT_BYTES = "SUM(octet_length(encode(text)))"


@register(
    "text_tokenizer_fertility",
    oracle=f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST({_FERT_WORDS} AS BIGINT) AS n_words,
       CAST({_FERT_BPE} AS BIGINT) AS n_bpe_tokens,
       CAST({_FERT_BYTES} AS BIGINT) AS n_bytes,
       {sql_rnd(f'CAST({_FERT_BPE} AS DOUBLE) / {_FERT_WORDS}', 4)}
         AS fertility,
       {sql_rnd(f'CAST({_FERT_BYTES} AS DOUBLE) / {_FERT_BPE}', 4)}
         AS bytes_per_token
FROM documents WHERE text IS NOT NULL
GROUP BY lang
""",
    tier="T2",
)
def text_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language — tokens-per-word and
    bytes-per-token, THE metrics tokenizer evaluations report (high
    fertility = the tokenizer fragments that language, inflating training
    cost and shrinking effective context): BPE-ish regex pieces over
    whitespace words, utf-8 bytes over pieces, aggregated per lang. A
    multilingual curation pipeline uses exactly this table to rebalance
    its corpus mix or grow the tokenizer vocab.

    Determinism: all three sums are exact int64 counts; each ratio is ONE
    IEEE divide of exact ints, half-up 4dp. Byte counts are utf-8
    (octet_length(encode()) ≡ Spark octet_length on string) so multibyte
    scripts measure honestly.

    Scale note: map-side counting (regexp_count / split sizes per row)
    into one partial+final aggregate keyed by lang — a ~languages-row
    result regardless of corpus size.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_words = F.size(tokens(F.col("text")))
    n_bpe = F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
    n_bytes = F.octet_length(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n_words).cast("long").alias("n_words"),
        F.sum(n_bpe).cast("long").alias("n_bpe_tokens"),
        F.sum(n_bytes).cast("long").alias("n_bytes"),
        rnd(F.sum(n_bpe).cast("double") / F.sum(n_words), 4).alias("fertility"),
        rnd(F.sum(n_bytes).cast("double") / F.sum(n_bpe), 4).alias(
            "bytes_per_token"
        ),
    )


@register(
    "text_perplexity_buckets",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
freq AS (
  SELECT token,
         CAST(FLOOR(ln(CAST(COUNT(*) AS DOUBLE) / (SELECT total FROM n)) * 1000000)
              AS BIGINT) AS lp_units
  FROM tok GROUP BY token
),
doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(f.lp_units) AS BIGINT) AS sum_u
  FROM tok t JOIN freq f USING (token)
  GROUP BY t.doc_id
),
scored AS (
  SELECT doc_id, n_tokens,
         -((-sum_u) * 1000 // n_tokens) AS score_u,
         {sql_rnd('CAST(sum_u AS DOUBLE) / 1000000 / n_tokens', 4)} AS avg_logprob
  FROM doc
)
SELECT doc_id, n_tokens, avg_logprob,
       CASE ntile(3) OVER (ORDER BY score_u DESC, doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM scored
""",
    tier="T2",
)
def text_perplexity_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail corpus split: score every document by
    its average unigram log-probability under the corpus's own LM (the
    text_unigram_logprob score), rank the corpus best-first, and cut it
    into perplexity TERCILES — 'head' = most in-distribution prose,
    'tail' = likely boilerplate/noise. This is the curation move CCNet
    popularized (train on head+middle, inspect or drop the tail) and the
    reason perplexity scores exist in a pipeline at all: the BUCKET, not
    the number, is what downstream mixing consumes.

    Determinism: per-doc sums of 1e-6-quantized log-probs are exact
    int64; the RANKING key is the integer milli-average
    −((−Σu)·1000 DIV n) — negation first so the floor-division runs on
    positives, where Spark's truncating DIV and DuckDB's flooring //
    agree (they diverge on negatives, the seq_time_to_convert hazard
    class) — tie-broken by doc_id, so every ntile boundary is pinned.
    The displayed avg is the usual half-up 4dp double.

    Scale note: LM build and per-doc scoring as in text_unigram_logprob
    (broadcast vocab table); the tercile split is NTILE(rank, n) over the
    distributed two-phase rank (ops/dist_rank.py — bucket key −score_u
    coarsens the score-desc order; never an unpartitioned O(|docs|)
    window), with n a broadcast 1-row count. At extreme scale swap ntile
    for fixed score thresholds learned on a sample to make it map-only.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    n = tok.agg(F.count(F.lit(1)).alias("total"))
    freq = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            F.floor(
                F.log(F.col("cnt").cast("double") / F.col("total")) * 1000000
            ).alias("lp_units"),
        )
    )
    doc = (
        tok.join(F.broadcast(freq), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lp_units").cast("long").alias("sum_u"),
        )
    )
    scored = doc.select(
        "doc_id",
        "n_tokens",
        F.expr("-((-sum_u) * 1000 DIV n_tokens)").alias("score_u"),
        rnd(F.col("sum_u").cast("double") / 1000000 / F.col("n_tokens"), 4).alias(
            "avg_logprob"
        ),
    )
    nd = scored.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ranked = distributed_prefix(
        scored.crossJoin(F.broadcast(nd)),
        -F.col("score_u"),
        [F.col("score_u").desc(), "doc_id"],
        rank="_r",
    )
    tile = ntile_from_rank(F.col("_r"), F.col("_n"), 3)
    return ranked.select(
        "doc_id",
        "n_tokens",
        "avg_logprob",
        F.when(tile == 1, "head")
        .when(tile == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ------------------------------------------------------------ BPE tokenizer


def _bpe_oracle() -> str:
    from .bpe_frozen import BPE_MERGES

    spaced = (
        "list_transform(string_split(coalesce(text, ''), ' '), "
        "w -> rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')))"
    )
    sym = f"' ' || array_to_string({spaced}, ' | ') || ' '"
    for left, right in BPE_MERGES:
        sym = f"replace({sym}, ' {left} {right} ', ' {left}{right} ')"
    toks = (
        f"len(list_filter(string_split(trim({sym}), ' '), "
        "s -> s <> '|' AND s <> ''))"
    )
    words = (
        "len(list_filter(string_split(coalesce(text, ''), ' '), w -> w <> ''))"
    )
    return f"""
WITH per_doc AS (
  SELECT lang,
         CAST({words} AS BIGINT) AS n_words,
         CAST({toks} AS BIGINT) AS n_tokens
  FROM documents
),
g AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_words) AS BIGINT) AS n_words,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM per_doc GROUP BY lang
)
SELECT lang, n_docs, n_words, n_tokens,
       CASE WHEN n_words = 0 THEN NULL
            ELSE (n_tokens * 1000000) // n_words END AS fertility_micro
FROM g
ORDER BY lang
"""


@register("text_bpe_apply", oracle=_bpe_oracle(), tier="T2")
def text_bpe_apply(spark, sf_dir):
    """Apply the frozen 24-merge BPE table (tools/bpe_freeze.py, trained on
    the sf0.1 word-frequency dict) to every document and report per-language
    token fertility — the real-tokenizer cost model a training pipeline uses
    for budget planning, next to text_tokenizer_fertility's heuristic.

    Semantics: each word becomes a space-separated character sequence; the
    doc joins words with ' | ' guards and leading/trailing spaces, then the
    merges are applied SEQUENTIALLY as literal global replaces of
    ' l r ' -> ' lr ' — left-to-right non-overlapping, continuing after the
    replacement, which all three engines (Java String.replace, DuckDB
    replace, Python str.replace) implement identically. The space-wrapped
    patterns make matches full-symbol-exact (no mid-symbol corruption) and
    the '|' guard blocks cross-word merges. This is the fast
    "apply-merges-in-training-order" BPE variant; the greedy
    rescan-after-each-merge variant can differ on adjacent repeated pairs
    (documented, deterministic in both engines either way).

    Determinism: pure string machinery — no floats until the final
    fertility, an integer cross-product with one truncating DIV of a
    non-negative numerator. NULL/empty text contributes 0 words, 0 tokens.
    Scale: per-doc map-only codegen (24 chained literal replaces), then one
    partial+final aggregate keyed by lang — no shuffle of document text.
    """
    from .bpe_frozen import BPE_MERGES

    d = load(spark, sf_dir, "documents")
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    spaced = F.transform(
        words, lambda w: F.rtrim(F.regexp_replace(w, "(.)", "$1 "))
    )
    sym = F.concat(F.lit(" "), F.array_join(spaced, " | "), F.lit(" "))
    for left, right in BPE_MERGES:
        sym = F.replace(
            sym, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
        )
    toks = F.size(
        F.filter(
            F.split(F.trim(sym), " "),
            lambda s: (s != F.lit("|")) & (s != F.lit("")),
        )
    )
    n_words = F.size(F.filter(words, lambda w: w != F.lit("")))
    per_doc = d.select(
        "lang",
        n_words.cast("long").alias("n_words"),
        toks.cast("long").alias("n_tokens"),
    )
    g = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens",
        F.when(F.col("n_words") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(n_tokens * 1000000) DIV n_words"))
        .alias("fertility_micro"),
    ).orderBy("lang")


_CODE_SYM = r"[;{}()\[\]=<>|&#]"

_CODE_DETECT_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '{_CODE_SYM}', '', 'g'))
              AS BIGINT) AS n_symbols,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digits,
         CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
           AS n_spaces
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
)
SELECT doc_id, n_chars, n_symbols, n_digits,
       CAST(n_symbols * 1000 // n_chars AS BIGINT) AS symbol_permille,
       CAST(n_digits * 1000 // n_chars AS BIGINT) AS digit_permille,
       CAST(CASE WHEN n_symbols * 100 > n_chars * 3
                   OR n_digits * 100 > n_chars * 15
                 THEN 1 ELSE 0 END AS BIGINT) AS is_code_like
FROM m
"""


@register("text_code_detect", oracle=_CODE_DETECT_SQL, tier="T2")
def text_code_detect(spark, sf_dir):
    """Code-vs-prose routing signal: per-doc counts of code-ish symbols
    (;{{}}()[]=<>|&#) and digits, permille densities, and an integer
    threshold flag (symbols > 3% OR digits > 15%) — the router a
    pretraining pipeline uses to send documents down the code or prose
    curation branch before [[text_gopher_rules]]-style gating.

    Determinism: counts via length-minus-stripped-length with the SAME
    regex class in both engines (DuckDB needs the explicit 'g' flag —
    the text_pii_redact lesson); thresholds are integer
    cross-multiplications so no float reaches the flag; densities one
    non-negative permille `//` each.

    Scale: map-only scan, pure codegen, embarrassingly parallel.
    """
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    n_chars = F.length("text").cast("long")
    n_sym = (
        F.length("text") - F.length(F.regexp_replace("text", _CODE_SYM, ""))
    ).cast("long")
    n_dig = (
        F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    ).cast("long")
    m = d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_sym.alias("n_symbols"),
        n_dig.alias("n_digits"),
    )
    return m.select(
        "doc_id",
        "n_chars",
        "n_symbols",
        "n_digits",
        F.expr("CAST(n_symbols * 1000 DIV n_chars AS BIGINT)").alias(
            "symbol_permille"
        ),
        F.expr("CAST(n_digits * 1000 DIV n_chars AS BIGINT)").alias(
            "digit_permille"
        ),
        F.expr(
            """CAST(CASE WHEN n_symbols * 100 > n_chars * 3
                           OR n_digits * 100 > n_chars * 15
                         THEN 1 ELSE 0 END AS BIGINT)"""
        ).alias("is_code_like"),
    )


_LANGMIX_SQL = f"""
WITH tok AS ({_TOK_SQL}),
counts AS (SELECT lang, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
prof AS (
  SELECT lang AS cand_lang, token
  FROM (SELECT lang, token,
               row_number() OVER (PARTITION BY lang ORDER BY c DESC, token) AS rk
        FROM counts)
  WHERE rk <= 10
),
doc_tok AS (SELECT DISTINCT doc_id, token FROM tok),
hits AS (
  SELECT dt.doc_id, p.cand_lang, CAST(COUNT(*) AS BIGINT) AS h
  FROM doc_tok dt JOIN prof p USING (token)
  GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(h) AS BIGINT) AS n_hits,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(SUM(h * CAST(FLOOR(ln(CAST(h AS DOUBLE)) * 1000000) AS BIGINT))
              AS BIGINT) AS sum_u,
         CAST(MAX(h) AS BIGINT) AS top1
  FROM hits GROUP BY doc_id
),
top2 AS (
  SELECT doc_id, CAST(MAX(h) AS BIGINT) AS second
  FROM (SELECT doc_id, h,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY h DESC, cand_lang) AS rk
        FROM hits)
  WHERE rk = 2 GROUP BY doc_id
)
SELECT p.doc_id, p.n_hits, p.n_langs,
       CAST(FLOOR(ln(CAST(p.n_hits AS DOUBLE)) * 1000000) AS BIGINT)
         - p.sum_u // p.n_hits AS mix_entropy_micronats,
       p.top1,
       COALESCE(t.second, 0) AS top2,
       CAST((p.top1 - COALESCE(t.second, 0)) * 1000000 // p.n_hits AS BIGINT)
         AS margin_micro
FROM per_doc p LEFT JOIN top2 t USING (doc_id)
"""


@register("text_language_mix", oracle=_LANGMIX_SQL, tier="T2")
def text_language_mix(spark, sf_dir):
    """Per-document language-MIX profile: entropy of the doc's hits across
    ALL language profiles plus the top1−top2 margin — the CONFIDENCE
    signal behind [[text_language_id]]'s argmax (CCNet-style pipelines
    gate on lang-ID confidence, not just the label; high mix entropy or a
    thin margin routes the doc to the multilingual/uncertain branch).

    Determinism: hit counts are exact ints; mix entropy uses the
    quantized-log identity (each ln floored to micro-nats BEFORE the
    per-doc sum); the margin is a non-negative micro `//`; top-2 comes
    from a deterministic (h desc, lang) rank; top1 is a plain MAX.

    Scale: identical shape to text_language_id (tiny broadcast profiles,
    one (doc, token) distinct shuffle, doc-keyed aggregates).
    """
    tok = _tok(spark, sf_dir)
    counts = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    wprof = Window.partitionBy("lang").orderBy(F.col("c").desc(), "token")
    prof = (
        counts.withColumn("rk", F.row_number().over(wprof))
        .filter(F.col("rk") <= 10)
        .select(F.col("lang").alias("cand_lang"), "token")
    )
    doc_tok = tok.select("doc_id", "token").distinct()
    hits = (
        doc_tok.join(F.broadcast(prof), "token")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("h"))
    )
    per_doc = hits.groupBy("doc_id").agg(
        F.sum("h").cast("long").alias("n_hits"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.sum(
            F.col("h")
            * F.floor(F.log(F.col("h").cast("double")) * 1000000).cast("long")
        )
        .cast("long")
        .alias("sum_u"),
        F.max("h").cast("long").alias("top1"),
    )
    wr = Window.partitionBy("doc_id").orderBy(F.col("h").desc(), "cand_lang")
    top2 = (
        hits.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 2)
        .groupBy("doc_id")
        .agg(F.max("h").cast("long").alias("second"))
    )
    return (
        per_doc.join(top2, "doc_id", "left")
        .select(
            "doc_id",
            "n_hits",
            "n_langs",
            (
                F.floor(F.log(F.col("n_hits").cast("double")) * 1000000).cast(
                    "long"
                )
                - F.expr("sum_u DIV n_hits")
            ).alias("mix_entropy_micronats"),
            "top1",
            F.coalesce(F.col("second"), F.lit(0)).cast("long").alias("top2"),
            F.expr(
                "CAST((top1 - COALESCE(second, 0)) * 1000000 DIV n_hits AS BIGINT)"
            ).alias("margin_micro"),
        )
    )


# Planted mixed-normalization-form suffixes for text_unicode_normalize.
# The fixture text is pure ASCII (verified each round), so each doc gets a
# deterministic suffix chosen by doc_id % 4 covering the canonical NFC cases:
#   0: e + U+0301 combining acute        -> composes to U+00E9 (é)
#   1: A + U+030A combining ring         -> composes to U+00C5 (Å)
#   2: U+212B ANGSTROM SIGN (singleton)  -> canonical-maps to U+00C5
#   3: s + U+0323 + U+0307 (reorder+compose) -> U+1E69 (ṩ); already-NFC é stays
_NFC_SUFFIXES = [
    " café",
    " Århus",
    " Ångström",
    " é ṩ",
]


@register(
    "text_unicode_normalize",
    oracle=f"""
SELECT doc_id,
       nfc_normalize(aug) AS text_nfc,
       CAST(length(aug) AS BIGINT) AS n_cp_raw,
       CAST(length(nfc_normalize(aug)) AS BIGINT) AS n_cp_nfc,
       CAST(CASE WHEN aug != nfc_normalize(aug) THEN 1 ELSE 0 END AS BIGINT)
         AS changed
FROM (SELECT doc_id,
             text || CASE CAST(doc_id % 4 AS INTEGER)
               WHEN 0 THEN '{_NFC_SUFFIXES[0]}'
               WHEN 1 THEN '{_NFC_SUFFIXES[1]}'
               WHEN 2 THEN '{_NFC_SUFFIXES[2]}'
               ELSE '{_NFC_SUFFIXES[3]}'
             END AS aug
      FROM documents) t
""",
    tier="T2",
)
def text_unicode_normalize(spark, sf_dir):
    """Unicode NFC normalization — the canonical pre-dedup pass in every LLM
    curation stack (decomposed 'e'+U+0301 and composed U+00E9 must hash
    identically before exact/near dedup). The fixture text is pure ASCII, so
    a deterministic mixed-form suffix is planted per doc (composition,
    reordering + composition, and the U+212B singleton) before normalizing —
    the oracle (DuckDB ``nfc_normalize``, utf8proc) byte-compares the
    normalized text and codepoint lengths against pandas
    ``Series.str.normalize('NFC')`` (Python unicodedata); both implement
    UAX #15 canonical composition.

    Scale note: mapInPandas streams Arrow batches — linear per-row pass, no
    shuffle, constant memory; at 100 TB this fuses with the rest of the
    cleaning stage (strip → normalize → hash) in one map stage. NULL text →
    NULL aug in both engines (|| / concat NULL semantics), normalized NULL
    row preserved with changed = 0 per the oracle's CASE.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _NFC_SUFFIXES]),
        F.pmod(F.col("doc_id"), F.lit(4)).cast("int") + 1,
    )
    aug_df = d.select("doc_id", F.concat(F.col("text"), suffix).alias("aug"))

    def norm_batches(batches):
        for pdf in batches:
            nfc = pdf["aug"].str.normalize("NFC")
            changed = pdf["aug"].ne(nfc) & pdf["aug"].notna()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text_nfc": nfc,
                    "n_cp_raw": pdf["aug"].str.len().astype("Int64"),
                    "n_cp_nfc": nfc.str.len().astype("Int64"),
                    "changed": changed.astype("int64"),
                }
            )

    # fan_out measured a LOSS here (round-11 A/B, 0.86 -> 0.95 s).
    return aug_df.mapInPandas(
        norm_batches,
        "doc_id long, text_nfc string, n_cp_raw long, n_cp_nfc long, changed long",
    )


# Canonical dedup-key pass (round 8): the standard pre-hash normalization
# chain every curation stack runs — whitespace collapse → casefold → NFC —
# proven by construction: each doc is planted in TWO surface forms (composed
# "Café" vs decomposed upper-case "Cafe"+U+0301 with doubled spaces) that
# must collapse to ONE canonical key.
_CANON_COMPOSED = " Café"        # composed é, single space
_CANON_DECOMPOSED = "  Café"    # decomposed e + combining acute, doubled space


@register(
    "text_canonical_key",
    oracle=f"""
WITH variants AS (
  SELECT doc_id AS id, text || '{_CANON_COMPOSED}' AS t FROM documents
  UNION ALL
  SELECT doc_id + 100000, upper(text) || '{_CANON_DECOMPOSED}' FROM documents
),
canon AS (
  SELECT id,
         nfc_normalize(lower(trim(regexp_replace(t, ' +', ' ', 'g')))) AS k
  FROM variants WHERE t IS NOT NULL
)
SELECT k AS canonical_key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(id) AS BIGINT) AS min_id,
       CAST(MAX(id) AS BIGINT) AS max_id
FROM canon GROUP BY k
""",
    tier="T2",
)
def text_canonical_key(spark, sf_dir):
    """Canonical dedup-key normalization — whitespace collapse → casefold →
    NFC — applied to two planted surface forms of every document (composed
    "Café" vs upper-cased text + decomposed "Cafe"+U+0301 with doubled
    spaces). Exact dedup hashes THIS key, not raw bytes; without the chain
    the two forms of each doc would hash apart ([[text_unicode_normalize]]
    reports the normalization itself; this key proves the merge: every
    canonical key must collect exactly its two variants, and the oracle
    checks the grouped relation byte-for-byte).

    Determinism: the JVM stage (concat, upper/lower, regexp ' +' collapse,
    trim) uses only constructs Spark and DuckDB read identically on this
    charset (planted uppercase is ASCII-only — exotic case mappings never
    enter); the NFC stage is the pinned three-engine recipe
    (tests/test_nfc_properties.py). NULL text drops in both engines.

    Scale note: map-only until the single groupBy(canonical_key) shuffle —
    at 100 TB this IS the exact-dedup shuffle, just keyed on the canonical
    form; the Arrow-batched NFC pass fuses with the scan.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    v1 = d.select(
        F.col("doc_id").alias("id"),
        F.concat(F.col("text"), F.lit(_CANON_COMPOSED)).alias("t"),
    )
    v2 = d.select(
        (F.col("doc_id") + 100000).alias("id"),
        F.concat(F.upper(F.col("text")), F.lit(_CANON_DECOMPOSED)).alias("t"),
    )
    pre = (
        v1.unionAll(v2)
        .filter(F.col("t").isNotNull())
        .select(
            "id",
            F.lower(F.trim(F.regexp_replace("t", " +", " "))).alias("pre"),
        )
    )

    def nfc(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf["id"], "k": pdf["pre"].str.normalize("NFC")}
            )

    return (
        # fan_out measured a LOSS here (round-11 A/B, 1.47 -> 2.39 s): NFC of
        # short keys is cheap; the groupBy below supplies the parallelism.
        pre.mapInPandas(nfc, "id long, k string")
        .groupBy(F.col("k").alias("canonical_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("id").cast("long").alias("min_id"),
            F.max("id").cast("long").alias("max_id"),
        )
    )


# --- Boilerplate-prefix detection (round 9) ---------------------------------
# text_template_groups catches whole-document templates (digit-masked exact
# match); this catches the OTHER crawl boilerplate shape — a shared header
# prefix on otherwise-distinct documents (cookie banners, site navigation,
# license preambles). The round-9 skew harness measures exactly this shape
# (a hot 10-word prefix on 20% of docs); here it becomes a first-class
# curation signal rather than only a stress input.
_BP_K = 5  # prefix length in tokens
_BP_MIN_SUPPORT = 2

_BP_PREFIX_SQL = (
    f"array_to_string(list_slice(string_split(text, ' '), 1, {_BP_K}), ' ')"
)


@register(
    "text_boilerplate_prefix",
    oracle=f"""
SELECT prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS exemplar_doc,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT doc_id, n_chars, {_BP_PREFIX_SQL} AS prefix
  FROM documents WHERE text IS NOT NULL
)
GROUP BY prefix
HAVING COUNT(*) >= {_BP_MIN_SUPPORT}
""",
    tier="T2",
)
def text_boilerplate_prefix(spark, sf_dir):
    """Shared-header boilerplate detection: documents grouped by their
    first-5-token prefix; prefixes carried by >= 2 documents are the
    boilerplate candidates a curation pass strips before dedup/quality
    scoring (a hot navigation header otherwise dominates shingle posting
    lists and depresses near-dup thresholds). Emits support, the exemplar
    (lowest doc_id), and the total character mass behind each prefix.

    Determinism: prefix is a pure token-slice (slice truncates identically
    to list_slice for short docs); counts and MIN are exact.

    Scale note: ONE partial+final aggregate keyed on the prefix — the
    dedup_exact shape; at 100 TB group on xxhash64(prefix) to keep shuffle
    rows narrow and re-attach one exemplar string per surviving group.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pre = d.select(
        "doc_id",
        "n_chars",
        F.array_join(F.slice(tokens(F.col("text")), 1, _BP_K), " ").alias("prefix"),
    )
    return (
        pre.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("exemplar_doc"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .filter(F.col("n_docs") >= _BP_MIN_SUPPORT)
    )


# --- N-gram novelty (round 9) ------------------------------------------------
# Corpus-order novelty: the share of a document's distinct 3-grams whose
# global FIRST occurrence (lowest doc_id) is this document — the
# memorization-risk / marginal-contribution signal a curation stack uses to
# rank candidate additions against an existing corpus (a doc whose grams all
# appeared earlier adds nothing the model hasn't seen).
_NOV_N = 3

_NOV_GRAMS_SQL = f"""
SELECT doc_id,
       unnest(list_distinct(list_transform(
         generate_series(1, len(string_split(text, ' ')) - {_NOV_N - 1}),
         i -> array_to_string(list_slice(string_split(text, ' '),
                                         i, i + {_NOV_N - 1}), ' ')))) AS g
FROM documents
WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= {_NOV_N}
"""


@register(
    "text_ngram_novelty",
    oracle=f"""
WITH grams AS ({_NOV_GRAMS_SQL}),
firsts AS (SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc
           FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN firsts.first_doc = grams.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN firsts.first_doc = grams.doc_id
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS novelty_micro
FROM grams JOIN firsts USING (g)
GROUP BY grams.doc_id
""",
    tier="T2",
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty against corpus order: novelty_micro =
    share of the doc's distinct 3-grams first introduced (lowest doc_id)
    by this doc. Docs under 3 tokens have no 3-grams and are absent in
    both engines (the Spark side guards size >= 3 explicitly — sequence(1,
    size-2) would count DOWN for shorter docs, the text_ngrams ANSI
    lesson).

    Determinism: gram strings are identical token-slices; first_doc is an
    exact MIN; the ratio is one non-negative integer `//` in micro-units.

    Scale note: the global first-occurrence aggregate is min() — fully
    map-side combinable, so a boilerplate gram appearing in 20% of docs
    costs one partial row per task, not a hot reduce key (the same
    structural protection the round-9 skew table measured for tfidf's df
    count). Round 11 (optimization guide §1.2/§2.3): the join and final
    aggregate now run at DOC grain, not gram-pair grain — n_grams is
    size(gram array), a map-only expression needing no explode and no
    shuffle, and n_novel is `firsts.groupBy(first_doc).count()` (a doc
    introduced gram g iff it contains g and owns its min, so counting
    firsts by owner is the same multiset as the old per-pair equality
    sum). The old plan joined every (doc, gram) pair against the firsts
    table and re-aggregated |pairs| rows by doc_id; the new one joins two
    |docs|-row frames. At 100 TB hash grams to int64 before the exchange.
    """
    # fan_out measured a LOSS here (round-11 interleaved A/B, 2.91 -> 3.25 s):
    # the gram explode is codegen'd and collapses map-side into the first
    # aggregate — the extra exchange outweighs the single-core explode.
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = d.filter(F.size(tokens(F.col("text"))) >= _NOV_N)
    # single-element transform binds the split once (the text_ngrams
    # hoisting rule: Catalyst does not hoist loop-invariant subexpressions
    # out of HOF lambdas, so referencing split(...) inside the index
    # transform would re-split per gram)
    arr_sql = f"""
        element_at(transform(array(split(text, ' ')), a ->
          CASE WHEN size(a) >= {_NOV_N} THEN
            array_distinct(transform(sequence(1, size(a) - {_NOV_N - 1}),
              i -> concat_ws(' ', slice(a, i, {_NOV_N}))))
          ELSE array() END), 1)
        """
    docs = d.select(
        "doc_id", F.size(F.expr(arr_sql)).cast("long").alias("n_grams")
    )
    grams = d.select("doc_id", F.expr(f"explode({arr_sql})").alias("g"))
    firsts = grams.groupBy("g").agg(F.min("doc_id").cast("long").alias("first_doc"))
    novel_counts = firsts.groupBy("first_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    return (
        docs.join(
            novel_counts, docs.doc_id == novel_counts.first_doc, "left"
        )
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("CAST(n_novel * 1000000 DIV n_grams AS BIGINT)").alias(
                "novelty_micro"
            ),
        )
    )
