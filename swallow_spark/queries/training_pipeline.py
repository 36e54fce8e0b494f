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
from ..ops.dist_rank import distributed_prefix
from ..ops.materialize import materialize
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


# ------------------------------------------------- pretrain corpus E2E

_PRETRAIN_SQL = """
WITH toks AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
gated AS (
  SELECT doc_id, text, n_tok FROM toks
  WHERE n_tok BETWEEN 20 AND 100
    AND (n_chars - (n_tok - 1)) >= 3 * n_tok
    AND (n_chars - (n_tok - 1)) <= 10 * n_tok
    AND 100 * n_uniq >= 30 * n_tok
),
deduped AS (
  SELECT doc_id, n_tok FROM (
    SELECT doc_id, n_tok,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
chunks AS (
  SELECT doc_id, k.k AS chunk_id,
         LEAST(64, n_tok - k.k * 56) AS c
  FROM deduped,
       LATERAL (SELECT unnest(generate_series(0, (n_tok - 9) // 56)) AS k) k
),
packed AS (
  SELECT doc_id, chunk_id, c,
         (CAST(SUM(c) OVER (ORDER BY doc_id, chunk_id) AS BIGINT) + 511) // 512
           AS shard
  FROM chunks
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM packed
GROUP BY shard
ORDER BY shard
"""


def _pretrain_local(spark, sf_dir):
    """The pre-checkpoint pretrain chain up to the per-partition local
    cumsums: gate -> md5 dedup -> chunk explode -> range partition ->
    mapInPandas running sum. Factored out so the plan test
    (tests/test_plans.py::test_pretrain_packer_two_pass) can pin THIS
    plan's shape — pipeline_pretrain_corpus materializes it (the declared
    plan then reads Scan ExistingRDD), because the frame feeds both the
    subtotal branch and the offset join and the Python cumsum pass is not
    shuffle-reused across branches."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    arr = F.split(F.col("text"), " ")
    toks = d.select(
        "doc_id",
        "text",
        F.size(arr).cast("long").alias("n_tok"),
        F.size(F.array_distinct(arr)).cast("long").alias("n_uniq"),
        F.length("text").cast("long").alias("n_chars"),
    )
    gated = toks.filter(
        F.col("n_tok").between(20, 100)
        & ((F.col("n_chars") - (F.col("n_tok") - 1)) >= 3 * F.col("n_tok"))
        & ((F.col("n_chars") - (F.col("n_tok") - 1)) <= 10 * F.col("n_tok"))
        & (100 * F.col("n_uniq") >= 30 * F.col("n_tok"))
    )
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_tok")
    )
    chunks = deduped.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.expr("(n_tok - 9) DIV 56"))
        ).alias("chunk_id"),
        "n_tok",
    ).select(
        "doc_id",
        "chunk_id",
        F.least(F.lit(64), F.col("n_tok") - F.col("chunk_id") * 56).alias("c"),
    )
    ranged = (
        chunks.repartitionByRange(32, "doc_id", "chunk_id")
        .sortWithinPartitions("doc_id", "chunk_id")
        .withColumn("pid", F.spark_partition_id())
    )

    def local_cumsum(batches):
        run = 0  # carries across Arrow batches WITHIN one partition
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            pdf["local_cum"] = pdf["c"].cumsum() + run
            run = int(pdf["local_cum"].iloc[-1])
            yield pdf

    return ranged.mapInPandas(
        local_cumsum,
        "doc_id long, chunk_id long, c long, pid int, local_cum long",
    )


@register("pipeline_pretrain_corpus", oracle=_PRETRAIN_SQL, tier="T2")
def pipeline_pretrain_corpus(spark, sf_dir):
    """End-to-end pretraining-corpus build, emitted as the SHARD MANIFEST a
    downstream trainer consumes: Gopher-style quality gate (token count in
    [20,100], mean word length in [3,10], ≥30% unique tokens — every
    threshold an integer cross-multiplication, the text_gopher_rules rule)
    → exact dedup (md5 keep-min-doc_id) → sliding-window chunking (64-token
    windows, stride 56 ⇒ 8-token overlap) → next-fit packing of chunks into
    512-token shards (running cumsum DIV budget, the doc_pack_bins packer,
    but cross-document and corpus-ordered) → per-shard manifest row
    (chunk/token/doc counts, doc-id span). Each stage exists as its own
    audited key; THIS key pins that the composition — filters before
    dedup, dedup before chunking, deterministic (doc_id, chunk_id) pack
    order — is itself reproducible bit-for-bit.

    Determinism: zero floats anywhere. Chunk counts are
    1 + (n_tok−9) DIV 56 with chunk k carrying LEAST(64, n_tok − 56k)
    tokens; all operands non-negative so DIV ≡ // (gate guarantees
    n_tok ≥ 20 > 9). The −9 stop rule (not −1) drops windows the previous
    one already covers: window k−1 spans tokens [56(k−1), 56(k−1)+64), so
    window k only adds tokens when n_tok − 56k > 8 — otherwise a trainer
    would see a fully-contained duplicate sample and its tokens would be
    double-counted in shard totals.

    Scale: the gate and chunk explode are map-only; dedup shuffles on
    md5(text) (hash-partitioned, the dedup_exact shape); the corpus-order
    running sum is the TWO-PASS PER-PARTITION-OFFSET packer (implemented
    round 7, replacing the former unpartitioned window that pushed every
    chunk through one task): repartitionByRange(doc_id, chunk_id) + local
    sort preserves the global (doc_id, chunk_id) order across partitions;
    pass 1 computes per-partition local cumsums in a single narrow
    mapInPandas (state carries across Arrow batches within a partition);
    pass 2 aggregates one subtotal per partition (bounded by the partition
    count — the same driver-side-constant class as the IVF centroids) and
    broadcasts exclusive offsets back. Output is boundary-placement
    invariant — range sampling moves rows between partitions but never
    changes any row's global prefix sum — so the unchanged oracle and the
    hypothesis suite pin the rewrite. The manifest aggregate stays
    partial+final on shard id.
    """
    # cut lineage on the pre-checkpoint chain (_pretrain_local): it feeds
    # BOTH the subtotal branch and the offset join, and while the
    # repartitionByRange exchange inside it is shuffle-reused across
    # branches, the Python cumsum pass is NOT — without a cut the
    # Arrow/worker round-trip runs twice (measured 2.7 s -> ~1.9 s at
    # sf0.1; at 100 TB it is one corpus pass through Python instead of
    # two). The pre-cut plan shape stays pinned via _pretrain_local.
    local = materialize(_pretrain_local(spark, sf_dir))
    # one subtotal row per partition — bounded metadata, broadcast back as
    # exclusive offsets (the window below is over ≤ #partitions rows)
    offsets = (
        local.groupBy("pid")
        .agg(F.max("local_cum").alias("subtotal"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("subtotal").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    packed = (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("cum", F.col("local_cum") + F.col("offset"))
        .withColumn("shard", F.expr("(cum + 511) DIV 512"))
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("c").cast("long").alias("n_tokens"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .orderBy("shard")
    )


# -------------------------------------------------- preference pairs (DPO)

_PREF_SQL = """
WITH scored AS (
  SELECT lang, doc_id,
         (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
          * 1000000)
           // CAST(len(string_split(text, ' ')) AS BIGINT) AS score_micro
  FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
),
ranked AS (
  SELECT lang, doc_id, score_micro,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score_micro DESC, doc_id) AS rk_top,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score_micro, doc_id) AS rk_bot,
         COUNT(*) OVER (PARTITION BY lang) AS n_docs
  FROM scored
)
SELECT t.lang,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(t.doc_id AS BIGINT) AS chosen_id,
       CAST(t.score_micro AS BIGINT) AS chosen_score,
       CAST(b.doc_id AS BIGINT) AS rejected_id,
       CAST(b.score_micro AS BIGINT) AS rejected_score,
       CAST(t.score_micro - b.score_micro AS BIGINT) AS margin_micro
FROM ranked t JOIN ranked b ON t.lang = b.lang
WHERE t.rk_top = 1 AND b.rk_bot = 1 AND t.n_docs >= 2
ORDER BY t.lang
"""


@register("training_preference_pairs", oracle=_PREF_SQL, tier="T2")
def training_preference_pairs(spark, sf_dir):
    """Preference-pair construction (the DPO/RLHF data shape): within each
    language group, pair the highest-quality document (chosen) with the
    lowest (rejected) and report the quality margin — the deterministic
    skeleton of "build (chosen, rejected) pairs from a scored pool", with
    the quality model stubbed by the integer uniqueness ratio.

    Determinism: the score is PURE int64 (n_uniq·1e6 DIV n_tok — the
    text_quality_score signal without its float spelling), and both ends
    of the pair are picked by total-order row_number ((score DESC, doc_id)
    / (score ASC, doc_id)), so ties break identically in both engines.
    Groups with fewer than two docs emit nothing.

    Scale: one shuffle on lang for the rank windows; at 100 TB the
    per-group windows become WindowGroupLimit top-1 scans, and a real
    pipeline fans out to top-k × bottom-k pairs with the same spelling.
    """
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    arr = F.split(F.col("text"), " ")
    scored = d.select(
        "lang",
        "doc_id",
        F.expr(
            "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000)"
            " DIV CAST(size(split(text, ' ')) AS BIGINT)"
        ).alias("score_micro"),
    )
    wtop = Window.partitionBy("lang").orderBy(
        F.col("score_micro").desc(), "doc_id"
    )
    wbot = Window.partitionBy("lang").orderBy("score_micro", "doc_id")
    wall = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "doc_id",
        "score_micro",
        F.row_number().over(wtop).alias("rk_top"),
        F.row_number().over(wbot).alias("rk_bot"),
        F.count(F.lit(1)).over(wall).alias("n_docs"),
    )
    top = ranked.filter((F.col("rk_top") == 1) & (F.col("n_docs") >= 2)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("doc_id").alias("chosen_id"),
        F.col("score_micro").alias("chosen_score"),
    )
    bot = ranked.filter(F.col("rk_bot") == 1).select(
        F.col("lang").alias("lang_b"),
        F.col("doc_id").alias("rejected_id"),
        F.col("score_micro").alias("rejected_score"),
    )
    return (
        top.join(bot, top.lang == bot.lang_b)
        .select(
            "lang",
            "n_docs",
            F.col("chosen_id").cast("long").alias("chosen_id"),
            F.col("chosen_score").cast("long").alias("chosen_score"),
            F.col("rejected_id").cast("long").alias("rejected_id"),
            F.col("rejected_score").cast("long").alias("rejected_score"),
            (F.col("chosen_score") - F.col("rejected_score"))
            .cast("long")
            .alias("margin_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------- mix allocation (Hamilton)

_MIX_BUDGET = 100000  # tokens to allocate across languages

_MIX_SQL = f"""
WITH counts AS (
  SELECT lang,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens_observed
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
  GROUP BY lang
),
weighted AS (
  SELECT lang, tokens_observed,
         CAST(FLOOR(sqrt(CAST(tokens_observed AS DOUBLE))) AS BIGINT) AS w
  FROM counts
),
tot AS (
  SELECT lang, tokens_observed, w,
         CAST(SUM(w) OVER () AS BIGINT) AS wsum
  FROM weighted
),
quota AS (
  SELECT lang, tokens_observed, w,
         ({_MIX_BUDGET} * w) // wsum AS base,
         ({_MIX_BUDGET} * w) % wsum AS rem,
         CAST(SUM(({_MIX_BUDGET} * w) // wsum) OVER () AS BIGINT) AS base_sum
  FROM tot
),
ranked AS (
  SELECT lang, tokens_observed, w, base, rem,
         {_MIX_BUDGET} - base_sum AS extras,
         row_number() OVER (ORDER BY rem DESC, lang) AS rk
  FROM quota
)
SELECT lang, tokens_observed, CAST(w AS BIGINT) AS w,
       CAST(base AS BIGINT) AS base,
       CASE WHEN rk <= extras THEN 1 ELSE 0 END AS got_extra,
       CAST(base + CASE WHEN rk <= extras THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_tokens
FROM ranked
ORDER BY lang
"""


@register("training_mix_allocation", oracle=_MIX_SQL, tier="T2")
def training_mix_allocation(spark, sf_dir):
    """Token-budget apportionment across languages by the largest-remainder
    (Hamilton) method with temperature-0.5 weights (w ∝ √tokens — the
    multilingual-sampling upweighting of low-resource languages): each
    language gets ⌊B·w/Σw⌋ tokens, and the leftover units go to the
    largest fractional remainders — Σ alloc_tokens == B EXACTLY, the
    property float rounding can't give you.

    Determinism: weights are FLOOR(sqrt(count)) (IEEE sqrt is
    exact-rounded, floor pins it); quotas, remainders, and the extra-unit
    ranking ((rem DESC, lang) — a total order) are pure int64. B·w ≈
    1e5·3e4 stays far under 2^63 at any corpus size that fits a BIGINT
    token count.

    Scale: one partial+final aggregate per language; the apportionment
    windows run over |languages| rows — driver-scale forever.
    """
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    counts = d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias(
            "tokens_observed"
        )
    )
    weighted = counts.select(
        "lang",
        "tokens_observed",
        F.floor(F.sqrt(F.col("tokens_observed").cast("double")))
        .cast("long")
        .alias("w"),
    )
    wglob = Window.partitionBy()
    tot = weighted.select(
        "lang",
        "tokens_observed",
        "w",
        F.sum("w").over(wglob).cast("long").alias("wsum"),
    )
    quota = tot.select(
        "lang",
        "tokens_observed",
        "w",
        F.expr(f"({_MIX_BUDGET} * w) DIV wsum").alias("base"),
        F.expr(f"({_MIX_BUDGET} * w) % wsum").alias("rem"),
    ).withColumn("base_sum", F.sum("base").over(wglob).cast("long"))
    ranked = quota.select(
        "lang",
        "tokens_observed",
        "w",
        "base",
        "rem",
        (F.lit(_MIX_BUDGET) - F.col("base_sum")).alias("extras"),
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "lang"))
        .alias("rk"),
    )
    return ranked.select(
        "lang",
        "tokens_observed",
        F.col("w").cast("long").alias("w"),
        F.col("base").cast("long").alias("base"),
        F.when(F.col("rk") <= F.col("extras"), 1).otherwise(0).alias("got_extra"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("extras"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    ).orderBy("lang")


# ---------------------------------- chat-format validation (round 9)
# The SFT ingestion gate: before chat records reach a tokenizer, every
# conversation must have >= 2 turns, strict user/assistant alternation
# starting at user, and no empty content. The conversation column is
# CONSTRUCTED deterministically from documents (3 tokens per turn, up to
# 6 turns) with violations PLANTED by doc_id residue — doc_id % 7 == 0
# duplicates a role, doc_id % 11 == 0 blanks the final turn — so both
# engines build the identical array-of-struct column and the validator's
# verdicts are fully hash-checked, including rule precedence.

# Shared CTE prefix: base (tokenized docs) + conv (constructed conversation)
# + judged (verdict attached) — consumed by training_chat_format_validate
# and by pipeline_sft_corpus, so the record format is defined ONCE per
# engine and any change to the construction re-verifies both keys.
def _chat_judged(spark, sf_dir):
    """(doc_id, text, n_turns, verdict): the constructed chat record plus
    its validation verdict — the Spark twin of the shared _CHAT_CTES SQL,
    defined ONCE and consumed by training_chat_format_validate and
    pipeline_sft_corpus (so the record format cannot drift between the
    gate and the pipeline that trusts it)."""
    # fan_out measured a LOSS here (round-11 interleaved A/B: the validate
    # key 0.40 -> 0.46 s, the sft pipeline 1.84 -> 2.46 s): the interpreted
    # HOF gate on 5 k docs is cheaper than the added exchange, and the sft
    # consumer materializes the gate's thin output anyway.
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    conv = d.select(
        "doc_id",
        "text",
        F.expr("split(text, ' ')").alias("tok"),
    ).select(
        "doc_id",
        "text",
        F.expr("CAST(LEAST(size(tok) DIV 3, 6) AS BIGINT)").alias("n_turns"),
        F.expr(
            """transform(
                 filter(sequence(1, GREATEST(CAST(LEAST(size(tok) DIV 3, 6) AS INT), 1)),
                        i -> i <= LEAST(size(tok) DIV 3, 6)),
                 i -> struct(
                   CASE WHEN doc_id % 7 = 0 AND i = 2 THEN 'user'
                        WHEN (i - 1) % 2 = 0 THEN 'user'
                        ELSE 'assistant' END AS role,
                   CASE WHEN doc_id % 11 = 0
                         AND i = CAST(LEAST(size(tok) DIV 3, 6) AS INT)
                        THEN ''
                        ELSE array_join(slice(tok, (i - 1) * 3 + 1, 3), ' ')
                   END AS content))"""
        ).alias("turns"),
    )
    return conv.select(
        "doc_id",
        "text",
        "n_turns",
        F.expr(
            """CASE
                 WHEN n_turns < 2 THEN 'too_short'
                 WHEN exists(sequence(2, CAST(n_turns AS INT)),
                        i -> element_at(turns, i).role
                             = element_at(turns, i - 1).role)
                   THEN 'bad_alternation'
                 WHEN exists(turns, t -> t.content = '')
                   THEN 'empty_content'
                 ELSE 'valid'
               END"""
        ).alias("verdict"),
    )


_CHAT_CTES = """base AS (
  SELECT doc_id, text, string_split(text, ' ') AS tok
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
conv AS (
  SELECT doc_id, text,
         CAST(LEAST(len(tok) // 3, 6) AS BIGINT) AS n_turns,
         list_transform(list_filter(generate_series(1, GREATEST(LEAST(len(tok) // 3, 6), 1)),
                                    i -> i <= LEAST(len(tok) // 3, 6)),
           i -> struct_pack(
                  role := CASE WHEN doc_id % 7 = 0 AND i = 2 THEN 'user'
                               WHEN (i - 1) % 2 = 0 THEN 'user'
                               ELSE 'assistant' END,
                  content := CASE WHEN doc_id % 11 = 0
                                   AND i = LEAST(len(tok) // 3, 6)
                                  THEN ''
                                  ELSE array_to_string(
                                         tok[(i - 1) * 3 + 1 : (i - 1) * 3 + 3],
                                         ' ') END))
           AS turns
  FROM base
),
judged AS (
  SELECT doc_id, text, n_turns,
         CASE
           WHEN n_turns < 2 THEN 'too_short'
           WHEN len(list_filter(generate_series(2, CAST(n_turns AS INT)),
                    i -> turns[i].role = turns[i - 1].role)) > 0
             THEN 'bad_alternation'
           WHEN len(list_filter(turns, t -> t.content = '')) > 0
             THEN 'empty_content'
           ELSE 'valid'
         END AS verdict
  FROM conv
)"""

_CHAT_SQL = f"""
WITH {_CHAT_CTES}
SELECT doc_id, n_turns, verdict FROM judged
"""


@register("training_chat_format_validate", oracle=_CHAT_SQL, tier="T2")
def training_chat_format_validate(spark, sf_dir):
    """Chat-record validation for SFT ingestion: per document, the
    constructed conversation's turn count and the FIRST failing rule
    (too_short -> bad_alternation -> empty_content -> valid) — the gate
    that keeps malformed multi-turn records away from the tokenizer.
    Violations are planted by doc_id residue so every rule branch is
    exercised and merge-proven at every SF.

    Determinism: the conversation is built by identical 1-based
    array-of-struct expressions in both engines (3-token slices,
    alternating roles, planted overrides), and every check is pure
    integer/string logic over that shared structure — Spark's
    element_at/slice are 1-based exactly like DuckDB's list indexing, so
    the adjacency comparison indexes are spelled once per engine with the
    same arithmetic. The turn-index sequence is bounded as
    sequence(1, GREATEST(n, 1)) filtered to i <= n because the engines
    DISAGREE on an empty range: Spark's sequence(1, 0) counts DOWN to
    [1, 0] while DuckDB's generate_series(1, 0) is empty — unguarded,
    a <3-token doc (n_turns = 0) would build different turns arrays
    (including a negative-start slice) even though the too_short verdict
    happens to mask it.

    Scale: entirely map-side (one projection, no shuffle, no UDF — the
    array construction and validation are whole-stage-codegen
    expressions); at 100 TB this is the shape a record-validation pass
    must have, with invalid rows routed by verdict to quarantine
    (etl_dq_quarantine's pattern).
    """
    return _chat_judged(spark, sf_dir).select("doc_id", "n_turns", "verdict")


# ------------------------------------------------- SFT corpus E2E (round 10)

_SFT_BATCH_TOKENS = 60  # contiguous token budget per training batch


def _sft_oracle() -> str:
    return f"""
WITH {_CHAT_CTES},
valid AS (
  SELECT doc_id, text, n_turns FROM judged WHERE verdict = 'valid'
),
deduped AS (
  SELECT doc_id, n_turns FROM (
    SELECT doc_id, n_turns,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM valid
  ) WHERE rn = 1
),
packed AS (
  SELECT doc_id, n_turns, n_turns * 3 AS tok,
         (CAST(SUM(n_turns * 3) OVER (ORDER BY doc_id) AS BIGINT) - 1)
           // {_SFT_BATCH_TOKENS} AS batch_id
  FROM deduped
)
SELECT CAST(batch_id AS BIGINT) AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(SUM(tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_turns) AS BIGINT) AS n_turns_total,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM packed GROUP BY batch_id
ORDER BY batch_id
"""


@register("pipeline_sft_corpus", oracle=_sft_oracle(), tier="T2")
def pipeline_sft_corpus(spark, sf_dir):
    """End-to-end SFT-corpus build, emitted as the BATCH MANIFEST a
    fine-tuning loader consumes — the supervised twin of
    pipeline_pretrain_corpus: chat-format gate (the EXACT
    training_chat_format_validate record and rules, via the shared
    _chat_judged/_CHAT_CTES definition, so the gate and the pipeline that
    trusts it cannot drift) → exact dedup (md5 keep-min-doc_id — repeated
    conversations are the classic SFT overfit vector) → deterministic
    corpus-order packing of whole conversations into
    {B}-token training batches → per-batch manifest (conversation/token/
    turn counts, doc-id span).

    Packing spec: conversations are never split (an SFT sample is a whole
    dialogue); batch_id = (inclusive-cumsum(tokens) − 1) DIV B assigns
    contiguous doc_id runs to batches, spilling a conversation that
    crosses the boundary into the earlier batch — deterministic,
    engine-identical integer arithmetic (tokens = 3·n_turns ≥ 6 > 0, so
    the DIV operands are non-negative).

    Scale: the gate is one map-side pass whose 4-thin-column output is
    materialized (ops/materialize.py — reliable checkpoint on a cluster,
    localCheckpoint here) so the expensive validator expressions run
    exactly once; dedup shuffles once on md5(text); the corpus-order
    cumulative sum is the DISTRIBUTED two-phase prefix sum
    (ops/dist_rank.py — DIV-bucket on the dense doc_id, per-bucket
    subtotals, broadcast offsets), never an unpartitioned O(corpus)
    window; the manifest is a partial+final aggregate on batch_id.
    """
    # Evaluate the gate EXACTLY ONCE and cut lineage on its output: the
    # validator's higher-order-function expressions (transform/exists are
    # CodegenFallback — interpreted per row even inside a codegen'd
    # operator) are the pipeline's dominant cost, and without a cut they
    # re-run in the dedup shuffle's map side and BOTH branches of the
    # distributed prefix sum (measured 4.3 s -> 2.0 s at sf0.1 from this
    # one cut). At 100 TB the materialized frame is 4 thin columns and the
    # cut is the difference between one and three validator passes over
    # the corpus.
    judged = materialize(
        _chat_judged(spark, sf_dir).select(
            "doc_id", "n_turns", "verdict", F.md5("text").alias("_h")
        )
    )
    valid = judged.filter(F.col("verdict") == "valid")
    wdup = Window.partitionBy("_h").orderBy("doc_id")
    deduped = (
        valid.withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_turns", (F.col("n_turns") * 3).alias("tok"))
    )
    packed = distributed_prefix(
        deduped, F.col("doc_id"), ["doc_id"], sums={"cum": "tok"}
    ).select(
        "doc_id",
        "n_turns",
        "tok",
        F.expr(f"CAST((cum - 1) DIV {_SFT_BATCH_TOKENS} AS BIGINT)").alias(
            "batch_id"
        ),
    )
    return (
        packed.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum("tok").cast("long").alias("n_tokens"),
            F.sum("n_turns").cast("long").alias("n_turns_total"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .orderBy("batch_id")
    )


# ------------------------------------------------- DPO corpus E2E (round 11)

_DPO_BATCH_TOKENS = 120  # contiguous token budget per preference batch
_DPO_K = 5  # pair depth: i-th best vs i-th worst, i = 1..K


def _dpo_oracle() -> str:
    return f"""
WITH scored AS (
  SELECT lang, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
         (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
          * 1000000)
           // CAST(len(string_split(text, ' ')) AS BIGINT) AS score_micro
  FROM documents
  WHERE text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL
),
counts AS (
  SELECT lang, COUNT(*) AS n_docs FROM scored GROUP BY lang
),
topk AS (
  SELECT * FROM (
    SELECT lang, doc_id, tok, score_micro,
           row_number() OVER (PARTITION BY lang
                              ORDER BY score_micro DESC, doc_id) AS rk
    FROM scored
  ) WHERE rk <= {_DPO_K}
),
botk AS (
  SELECT * FROM (
    SELECT lang, doc_id, tok, score_micro,
           row_number() OVER (PARTITION BY lang
                              ORDER BY score_micro, doc_id DESC) AS rk
    FROM scored
  ) WHERE rk <= {_DPO_K}
),
pairs AS (
  SELECT t.lang, t.rk AS pair_rank,
         t.doc_id AS chosen_id, b.doc_id AS rejected_id,
         t.score_micro - b.score_micro AS margin_micro,
         t.tok + b.tok AS pair_tokens
  FROM topk t
  JOIN botk b ON t.lang = b.lang AND t.rk = b.rk
  JOIN counts c ON t.lang = c.lang
  WHERE 2 * t.rk <= c.n_docs AND t.score_micro > b.score_micro
),
packed AS (
  SELECT *,
         (CAST(SUM(pair_tokens) OVER (ORDER BY lang, pair_rank) AS BIGINT)
          - 1) // {_DPO_BATCH_TOKENS} AS batch_id
  FROM pairs
)
SELECT lang, CAST(pair_rank AS BIGINT) AS pair_rank,
       CAST(chosen_id AS BIGINT) AS chosen_id,
       CAST(rejected_id AS BIGINT) AS rejected_id,
       CAST(margin_micro AS BIGINT) AS margin_micro,
       CAST(pair_tokens AS BIGINT) AS pair_tokens,
       CAST(batch_id AS BIGINT) AS batch_id
FROM packed ORDER BY lang, pair_rank
"""


@register("pipeline_dpo_corpus", oracle=_dpo_oracle(), tier="T2")
def pipeline_dpo_corpus(spark, sf_dir):
    """End-to-end DPO preference-corpus build — the third leg of the
    training-pipeline triad (pipeline_pretrain_corpus /
    pipeline_sft_corpus / this): integer quality scoring (map-only) →
    K-deep preference pairing per language (i-th best vs i-th worst,
    the fan-out of training_preference_pairs' top-1/bottom-1 skeleton)
    → disjointness gate (2·i ≤ n keeps chosen and rejected pools from
    overlapping) → strict-positive-margin gate (a zero-margin pair
    carries no DPO signal) → deterministic token-budget batch packing.

    Determinism: the score is pure int64 (n_uniq·1e6 DIV n_tok); both
    rank orders carry doc_id tiebreaks (DESC on the bottom rank makes it
    the exact mirror of the top rank, so pair i is the i-th best against
    the i-th worst under ONE total order); the packing cumsum runs in
    (lang, pair_rank) order over the bounded pair frame. NULL langs are
    excluded on both sides (NULL group ordering diverges between
    engines).

    Scale: scoring is map-side codegen over the corpus; both rank arms
    are top-K-per-group scans (row_number + rk <= K pushes
    WindowGroupLimit, so each map task forwards at most K rows per
    language — never a full per-language sort); counts are a
    partial+final aggregate; everything after the rank arms operates on
    ≤ K·|langs| rows (broadcast joins, one bounded cumsum window —
    allowlisted in tests/test_plans.py). The corpus is scanned three
    times (two rank arms + the count aggregate), each a column-pruned
    parquet scan; at 100 TB a deployment would cache/checkpoint the
    4-column scored projection once and feed all three from it. The
    pair/packing tail is metadata-sized.
    """
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & F.col("lang").isNotNull()
    )
    scored = d.select(
        "lang",
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("tok"),
        F.expr(
            "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
            " * 1000000) DIV CAST(size(split(text, ' ')) AS BIGINT)"
        ).alias("score_micro"),
    )
    counts = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w_top = Window.partitionBy("lang").orderBy(F.col("score_micro").desc(), "doc_id")
    w_bot = Window.partitionBy("lang").orderBy(
        "score_micro", F.col("doc_id").desc()
    )
    topk = (
        scored.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") <= _DPO_K)
        .select("lang", "rk", "doc_id", "tok", "score_micro")
    )
    botk = (
        scored.withColumn("rk", F.row_number().over(w_bot))
        .filter(F.col("rk") <= _DPO_K)
        .select(
            F.col("lang").alias("lang_b"),
            F.col("rk").alias("rk_b"),
            F.col("doc_id").alias("rejected_id"),
            F.col("tok").alias("tok_b"),
            F.col("score_micro").alias("score_b"),
        )
    )
    pairs = (
        topk.join(
            F.broadcast(botk),
            (topk.lang == botk.lang_b) & (topk.rk == botk.rk_b),
        )
        .join(F.broadcast(counts), "lang")
        .filter(
            (2 * F.col("rk") <= F.col("n_docs"))
            & (F.col("score_micro") > F.col("score_b"))
        )
        .select(
            "lang",
            F.col("rk").alias("pair_rank"),
            F.col("doc_id").alias("chosen_id"),
            "rejected_id",
            (F.col("score_micro") - F.col("score_b")).alias("margin_micro"),
            (F.col("tok") + F.col("tok_b")).alias("pair_tokens"),
        )
    )
    # bounded frame: ≤ K·|langs| surviving pairs — the one place a global
    # cumsum window is the right tool (same rationale as dist_rank's
    # offset frame)
    return (
        pairs.withColumn(
            "batch_id",
            F.expr(
                f"CAST((sum(pair_tokens) OVER (ORDER BY lang, pair_rank"
                f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)"
                f" DIV {_DPO_BATCH_TOKENS} AS BIGINT)"
            ),
        )
        .select(
            "lang",
            F.col("pair_rank").cast("long").alias("pair_rank"),
            F.col("chosen_id").cast("long").alias("chosen_id"),
            F.col("rejected_id").cast("long").alias("rejected_id"),
            F.col("margin_micro").cast("long").alias("margin_micro"),
            F.col("pair_tokens").cast("long").alias("pair_tokens"),
            "batch_id",
        )
        .orderBy("lang", "pair_rank")
    )


@register(
    "pipeline_dataset_card",
    oracle=f"""
SELECT CASE WHEN GROUPING(lang) = 1 THEN '<all>'
            ELSE COALESCE(lang, '<null>') END AS lang_group,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       {sql_rnd("1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*)", 6)} AS dup_rate,
       {sql_rnd("CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)", 6)} AS mean_doc_tokens
FROM documents
GROUP BY ROLLUP(lang)
""",
    tier="T2",
)
def pipeline_dataset_card(spark, sf_dir):
    """Dataset card: the release-note statistics block every corpus drop
    ships with — per-language and corpus-total doc counts, source counts,
    exact-dup rate (distinct md5 over docs), char/token volume, and mean
    document length. One ROLLUP aggregate produces the per-language rows
    and the '<all>' total in a single pass over the corpus.

    Determinism: dup_rate and mean_doc_tokens are IEEE divisions of exact
    int64 aggregates, half-up-quantized to 6dp ([[conform-rnd]] pattern);
    everything else is integer-exact.

    Scale: partial+final ROLLUP aggregate — one shuffle keyed on
    (grouping-set id, lang). The two COUNT(DISTINCT)s expand to a
    two-phase distinct aggregate; at 100 TB swap the md5 distinct for the
    mergeable HLL sketch ([[agg_hll_reaggregate]]) if 2 % error is
    acceptable — the exact form is kept here because the oracle proves
    it.
    """
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "source",
        F.md5(F.col("text")).alias("h"),
        "n_chars",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    agg = base.rollup("lang").agg(
        F.grouping("lang").alias("_g"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("h").cast("long").alias("n_unique_texts"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_tok").cast("long").alias("total_ws_tokens"),
    )
    return agg.select(
        F.when(F.col("_g") == 1, F.lit("<all>"))
        .otherwise(F.coalesce(F.col("lang"), F.lit("<null>")))
        .alias("lang_group"),
        "n_docs",
        "n_sources",
        "n_unique_texts",
        "total_chars",
        "total_ws_tokens",
        rnd(
            F.lit(1.0)
            - F.col("n_unique_texts").cast("double") / F.col("n_docs"),
            6,
        ).alias("dup_rate"),
        rnd(
            F.col("total_ws_tokens").cast("double") / F.col("n_docs"), 6
        ).alias("mean_doc_tokens"),
    )
