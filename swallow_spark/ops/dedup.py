"""Shared near-duplicate detection core (used by dedup_near_exact_jaccard
and training_data_clean).

Posting-list formulation: group (shingle → sorted doc list), DROP unique
shingles (the vast majority), explode each short list into its doc pairs,
then count intersections. One shuffle on the shingle; no string self-join.

Scale notes: work is Σ|posting|² over SHARED shingles only. At 100 TB, cap
ultra-common shingles (df above a threshold carries no near-dup signal —
standard practice) with `max_posting`; skew on hot shingles disappears with
the cap. Jaccard = inter / (|A|+|B|−inter) from exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parallel import fan_out


def shingle_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_posting: int | None = 500,
) -> tuple[DataFrame, Column]:
    """Return (pairs_df, jaccard_col): all doc pairs sharing ≥1 k-shingle,
    with columns d1 < d2, inter, n1, n2; jaccard_col is the exact ratio
    expression over those columns (filter/round at the call site).

    Shingle identity is xxhash64 over the k-token slice of the token array
    directly — no shingle strings are built, so the posting-list shuffle
    carries 8-byte longs instead of ~30-byte strings (measured 2.9 s →
    1.1 s for dedup_near_exact_jaccard at sf0.1; output verified identical).
    Tokens contain no spaces (split on ' '), so slice equality ⇔ joined-
    string equality, and a result divergence from the string-based oracle
    requires a real 64-bit hash collision among the corpus's distinct
    shingles (p ≈ n²/2⁶⁵ ≈ 10⁻⁸ at 10⁶ shingles — accepted and documented;
    the truncated-last-shingle semantics of ops.text.shingles are mirrored
    exactly).

    max_posting defaults to a finite df-cap: a shingle shared by hundreds of
    docs is a stop-phrase carrying no near-dup signal, and uncapped it makes
    one posting list own Σ|posting|² of the pair fan-out (the classic hot-key
    straggler at corpus scale). No fixture shingle comes near 500 at sf≤0.1,
    so the capped output is bit-identical to the uncapped oracle there; pass
    None to disable for exact-twin comparisons."""
    # NULL text participates in no near-dup relation. The guard is load-
    # bearing for oracle parity: Spark's size(NULL) = -1 plus groupBy
    # treating NULLs as equal would otherwise pair NULL docs with each
    # other, while the SQL oracle's NULL-join semantics drop them.
    # fan_out (round-11, guide §2.5): tokenization + per-shingle xxhash64 run
    # inside the scan stage, and the bench corpus is a single-split file —
    # without the repartition the whole shingle pass is one core. No-op when
    # the scan already yields >= cores splits (any real cluster).
    docs = fan_out(docs.filter(F.col(text_col).isNotNull()))
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"element_at(transform(array(split({text_col}, ' ')), a ->"
                    f" transform(sequence(1, greatest(size(a) - {k - 1}, 1)),"
                    f"   i -> xxhash64(slice(a, i, {k})))), 1)"
                )
            )
        ).alias("s"),
    )
    # NOTE (measured, sf0.1/local[32]): sz feeds two joins and Spark
    # recomputes its subtree per branch — but the straightforward
    # formulation still wins. Alternatives tried and benched WORSE:
    # deriving sizes from posting lists (no exchange reuse materialized,
    # +0.4s), lazy localCheckpoint on sz (serializes the branch, +1.6s),
    # struct-carrying posting lists (interpreted struct sort, 30×). Cheap
    # parallel recompute beats materialization at this scale; on a real
    # cluster persist(sz) before the joins if the corpus scan dominates.
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    posts = sh.groupBy("s").agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
    posts = posts.filter(F.size("ds") > 1)
    if max_posting is not None:
        posts = posts.filter(F.size("ds") <= max_posting)
    # all (i < j) pairs from each posting list
    pair_structs = F.expr(
        "flatten(transform(sequence(1, size(ds) - 1), "
        "i -> transform(sequence(i + 1, size(ds)), "
        "j -> struct(element_at(ds, i) AS d1, element_at(ds, j) AS d2))))"
    )
    pairs = (
        posts.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        # defensive invariant check only: shingles() array_distincts per doc,
        # so a doc never appears twice in a posting list and the i<j index
        # walk over a strictly sorted list already guarantees d1 < d2
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(sz.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1")
        .join(sz.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")), "d2")
    )
    jaccard = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    return pairs, jaccard
