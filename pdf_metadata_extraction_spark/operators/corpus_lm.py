"""Corpus-level unigram statistics: a unigram language model with
per-document cross-entropy scoring, and TF-IDF top-terms.

CCNet (Wenzek et al. 2020) ranks web documents by language-model
perplexity to split a crawl into quality tiers; the cheapest honest
member of that family is the corpus's own unigram model — a document
whose word distribution diverges from the corpus (gibberish, keyword
stuffing, wrong language) scores high cross-entropy and lands in the
drop tier.  TF-IDF top-terms are the classic per-document keyword
profile (Salton & Buckley 1988), the same statistic the reference uses
per extractor group as "frequent words" (operators/selector.py A1
lineage) turned into a per-document feature.

Determinism (the oracle contract): every logarithm is rounded to 6
decimals the moment it is produced (``ln`` is not IEEE
correctly-rounded-mandated, so Spark's Math.log and DuckDB's std::log
may differ in the last ulp — 6-dp rounding absorbs it), then scaled to
integer MICRO-NATS (``round6(ln) * 1e6`` → BIGINT).  All downstream
sums are exact 64-bit integer arithmetic — no float-accumulation
order dependence anywhere, so Spark and DuckDB agree bit-for-bit
regardless of partitioning.

Scale design (the 100x lens):
- Per-doc term frequency is aggregated FIRST (one groupBy on
  (doc, word) — well-spread keys, map-side partials).  Only then is
  the vocabulary table joined on ``word``.  Joining BEFORE the tf
  rollup would stream one row per token occurrence through a join
  whose hot keys are stopwords — the classic skew trap; tf compression
  removes it (a doc contributes "the" once, not 400 times).
- The vocabulary table is corpus-derived: ~10^8 rows at web scale —
  too big to broadcast blindly, fine as the small side of a sort-merge
  or AQE-planned join; here AQE broadcasts it.
- ``N`` (corpus doc count) rides in as a broadcast one-row cross join,
  the repo's standard scalar-injection shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKENS = "filter(split(lower({t}), '[^a-z0-9]+'), x -> x != '')"


def _doc_tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word, tf) — per-document term frequency."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.expr(_TOKENS.format(t=text_col))).alias("word"),
        )
        .groupBy("id", "word")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def unigram_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, c, cost_micro): corpus unigram counts and the integer
    micro-nat surprisal ``round(round6(ln(total / c)) * 1e6)`` of each
    word.  ``total`` is injected via a broadcast one-row cross join so
    the count aggregation stays a single map-side-combined groupBy."""
    counts = (
        df.select(F.explode(F.expr(_TOKENS.format(t=text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    total = counts.agg(F.sum("c").cast("long").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "word",
        "c",
        F.round(
            F.round(F.log(F.col("_total") / F.col("c")), 6) * 1000000.0, 0
        )
        .cast("long")
        .alias("cost_micro"),
    )


def doc_cross_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, ce_total_micro, avg_nats): per-document
    cross-entropy under the corpus's own unigram model.

    ``ce_total_micro`` = Σ_tokens cost_micro(word) — an exact BIGINT
    (tf × integer cost per distinct word, summed).  ``avg_nats`` =
    round(ce_total_micro / n_tokens / 1e6, 6) — a derived double whose
    operands are exact integers, so the division is reproducible
    cross-engine.  Empty docs report zeros."""
    tf = _doc_tf(df, id_col, text_col)
    lm = unigram_lm(df, id_col, text_col).select("word", "cost_micro")
    per_doc = (
        tf.join(lm, "word")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("cost_micro")).cast("long").alias(
                "ce_total_micro"
            ),
        )
    )
    # left join back so token-free docs still get a (zeroed) row
    base = df.select(F.col(id_col).alias("id")).distinct()
    return base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("ce_total_micro", F.lit(0)).cast("long").alias("ce_total_micro"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            F.round(F.col("ce_total_micro") / F.col("n_tokens") / 1000000.0, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_nats"),
    )


def ce_quality_tiers(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tiles: int = 3,
) -> DataFrame:
    """CCNet's perplexity-tier split (head/middle/tail, Wenzek et al.
    2020 §4.3) on the corpus's own unigram cross-entropy: documents
    ranked by (avg_nats, id) — a total order — and bucketed into
    ``n_tiles`` tiers by exact integer arithmetic
    ``tier = (rank-1) * n_tiles div total + 1`` (tier 1 = lowest
    surprisal = head).  The rank comes from the distributed two-pass
    ``global_rank`` (range partition + broadcast prefixes), never a
    single-task global window; total rides in as a broadcast one-row
    count.  Output: (id, avg_nats, tier)."""
    from pdf_metadata_extraction_spark.operators.packing import global_rank

    ce = doc_cross_entropy(df, id_col, text_col).select(
        F.col(id_col).alias("id"), "avg_nats"
    )
    ranked = global_rank(ce, ["avg_nats", "id"])
    total = ce.agg(F.count("*").cast("long").alias("_total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        F.col("id").alias(id_col),
        "avg_nats",
        (
            F.expr("(rnk - 1) * %d div _total" % n_tiles) + F.lit(1)
        )
        .cast("int")
        .alias("tier"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, word, tf, score_micro, rnk): top-``k`` TF-IDF terms per
    document.  ``score_micro`` = tf × round(round6(ln(N / df_count)) ×
    1e6) — exact integer, so the (score desc, word asc) ranking is
    total and reproducible.  Words occurring in every document score 0
    and never outrank informative terms."""
    from pyspark.sql.window import Window

    tf = _doc_tf(df, id_col, text_col)
    dfreq = tf.groupBy("word").agg(F.count("*").cast("long").alias("df_count"))
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count("*").cast("long").alias("_n")
    )
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "word",
        F.round(
            F.round(F.log(F.col("_n") / F.col("df_count")), 6) * 1000000.0, 0
        )
        .cast("long")
        .alias("idf_micro"),
    )
    scored = tf.join(idf, "word").select(
        "id", "word", "tf", (F.col("tf") * F.col("idf_micro")).alias("score_micro")
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score_micro"), F.asc("word")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("id").alias(id_col),
            "word",
            "tf",
            F.col("score_micro").cast("long").alias("score_micro"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
