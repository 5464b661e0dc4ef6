"""Deduplication suite for training-data pipelines (task mandate; the
reference's only dedup is consume-once — SURVEY.md §2.6 — so these are
the scale-path additions a 100 TB corpus needs).

All variants are pure DataFrame expressions (whole-stage codegen, no
Python) built on portable primitives (md5, substr, split) so each has a
DuckDB oracle in ``__spark_entry__.oracle_sql``.

- exact_duplicates      hash-groupBy on normalized text (map-side partial agg)
- minhash (see operators/canonicalize.py — shared implementation)
- simhash_64→16-bit     near-dup fingerprint, bit-majority over token hashes
- ngram_jaccard_pairs   exact Jaccard over char-3-gram sets for candidate pairs
- embedding near-dup (see operators/similarity.py cosine_pairs)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 16


def normalized_text(text_col: str = "text"):
    return F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5 of normalized text → groups with >1 member.

    Returns (text_hash, n_dups, canonical_id=min id, member_ids sorted).
    Shuffle on the 32-char hash — uniform keys, no skew; partial
    count/min happen map-side.
    """
    return (
        df.select(F.col(id_col).alias("id"), F.md5(normalized_text(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("canonical_id"),
            F.array_sort(F.collect_list("id")).alias("member_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def _token_words(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda w: w != ""
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """Bit-majority simhash over distinct token hashes (portable md5 core).

    token hash = int(md5(word)[:4], 16) (16 bits); per bit the doc sums
    ±1 across distinct words; simhash bit = 1 iff the sum > 0.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_token_words(text_col))).alias("w"),
    ).withColumn("hv", F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long"))
    bit_sums = words.groupBy("id").agg(
        *[
            F.sum(
                F.when((F.floor(F.col("hv") / (2 ** k)) % 2) == 1, 1).otherwise(-1)
            ).alias(f"s_{k}")
            for k in range(bits)
        ]
    )
    sim = sum(
        F.when(F.col(f"s_{k}") > 0, 2 ** k).otherwise(0) for k in range(bits)
    )
    return bit_sums.select("id", sim.cast("long").alias("simhash"))


def simhash_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Docs sharing an identical simhash fingerprint (bucket groupBy)."""
    return (
        simhash(df, id_col, text_col)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.array_sort(F.collect_list("id")).alias("member_ids"))
        .where(F.col("n_docs") > 1)
    )


def char_ngrams(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3,
                prefix_chars: int = 200) -> DataFrame:
    """Distinct char n-grams of the normalized text prefix.

    ``prefix_chars`` bounds work per row (at 100 TB an unbounded shingle
    explode is the cost driver; a fixed prefix keeps the candidate join
    linear in corpus size)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.substring(normalized_text(text_col), 1, prefix_chars).alias("_t"),
    ).select(
        "id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length(_t) - {n - 1}, 1)),"
                    f" i -> substr(_t, i, {n}))"
                )
            )
        ).alias("gram"),
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text",
    n: int = 3, min_jaccard: float = 0.8, prefix_chars: int = 200,
) -> DataFrame:
    """Exact Jaccard similarity over char n-gram sets.

    grams self-join on gram → |A∩B| per pair; |A|,|B| from per-doc
    counts; J = inter / (|A|+|B|-inter). The gram join is the shuffle —
    grams are short strings with Zipf skew, so AQE skew-join applies; at
    corpus scale gate this behind LSH candidates (canonicalize.py)
    instead of the full self-join.
    """
    grams = char_ngrams(df, id_col, text_col, n, prefix_chars).persist()
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), "gram")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    return out
