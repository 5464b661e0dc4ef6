"""Multilingual paragraph extraction + alignment (SURVEY.md §3.3, J4/W2).

Reference analogue: ``extract_paragraphs`` → per-language
``ParagraphFeatures`` → ``MultilingualParagraphAlignerUseCase`` →
positional zip into ``ParagraphsTranslations``
(/root/reference/src/use_cases/ParagraphExtractorUseCase.py:41-67;
zip at src/drivers/rest/ParagraphsTranslations.py:54-56; golden texts
pinned src/tests/test_end_to_end_paragraph_extractor.py:74-104 — only
content paragraphs survive: the PAGE_HEADER title and the TITLE heading
are not emitted, the seven LIST_ITEM lines merge into one paragraph).

Spark shape:
- paragraphs = segments filtered to content types, numbered with
  ``row_number() over (partition by key, lang order by page, top, left)``
  — W2 reading order;
- alignment = **sort-merge join on (key, position)** between the main
  language and every other language (J4's positional zip, relational);
- ``needs_user_review`` = paragraph counts differ between languages or a
  length-ratio sanity check fails (the aligner's review flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CONTENT_TYPES = ("Text", "List item")


def paragraphs_from_segments(segments: DataFrame, doc_langs: DataFrame) -> DataFrame:
    """segments(url, …) ⋈ doc_langs(url, key, lang) → paragraphs(key, lang,
    position, text). Content-type filter + W2 numbering."""
    segs = segments.join(F.broadcast(doc_langs), "url")
    first_box = F.element_at("boxes", 1)
    w = Window.partitionBy("key", "lang").orderBy(
        "page",
        F.coalesce(first_box["top"], F.lit(0.0)),
        F.coalesce(first_box["left"], F.lit(0.0)),
        "segment_id",
    )
    return (
        segs.where(F.col("segment_type").isin(*CONTENT_TYPES))
        .withColumn("position", F.row_number().over(w))
        .select("key", "lang", "position", "text")
    )


def align_paragraphs(paragraphs: DataFrame, main_language: DataFrame) -> DataFrame:
    """J4: positional zip of each language against the main language.

    ``main_language``: (key, main_language). Returns one row per
    (key, position, language) with ``needs_user_review``.
    """
    counts = paragraphs.groupBy("key", "lang").agg(F.count("*").alias("n_paras"))
    count_spread = counts.groupBy("key").agg(
        (F.min("n_paras") == F.max("n_paras")).alias("counts_match"),
        F.sort_array(F.collect_set("lang")).alias("available_languages"),
    )
    main = paragraphs.join(F.broadcast(main_language), "key").where(
        F.col("lang") == F.col("main_language")
    )
    main_pos = main.select(
        "key", "position", F.col("text").alias("main_text"), "main_language"
    )
    aligned = (
        paragraphs.alias("p")
        .join(main_pos.alias("m"), ["key", "position"], "left")
        .join(F.broadcast(count_spread), "key")
        .select(
            "key",
            F.col("m.main_language").alias("main_language"),
            "available_languages",
            "position",
            F.col("p.lang").alias("language"),
            F.col("p.text").alias("text"),
            (
                ~F.col("counts_match")
                | F.col("m.main_text").isNull()
                | (
                    F.length("p.text")
                    > 3 * F.greatest(F.length("m.main_text"), F.lit(1))
                )
            ).alias("needs_user_review"),
        )
    )
    return aligned


def paragraphs_translations(aligned: DataFrame) -> DataFrame:
    """Collect per (key, position) the translation structs — the
    ParagraphsTranslations output shape (one row per paragraph)."""
    return (
        aligned.groupBy("key", "main_language", "available_languages", "position")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("language", "text", "needs_user_review")
                )
            ).alias("translations")
        )
        .orderBy("key", "position")
    )
