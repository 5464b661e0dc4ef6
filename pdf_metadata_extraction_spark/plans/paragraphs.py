"""§3.3 extract_paragraphs — the reference's third entry point as one
plan (reference: ParagraphExtractorUseCase.execute_task →
get_paragraphs_translations, /root/reference/src/use_cases/
ParagraphExtractorUseCase.py:61-67 + src/drivers/rest/app.py:311-325).

Input: ``xml_data(url, key, lang, is_main, xml_segments_boxes)`` — one
row per (document, language) like the reference's XmlData list — plus
the pages table. Output: the ParagraphsTranslations-shaped rows (one per
key+position, translations collected per language).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_metadata_extraction_spark.operators.align import (
    align_paragraphs,
    paragraphs_from_segments,
    paragraphs_translations,
)
from pdf_metadata_extraction_spark.plans.pipeline import segments_from_pages


def extract_paragraphs(
    spark: SparkSession, pages: DataFrame, xml_data: DataFrame
) -> DataFrame:
    pages_boxed = pages.select("url", "html").join(
        F.broadcast(xml_data.select("url", "xml_segments_boxes")), "url", "inner"
    )
    segs = segments_from_pages(pages_boxed)
    paras = paragraphs_from_segments(
        segs, xml_data.select("url", "key", "lang")
    )
    main = (
        xml_data.where(F.col("is_main"))
        .select("key", F.col("lang").alias("main_language"))
        .distinct()
    )
    return paragraphs_translations(align_paragraphs(paras, main))
