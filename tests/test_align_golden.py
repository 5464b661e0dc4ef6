"""Golden multilingual paragraph alignment — reproduces the reference's
test_extract_paragraphs exactly (/root/reference/src/tests/
test_end_to_end_paragraph_extractor.py:28-104)."""

import pytest
from pyspark.sql import functions as F

from pdf_metadata_extraction_spark.operators.align import (
    align_paragraphs,
    paragraphs_from_segments,
    paragraphs_translations,
)
from pdf_metadata_extraction_spark.plans.pipeline import segments_from_pages
from pdf_metadata_extraction_spark.sources.pages_synth import generate_pages

EN_URL = "https://fixtures.example.org/lorem_en"
FR_URL = "https://fixtures.example.org/lorem_fr"

# the reference test's client-supplied segment boxes (test:35-40)
SEG_BOXES = [
    dict(left=183.0, top=72.0, width=246.0, height=22.0, page_width=612.0,
         page_height=792.0, page_number=1, segment_type="Page header"),
    dict(left=72.0, top=151.0, width=463.0, height=96.0, page_width=612.0,
         page_height=792.0, page_number=1, segment_type="Text"),
    dict(left=72.0, top=290.0, width=43.0, height=12.0, page_width=612.0,
         page_height=792.0, page_number=1, segment_type="Title"),
    dict(left=90.0, top=318.0, width=76.0, height=95.0, page_width=612.0,
         page_height=792.0, page_number=1, segment_type="List item"),
]

GOLDEN_P1 = (
    "Some text. Lorem Ipsum is simply dummy text of the printing and "
    "typesetting industry. Lorem Ipsum has been the industry's standard "
    "dummy text ever since the 1500s, when an unknown printer took a galley "
    "of type and scrambled it to make a type specimen book. It has survived "
    "not only five centuries, but also the leap into electronic typesetting, "
    "remaining essentially unchanged. It was popularised in the 1960s with "
    "the release of Letraset sheets containing Lorem Ipsum passages, and "
    "more recently with desktop publishing software like Aldus PageMaker "
    "including versions of Lorem Ipsum."
)
GOLDEN_P2 = "● FORMULA ● FOOTNOTE ● LIST ● TABLE ● FIGURE ● TITLE ● TEXT"


@pytest.fixture(scope="module")
def translations(spark):
    pages = generate_pages(spark, 6, partitions=2)
    box_schema = (
        "array<struct<left:double,top:double,width:double,height:double,"
        "page_width:double,page_height:double,page_number:int,segment_type:string>>"
    )
    xml_data = spark.createDataFrame(
        [(EN_URL, "key_1", "en", True, SEG_BOXES),
         (FR_URL, "key_1", "fr", False, SEG_BOXES)],
        f"url string, key string, lang string, is_main boolean, boxes {box_schema}",
    )
    pages_boxed = pages.join(xml_data.select("url", F.col("boxes").alias("xml_segments_boxes")), "url")
    segs = segments_from_pages(pages_boxed)
    paras = paragraphs_from_segments(segs, xml_data.select("url", "key", "lang"))
    main = xml_data.where("is_main").select("key", F.col("lang").alias("main_language"))
    return paragraphs_translations(align_paragraphs(paras, main)).collect()


def test_two_paragraphs_positions(translations):
    # golden: exactly 2 paragraphs (header + title excluded), positions 1..2
    assert [r["position"] for r in translations] == [1, 2]
    assert all(r["main_language"] == "en" for r in translations)
    assert all(r["available_languages"] == ["en", "fr"] for r in translations)


def test_paragraph_texts_golden(translations):
    p1, p2 = translations
    t1 = {t["language"]: t for t in p1["translations"]}
    assert sorted(t1) == ["en", "fr"]
    # golden compares .split() (whitespace-insensitive, :93) — ours is
    # already whitespace-normalized so both hold
    assert t1["en"]["text"].split() == GOLDEN_P1.split()
    assert t1["fr"]["text"].split() == GOLDEN_P1.split()
    assert t1["en"]["needs_user_review"] is False
    t2 = {t["language"]: t for t in p2["translations"]}
    # golden exact text (:98-104): seven LIST_ITEM lines → one paragraph
    assert t2["en"]["text"] == GOLDEN_P2
    assert t2["fr"]["text"] == GOLDEN_P2
    assert t2["fr"]["needs_user_review"] is False
