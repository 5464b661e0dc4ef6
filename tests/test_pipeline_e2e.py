"""Golden end-to-end tests — the reference's four extractor e2e scenarios
(P/R oracle of the north rule; reference golden values from
/root/reference/src/tests/test_end_to_end.py, cited per test)."""

import pytest
from pyspark.sql import functions as F

from pdf_metadata_extraction_spark.operators.methods import NO_VALID_RESULTS
from pdf_metadata_extraction_spark.plans.pipeline import (
    predict_extraction,
    train_extraction,
)
from pdf_metadata_extraction_spark.schemas import LABELS, PREDICTION_REQUESTS
from pdf_metadata_extraction_spark.sources.pages_synth import generate_pages

RUN = "end_to_end_test"
UN_URL = "https://fixtures.example.org/un_note"


def _label_row(**kw):
    base = dict(
        run_name=RUN, extraction_name=None, url=None, language_iso="en",
        label_text=None, values=None, source_text=None, entity_name=None,
        page_width=612.0, page_height=792.0,
        xml_segments_boxes=[], label_segments_boxes=[],
    )
    base.update(kw)
    return base


def _req_row(**kw):
    base = dict(
        run_name=RUN, extraction_name=None, url=None, entity_name=None,
        source_text=None, page_width=612.0, page_height=792.0,
        xml_segments_boxes=[],
    )
    base.update(kw)
    return base


def _box(left, top, width, height, page=1, type_=None):
    return dict(left=float(left), top=float(top), width=float(width),
                height=float(height), page_width=612.0, page_height=792.0,
                page_number=page, segment_type=type_)


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 8, partitions=2).cache()


def test_pdf_to_text_golden(spark, pages):
    """Reference test_pdf_to_text (test_end_to_end.py:97-192): label box
    (123,45,87,16) browser-px + label 'Original: English' → suggestion
    text 'Original: English', segment_text contains it, page 1."""
    labels = spark.createDataFrame(
        [_label_row(extraction_name="pdf_to_text", url=UN_URL,
                    label_text="Original: English",
                    label_segments_boxes=[_box(123, 45, 87, 16)])],
        LABELS,
    )
    model = train_extraction(spark, labels, pages=pages,
                             run_name=RUN, extraction_name="pdf_to_text")
    reqs = spark.createDataFrame(
        [_req_row(extraction_name="pdf_to_text", url=UN_URL)], PREDICTION_REQUESTS
    )
    out = predict_extraction(spark, model, reqs, pages=pages).collect()
    assert len(out) == 1
    s = out[0]
    assert s["text"] == "Original: English"
    assert "Original: English" in s["segment_text"]
    assert s["page_number"] == 1
    assert s["extraction_name"] == "pdf_to_text"
    assert s["entity_name"] == UN_URL  # fallback (SampleProcessorUseCase.py:55)
    # multi-box provenance, egress-scaled ×4/3 (reference emits 2 boxes at
    # left=529=397·4/3; our line-level contract emits one box per line)
    boxes = s["segments_boxes"]
    assert len(boxes) >= 2
    lefts = {round(b["left"]) for b in boxes}
    assert 529 in lefts  # 397 · 4/3 — the 'Original: English' column


def test_pdf_to_multi_option_golden(spark, pages):
    """Reference test_pdf_to_multi_option (test_end_to_end.py:194-292):
    options {1:'United Nations', 2:'Other'}, multi_value=False →
    segment_text '<p class="ix_paragraph">United Nations</p>', value 1
    highlighted."""
    labels = spark.createDataFrame(
        [_label_row(extraction_name="pdf_to_multi_option", url=UN_URL,
                    values=[{"id": "1", "label": "United Nations"}])],
        LABELS,
    )
    model = train_extraction(
        spark, labels, pages=pages,
        options=[("1", "United Nations"), ("2", "Other")], multi_value=False,
        run_name=RUN, extraction_name="pdf_to_multi_option",
    )
    reqs = spark.createDataFrame(
        [_req_row(extraction_name="pdf_to_multi_option", url=UN_URL)],
        PREDICTION_REQUESTS,
    )
    out = predict_extraction(spark, model, reqs, pages=pages).collect()
    assert len(out) == 1
    s = out[0]
    assert s["segment_text"] == '<p class="ix_paragraph">United Nations</p>'
    assert [(v["id"], v["label"], v["segment_text"]) for v in s["values"]] == [
        ("1", "United Nations",
         '<p class="ix_matching_paragraph"><span class="ix_match">United Nations</span></p>')
    ]
    # box = token box (123,45,87,16) ×4/3 egress = (164,60,116,21.33)
    b = s["segments_boxes"][0]
    assert round(b["left"]) == 164 and round(b["top"]) == 60
    assert b["page_number"] == 1


def test_text_to_multi_option_golden(spark):
    """Reference test_text_to_multi_option (test_end_to_end.py:294-398):
    multi_value=True; 'Option 2 Option 3' → values 2 and 3, each with its
    own highlight markup (exact strings pinned)."""
    labels = spark.createDataFrame(
        [
            _label_row(extraction_name="text_to_multi_option",
                       entity_name="entity_name_1", source_text="Option 1 Option 2",
                       values=[{"id": "1", "label": "1"}, {"id": "2", "label": "2"}]),
            _label_row(extraction_name="text_to_multi_option",
                       entity_name="entity_name_2", source_text="Option 2",
                       values=[{"id": "2", "label": "2"}]),
        ],
        LABELS,
    )
    model = train_extraction(
        spark, labels, options=[("1", "1"), ("2", "2"), ("3", "3")],
        multi_value=True, run_name=RUN, extraction_name="text_to_multi_option",
    )
    reqs = spark.createDataFrame(
        [
            _req_row(extraction_name="text_to_multi_option",
                     entity_name="entity_name_1", source_text="Option 1"),
            _req_row(extraction_name="text_to_multi_option",
                     entity_name="entity_name_2", source_text="Option 2 Option 3"),
        ],
        PREDICTION_REQUESTS,
    )
    out = {r["entity_name"]: r for r in
           predict_extraction(spark, model, reqs).collect()}
    assert len(out) == 2
    v1 = out["entity_name_1"]["values"]
    assert [(v["id"], v["label"], v["segment_text"]) for v in v1] == [
        ("1", "1", '<p class="ix_matching_paragraph">Option <span class="ix_match">1</span></p>')
    ]
    v2 = out["entity_name_2"]["values"]
    assert [(v["id"], v["label"], v["segment_text"]) for v in v2] == [
        ("2", "2",
         '<p class="ix_matching_paragraph">Option <span class="ix_match">2</span> Option 3</p>'),
        ("3", "3",
         '<p class="ix_matching_paragraph">Option 2 Option <span class="ix_match">3</span></p>'),
    ]


def test_text_to_text_golden(spark):
    """Reference test_text_to_text (test_end_to_end.py:400-485): trained
    ('Option 1'→'1', 'Option 2'→'2'), predicts 'Option 3'→'3' with exact
    highlight markup."""
    labels = spark.createDataFrame(
        [
            _label_row(extraction_name="text_to_text", entity_name="entity_name_1",
                       label_text="1", source_text="Option 1"),
            _label_row(extraction_name="text_to_text", entity_name="entity_name_2",
                       label_text="2", source_text="Option 2"),
        ],
        LABELS,
    )
    model = train_extraction(spark, labels, run_name=RUN,
                             extraction_name="text_to_text")
    reqs = spark.createDataFrame(
        [
            _req_row(extraction_name="text_to_text", entity_name="entity_name_1",
                     source_text="Option 1"),
            _req_row(extraction_name="text_to_text", entity_name="entity_name_2",
                     source_text="Option 3"),
        ],
        PREDICTION_REQUESTS,
    )
    out = {r["entity_name"]: r for r in
           predict_extraction(spark, model, reqs).collect()}
    assert out["entity_name_1"]["text"] == "1"
    assert out["entity_name_1"]["segment_text"] == (
        '<p class="ix_matching_paragraph">Option <span class="ix_match">1</span></p>'
    )
    assert out["entity_name_2"]["text"] == "3"
    assert out["entity_name_2"]["segment_text"] == (
        '<p class="ix_matching_paragraph">Option <span class="ix_match">3</span></p>'
    )


def test_empty_training_set_pinned_error(spark):
    """Reference test_end_to_end.py:72 — exact error string."""
    labels = spark.createDataFrame([], LABELS)
    with pytest.raises(ValueError, match=NO_VALID_RESULTS):
        train_extraction(spark, labels, run_name=RUN, extraction_name="missing",
                         options=[("1", "x")])
    with pytest.raises(ValueError, match=NO_VALID_RESULTS):
        train_extraction(spark, labels, run_name=RUN, extraction_name="missing")


def test_scaling_laws(spark):
    """F5/F6 pinned arithmetic: ingest (8,12,16,20)→(6,9,12,15)
    (test_app.py:109-152); egress (3,6,9,12)→(4,8,12,16) (test_app.py:347-398)."""
    from pdf_metadata_extraction_spark.operators.boxes import (
        scale_down_labels, scale_up_output,
    )
    df = spark.createDataFrame(
        [([_box(8, 12, 16, 20)],)], "boxes array<struct<left:double,top:double,"
        "width:double,height:double,page_width:double,page_height:double,"
        "page_number:int,segment_type:string>>",
    )
    down = df.select(scale_down_labels("boxes").alias("b")).collect()[0]["b"][0]
    assert (down["left"], down["top"], down["width"], down["height"]) == (6, 9, 12, 15)
    df2 = spark.createDataFrame(
        [([_box(3, 6, 9, 12)],)], df.schema.simpleString().replace("struct<boxes:", "")[:-1]
    ) if False else spark.createDataFrame([([_box(3, 6, 9, 12)],)], df.schema)
    up = df2.select(scale_up_output("boxes").alias("b")).collect()[0]["b"][0]
    assert (up["left"], up["top"], up["width"], up["height"]) == (4, 8, 12, 16)


def test_pdf_to_multi_option_multivalue_across_segments(spark, pages):
    """multi_value=True on a pdf doc: values collected from the matching
    segment; each value keeps its own highlight (exercises the pdf branch
    of multi_value=True, untested by the reference's own suite)."""
    labels = spark.createDataFrame(
        [_label_row(extraction_name="mv_pdf", url=UN_URL,
                    values=[{"id": "1", "label": "United Nations"}])],
        LABELS,
    )
    model = train_extraction(
        spark, labels, pages=pages,
        options=[("1", "United Nations"), ("2", "General Assembly")],
        multi_value=True, run_name=RUN, extraction_name="mv_pdf",
    )
    reqs = spark.createDataFrame(
        [_req_row(extraction_name="mv_pdf", url=UN_URL)], PREDICTION_REQUESTS
    )
    out = predict_extraction(spark, model, reqs, pages=pages).collect()
    assert len(out) == 1
    ids = sorted(v["id"] for v in out[0]["values"])
    # 'United Nations' matches its own segment; the winning segment is the
    # one with the most matches — both labels appear in the doc
    assert "1" in ids or "2" in ids


def test_text_to_text_date_method(spark):
    """DateIsoMethod wins the argmax when labels are ISO dates extracted
    from prose (X2 date-parsing family)."""
    labels = spark.createDataFrame(
        [
            _label_row(extraction_name="dates", entity_name="d1",
                       label_text="2021-02-15",
                       source_text="Distr.: General 15 February 2021"),
            _label_row(extraction_name="dates", entity_name="d2",
                       label_text="2019-09-17",
                       source_text="Adopted on 17 September 2019 in session"),
        ],
        LABELS,
    )
    model = train_extraction(spark, labels, run_name=RUN, extraction_name="dates")
    assert model.method_name == "date_iso"
    reqs = spark.createDataFrame(
        [_req_row(extraction_name="dates", entity_name="d3",
                  source_text="Scheduled for 3 March 2024 at noon")],
        PREDICTION_REQUESTS,
    )
    out = predict_extraction(spark, model, reqs).collect()
    assert out[0]["text"] == "2024-03-03"
