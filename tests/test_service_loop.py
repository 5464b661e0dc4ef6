"""End-to-end service-loop test: task messages → train → predict →
suggestions table + ResultsMessage shapes (mirrors the reference's
queue-driven e2e flow, test_end_to_end.py:97-192)."""

from pyspark.sql import functions as F

from pdf_metadata_extraction_spark.plans.model_store import MODEL_NOT_FOUND
from pdf_metadata_extraction_spark.plans.service import handle_task
from pdf_metadata_extraction_spark.schemas import LABELS, PREDICTION_REQUESTS

RUN = "svc_test"


def test_service_create_model_then_suggestions(spark, tmp_path):
    labels = spark.createDataFrame(
        [
            dict(run_name=RUN, extraction_name="t2t", url=None, language_iso="en",
                 label_text="1", values=None, source_text="Option 1",
                 entity_name="e1", page_width=0.0, page_height=0.0,
                 xml_segments_boxes=[], label_segments_boxes=[]),
            dict(run_name=RUN, extraction_name="t2t", url=None, language_iso="en",
                 label_text="2", values=None, source_text="Option 2",
                 entity_name="e2", page_width=0.0, page_height=0.0,
                 xml_segments_boxes=[], label_segments_boxes=[]),
        ],
        LABELS,
    )
    requests = spark.createDataFrame(
        [dict(run_name=RUN, extraction_name="t2t", url=None, entity_name="e3",
              source_text="Option 7", page_width=0.0, page_height=0.0,
              xml_segments_boxes=[])],
        PREDICTION_REQUESTS,
    )
    model_root = str(tmp_path / "models")
    sugg = str(tmp_path / "suggestions")

    # suggestions before training → pinned "Extractor job not found"
    r = handle_task(spark, {"tenant": RUN, "task": "suggestions",
                            "params": {"id": "t2t"}},
                    labels, requests, None, model_root, sugg)
    assert r["success"] is False and r["error_message"] == MODEL_NOT_FOUND

    r = handle_task(spark, {"tenant": RUN, "task": "create_model",
                            "params": {"id": "t2t"}},
                    labels, requests, None, model_root, sugg)
    assert r == {"tenant": RUN, "task": "create_model", "params": {"id": "t2t"},
                 "success": True, "error_message": "", "data_url": None}

    r = handle_task(spark, {"tenant": RUN, "task": "suggestions",
                            "params": {"id": "t2t"}},
                    labels, requests, None, model_root, sugg)
    assert r["success"] is True and r["data_url"]
    out = spark.read.parquet(r["data_url"])
    row = out.collect()[0]
    assert row["text"] == "7" and row["entity_name"] == "e3"

    # empty training set → pinned performance error in the result message
    r = handle_task(spark, {"tenant": RUN, "task": "create_model",
                            "params": {"id": "missing"}},
                    labels.where(F.lit(False)), requests, None, model_root, sugg)
    assert r["success"] is False
    assert r["error_message"] == "No valid performance results to select the best model"


def test_service_extract_paragraphs(spark, tmp_path):
    from pdf_metadata_extraction_spark.sources.pages_synth import generate_pages

    pages = generate_pages(spark, 6, partitions=2)
    box_schema = (
        "array<struct<left:double,top:double,width:double,height:double,"
        "page_width:double,page_height:double,page_number:int,segment_type:string>>"
    )
    seg_boxes = [
        dict(left=183.0, top=72.0, width=246.0, height=22.0, page_width=612.0,
             page_height=792.0, page_number=1, segment_type="Page header"),
        dict(left=72.0, top=151.0, width=463.0, height=96.0, page_width=612.0,
             page_height=792.0, page_number=1, segment_type="Text"),
        dict(left=72.0, top=290.0, width=43.0, height=12.0, page_width=612.0,
             page_height=792.0, page_number=1, segment_type="Title"),
        dict(left=90.0, top=318.0, width=76.0, height=95.0, page_width=612.0,
             page_height=792.0, page_number=1, segment_type="List item"),
    ]
    xml_data = spark.createDataFrame(
        [("https://fixtures.example.org/lorem_en", "key_1", "en", True, seg_boxes),
         ("https://fixtures.example.org/lorem_fr", "key_1", "fr", False, seg_boxes)],
        f"url string, key string, lang string, is_main boolean, xml_segments_boxes {box_schema}",
    )
    r = handle_task(
        spark,
        {"tenant": RUN, "task": "extract_paragraphs", "params": {"id": "key_1"}},
        labels=None, requests=None, pages=pages,
        model_root=str(tmp_path / "m"), suggestions_dir=str(tmp_path / "s"),
        xml_data=xml_data,
    )
    assert r["success"] is True
    out = spark.read.parquet(r["data_url"]).orderBy("position").collect()
    assert [p["position"] for p in out] == [1, 2]
    texts = {t["language"]: t["text"] for t in out[1]["translations"]}
    assert texts["en"] == "● FORMULA ● FOOTNOTE ● LIST ● TABLE ● FIGURE ● TITLE ● TEXT"


def test_tenancy_isolation(spark, tmp_path):
    """Reference test_app.py:316-403: one tenant's model/data is invisible
    to another (F1 tenancy filter everywhere)."""
    labels = spark.createDataFrame(
        [dict(run_name="tenant_a", extraction_name="x", url=None, language_iso="en",
              label_text="1", values=None, source_text="Option 1",
              entity_name="e", page_width=0.0, page_height=0.0,
              xml_segments_boxes=[], label_segments_boxes=[])],
        LABELS,
    )
    requests = spark.createDataFrame(
        [dict(run_name="tenant_b", extraction_name="x", url=None, entity_name="e",
              source_text="Option 2", page_width=0.0, page_height=0.0,
              xml_segments_boxes=[])],
        PREDICTION_REQUESTS,
    )
    root, sugg = str(tmp_path / "m"), str(tmp_path / "s")
    r = handle_task(spark, {"tenant": "tenant_a", "task": "create_model",
                            "params": {"id": "x"}}, labels, requests, None, root, sugg)
    assert r["success"]
    # tenant_b has no model — pinned not-found error
    r = handle_task(spark, {"tenant": "tenant_b", "task": "suggestions",
                            "params": {"id": "x"}}, labels, requests, None, root, sugg)
    assert r["success"] is False and r["error_message"] == MODEL_NOT_FOUND
    # tenant_a's prediction set is empty (requests belong to tenant_b)
    r = handle_task(spark, {"tenant": "tenant_a", "task": "suggestions",
                            "params": {"id": "x"}}, labels, requests, None, root, sugg)
    assert r["success"] is True
    assert spark.read.parquet(r["data_url"]).count() == 0


def test_cancel_training_parity(spark, tmp_path):
    """Cancellation parity (reference POST /cancel_training +
    GET /is_extractor_cancelled, consume-on-read): a cancelled train
    writes NO model, returns a cancelled ResultsMessage, and the flag is
    consumed by the read."""
    import pytest

    from pdf_metadata_extraction_spark.plans import model_store
    from pdf_metadata_extraction_spark.plans.pipeline import (
        TrainingCancelled,
        train_extraction,
    )

    labels = spark.createDataFrame(
        [
            dict(run_name=RUN, extraction_name="cx", url=None, language_iso="en",
                 label_text="1", values=None, source_text="Option 1",
                 entity_name="e1", page_width=0.0, page_height=0.0,
                 xml_segments_boxes=[], label_segments_boxes=[]),
        ],
        LABELS,
    )
    requests = spark.createDataFrame([], PREDICTION_REQUESTS)
    model_root = str(tmp_path / "models")
    sugg = str(tmp_path / "suggestions")

    # flag semantics: set -> True once -> consumed
    assert model_store.cancel_training(model_root, RUN, "cx") is True
    assert model_store.is_extractor_cancelled(model_root, RUN, "cx") is True
    assert model_store.is_extractor_cancelled(model_root, RUN, "cx") is False

    # cancelled create_model: failure message, no model on disk
    model_store.cancel_training(model_root, RUN, "cx")
    r = handle_task(spark, {"tenant": RUN, "task": "create_model",
                            "params": {"id": "cx"}},
                    labels, requests, None, model_root, sugg)
    assert r["success"] is False
    assert r["error_message"] == model_store.CANCELLED_MESSAGE
    with pytest.raises(FileNotFoundError, match=MODEL_NOT_FOUND):
        model_store.load_model(model_root, RUN, "cx")

    # flag was consumed by the aborted run -> retraining now succeeds
    r = handle_task(spark, {"tenant": RUN, "task": "create_model",
                            "params": {"id": "cx"}},
                    labels, requests, None, model_root, sugg)
    assert r["success"] is True
    assert model_store.load_model(model_root, RUN, "cx").kind == "text_to_text"

    # mid-train cancel: flag raised between stage boundaries is honored
    calls = {"n": 0}

    def late_cancel():
        calls["n"] += 1
        return calls["n"] >= 2  # False at start, True at the next boundary

    with pytest.raises(TrainingCancelled):
        train_extraction(spark, labels, run_name=RUN, extraction_name="cx",
                         cancel_check=late_cancel)
    assert calls["n"] >= 2
