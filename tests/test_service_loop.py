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
