"""Task dispatch — the reference's queue-processor flow as one driver
function (SURVEY.md §3.1/§3.2; MetadataExtractorQueueProcessor at
/root/reference/src/drivers/queues_processor/
MetadataExtractorQueueProcessor.py:116-209).

``handle_task`` consumes one validated task message and returns the
ResultsMessage-shaped dict the reference emits
(src/domain/ResultsMessage.py:8-17):

- ``create_model``  → train, save model, success (error_message "")
- ``suggestions``   → load model (missing → pinned "Extractor job not
  found"), predict, append triples to the suggestions table,
  data_url → the suggestions location
- anything else     → rejected upstream by streaming.tasks.parse_tasks (F4)

This is deliberately a thin driver-side loop: all data-plane work stays
in plans/pipeline.py DataFrames. Wire it to streaming.tasks.run_dispatch
for the queue-fed deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pdf_metadata_extraction_spark.operators.methods import NO_VALID_RESULTS
from pdf_metadata_extraction_spark.plans import model_store
from pdf_metadata_extraction_spark.plans.pipeline import (
    TrainingCancelled,
    predict_extraction,
    train_extraction,
)


def handle_task(
    spark: SparkSession,
    task: dict,
    labels: DataFrame,
    requests: DataFrame,
    pages: DataFrame | None,
    model_root: str,
    suggestions_dir: str,
    options_by_id: dict[str, list[tuple[str, str]]] | None = None,
    xml_data: DataFrame | None = None,
    bm25_index=None,
) -> dict:
    """One task → ResultsMessage dict {tenant, task, params, success,
    error_message, data_url}.

    ``bm25_index``: an operators.search.Bm25Index held by the CALLER
    across tasks — ``search`` tasks answer from its persisted postings
    (built once per corpus, reused by every later query; round-4
    verdict #7)."""
    tenant = task["tenant"]
    kind = task["task"]
    params = task.get("params") or {}
    extraction_id = params.get("id")
    base = {
        "tenant": tenant,
        "task": kind,
        "params": params,
        "success": True,
        "error_message": "",
        "data_url": None,
    }
    try:
        if kind == "create_model":
            options = (options_by_id or {}).get(extraction_id) or None
            # cancellation parity: the flag set via cancel_training is
            # polled between training stages (consume-on-read, like the
            # reference worker polling /is_extractor_cancelled); one
            # more check before save so a late cancel writes no model
            cancel_check = lambda: model_store.is_extractor_cancelled(  # noqa: E731
                model_root, tenant, extraction_id
            )
            model = train_extraction(
                spark, labels, pages=pages,
                options=options,
                multi_value=bool(params.get("multi_value")),
                run_name=tenant, extraction_name=extraction_id,
                cancel_check=cancel_check,
            )
            if cancel_check():
                raise TrainingCancelled()
            model_store.save_model(model_root, model)
            return base
        if kind == "suggestions":
            model = model_store.load_model(model_root, tenant, extraction_id)
            triples = predict_extraction(spark, model, requests, pages=pages)
            out = os.path.join(suggestions_dir, tenant, extraction_id)
            triples.write.mode("overwrite").parquet(out)
            base["data_url"] = out
            return base
        if kind == "search":
            assert bm25_index is not None, "search task needs a Bm25Index"
            out = os.path.join(
                suggestions_dir, "search", extraction_id or tenant
            )
            bm25_index.query(
                list(params.get("terms") or []),
                topk=int(params.get("topk") or 10),
            ).write.mode("overwrite").parquet(out)
            base["data_url"] = out
            return base
        if kind == "extract_paragraphs":
            from pdf_metadata_extraction_spark.plans.paragraphs import (
                extract_paragraphs,
            )

            assert pages is not None and xml_data is not None
            out = os.path.join(suggestions_dir, "paragraphs", extraction_id or tenant)
            extract_paragraphs(spark, pages, xml_data).write.mode(
                "overwrite"
            ).parquet(out)
            base["data_url"] = out
            return base
        raise ValueError(f"unknown task {kind}")
    except TrainingCancelled:
        return {**base, "success": False,
                "error_message": model_store.CANCELLED_MESSAGE}
    except FileNotFoundError:
        return {**base, "success": False,
                "error_message": model_store.MODEL_NOT_FOUND}
    except ValueError as e:
        msg = str(e)
        if msg != NO_VALID_RESULTS:
            raise
        return {**base, "success": False, "error_message": msg}
