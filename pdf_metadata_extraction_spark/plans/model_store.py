"""Model artifact store (SURVEY.md §2.1 S8, §2.6 D3).

Reference analogue: ``CloudModelStorage`` — trained model dir uploaded
to object storage with an ``extractor_job.json`` sidecar; download is
short-circuited when a fresh local copy exists; stale local folders are
removed after 3 days (upload/download
/root/reference/src/adapters/CloudModelStorage.py:21-114; TTL cleanup
src/drivers/distributed_worker/distributed_flow.py:39-78).

Spark recast: the ExtractionModel dataclass serializes to one JSON file
under ``{root}/{run_name}/{extraction_name}/model.json`` (object store in
production); prediction loads it once on the driver and broadcasts —
executors never touch the store.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
import uuid

from pdf_metadata_extraction_spark.plans.pipeline import ExtractionModel

MODEL_TTL_SECONDS = 3 * 24 * 3600  # reference: 3 days
MODEL_FILE = "model.json"

MODEL_NOT_FOUND = "Extractor job not found"  # pinned: test_end_to_end.py:85-95


def _model_dir(root: str, run_name: str, extraction_name: str) -> str:
    return os.path.join(root, run_name, extraction_name)


def save_model(root: str, model: ExtractionModel) -> str:
    d = _model_dir(root, model.run_name, model.extraction_name)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, MODEL_FILE)
    with open(path, "w") as fh:
        json.dump(dataclasses.asdict(model), fh)
    return path


def load_model(root: str, run_name: str, extraction_name: str) -> ExtractionModel:
    """Missing model → the reference's exact pinned error message."""
    path = os.path.join(_model_dir(root, run_name, extraction_name), MODEL_FILE)
    if not os.path.exists(path):
        raise FileNotFoundError(MODEL_NOT_FOUND)
    with open(path) as fh:
        data = json.load(fh)
    data["options"] = [tuple(o) for o in data.get("options", [])]
    if data.get("page_stats") is not None:
        data["page_stats"] = tuple(data["page_stats"])
    return ExtractionModel(**data)


def delete_extractor(root: str, run_name: str, extraction_name: str) -> bool:
    """DELETE /{run_name}/{extraction_name}: remove the extraction's
    model + cache folder entirely (reference behavior pinned at
    /root/reference/src/tests/test_app.py:866-885 — returns true and the
    path no longer exists; idempotent on a missing extractor)."""
    d = _model_dir(root, run_name, extraction_name)
    if os.path.isdir(d):
        shutil.rmtree(d)
    return True


CANCEL_FILE = "cancel.flag"
CANCELLED_MESSAGE = "Extractor cancelled"


def cancel_training(root: str, run_name: str, extraction_name: str) -> bool:
    """POST /cancel_training parity (/root/reference/src/drivers/rest/
    app.py:199-221): persist the cancel flag (the reference sets a redis
    key '{run}:{name}:canceled' = 'true'); the worker observes it
    between training stages. Returns True like the endpoint."""
    d = _model_dir(root, run_name, extraction_name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, CANCEL_FILE), "w") as fh:
        fh.write("true")
    return True


def is_extractor_cancelled(root: str, run_name: str, extraction_name: str) -> bool:
    """GET /is_extractor_cancelled parity (app.py:189-196): consume-on-
    read — a True result clears the flag, exactly like the endpoint
    deletes the redis key when it reads 'true'.

    The consume is ATOMIC (rename-then-read): a read-then-remove pair
    would let a concurrent cancel_training() re-write the flag between
    the two steps and be silently deleted unread, and two concurrent
    pollers could both read 'true' with only one consuming. os.rename
    to a poller-unique name is atomic on POSIX — exactly one poller
    wins the rename and observes the cancel; a flag re-set after the
    rename lands under the original name, untouched."""
    d = _model_dir(root, run_name, extraction_name)
    p = os.path.join(d, CANCEL_FILE)
    claimed = os.path.join(d, f".{CANCEL_FILE}.{os.getpid()}.{uuid.uuid4().hex}")
    try:
        os.rename(p, claimed)
    except FileNotFoundError:
        return False
    try:
        with open(claimed) as fh:
            flagged = fh.read().strip() == "true"
    finally:
        os.remove(claimed)
    return flagged


def cleanup_stale_models(root: str, ttl_seconds: int = MODEL_TTL_SECONDS,
                         now: float | None = None) -> list[str]:
    """D3: remove model dirs older than the TTL. Returns removed paths."""
    now = now if now is not None else time.time()
    removed = []
    if not os.path.isdir(root):
        return removed
    for run in os.listdir(root):
        run_dir = os.path.join(root, run)
        if not os.path.isdir(run_dir):
            continue
        for name in os.listdir(run_dir):
            d = os.path.join(run_dir, name)
            mf = os.path.join(d, MODEL_FILE)
            if os.path.isdir(d) and os.path.exists(mf):
                if now - os.path.getmtime(mf) > ttl_seconds:
                    shutil.rmtree(d)
                    removed.append(d)
    return removed
