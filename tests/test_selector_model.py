"""Selector-model capacity + versioning tests (round-2 verdict #2 and
ADVICE #1): the boosted depth-2 tree scorer must represent feature
interactions the linear scorer provably cannot, and persisted models
from an older feature set must fail loudly at scoring time."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from pdf_metadata_extraction_spark.operators.selector import (
    best_segment_per_doc,
    fit_gbdt,
    fit_logistic,
    score_matrix,
    score_segments,
    train_selector,
)


def _xor_matrix():
    """Deterministic XOR dataset with distractor columns: y depends ONLY
    on the interaction of columns 0 and 1 — zero additive signal."""
    base = np.array(
        [[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]] * 25
    )
    jitter = (np.arange(100) % 7)[:, None] * 0.01  # deterministic, tiny
    X = np.hstack([base + jitter, np.zeros((100, 3))])
    y = (base[:, 0] != base[:, 1]).astype(np.float64)
    return X, y


def test_gbdt_separates_xor_interaction_linear_cannot():
    X, y = _xor_matrix()
    gb = fit_gbdt(X, y)
    acc_gb = float((((score_matrix(X, gb) > 0.5)) == y).mean())
    assert acc_gb == 1.0
    lin = fit_logistic(X, y)
    acc_lin = float((((score_matrix(X, lin) > 0.5)) == y).mean())
    assert acc_lin <= 0.75  # additive model: XOR is information-free
    # determinism: refit produces the identical model
    assert fit_gbdt(X, y) == gb


def test_score_matrix_rejects_stale_feature_count():
    X, y = _xor_matrix()
    gb = fit_gbdt(X, y)
    with pytest.raises(ValueError, match="stale selector model"):
        score_matrix(np.zeros((3, 9)), gb)
    # legacy linear state persisted BEFORE n_features existed
    legacy = {"w": [0.0] * 12, "b": 0.0, "mu": [0.0] * 12, "sd": [1.0] * 12}
    with pytest.raises(ValueError, match="stale selector model"):
        score_matrix(np.zeros((3, 38)), legacy)


_BOXES_T = (
    "array<struct<left:double,top:double,width:double,height:double,"
    "page_width:double,page_height:double>>"
)


def _xor_segments(spark):
    """Per-doc top-1 XOR scenario: globally consistent labels where the
    winning segment is (big font, page 2) in type-A docs and (small
    font, page 1) in type-B docs — the decoys make every single feature
    (font, page, position) uninformative on its own:
      (16, page2) → label    (8, page1) → label
      (16, page1) → decoy    (8, page2) → decoy
    No additive scorer can rank both doc types correctly (g(2)>g(1) and
    g(1)>g(2) simultaneously) — at ANY type mix, so the 8:4 mix below
    keeps the additive impossibility while giving the greedy root split
    nonzero gain (perfectly symmetric XOR has zero root gain for every
    greedy tree learner, LightGBM included)."""
    rows = []
    for d in range(12):
        typ_a = d % 3 != 0
        segs = (
            [(16.0, 2, 1.0), (16.0, 1, 0.0), (8.0, 2, 0.0)]
            if typ_a
            else [(8.0, 1, 1.0), (16.0, 1, 0.0), (8.0, 2, 0.0)]
        )
        rot = d % 3  # rotate label position so segment_id carries no signal
        segs = segs[rot:] + segs[:rot]
        for sid, (font, page, lab) in enumerate(segs):
            rows.append((f"u{d}", page, sid, "Text", "hello world",
                         None, font, 0.0, lab))
    return spark.createDataFrame(
        rows,
        f"url string, page int, segment_id int, segment_type string, "
        f"text string, boxes {_BOXES_T}, font_size double, "
        f"bold_ratio double, is_label double",
    )


def test_selector_picks_interaction_only_label(spark):
    """End-to-end W1: train on the XOR corpus, then the top-1 segment per
    doc must be the interaction-defined label in BOTH doc types."""
    segs = _xor_segments(spark)
    state = train_selector(segs, vocab=[])
    assert state["kind"] == "gbdt" and not state["degenerate"]
    scored = score_segments(segs.drop("is_label"), state)
    best = {r["url"]: (r["font_size"], r["page"])
            for r in best_segment_per_doc(scored).collect()}
    for d in range(12):
        expected = (16.0, 2) if d % 3 != 0 else (8.0, 1)
        assert best[f"u{d}"] == expected, (d, best[f"u{d}"])
