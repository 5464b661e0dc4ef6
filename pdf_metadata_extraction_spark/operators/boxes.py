"""Box arithmetic — pure column expressions (SURVEY.md §2.2 F5/F6, §2.7 X3).

Reference semantics:
- ingest scale-down: label boxes × **0.75** (browser px → PDF pt);
  ``xml_segments_boxes`` untouched (factor pinned by
  /root/reference/src/tests/test_app.py:109-110 → :144-152).
- egress scale-up: output boxes × **4/3** before returning (pinned by
  test_app.py:347 → :395-398).

Everything here stays JVM-side (``transform`` over array<struct> — no
Python), so it participates in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INGEST_SCALE = 0.75
EGRESS_SCALE = 4.0 / 3.0


def _scale_box(b: Column, factor: float) -> Column:
    return F.struct(
        (b["left"] * factor).alias("left"),
        (b["top"] * factor).alias("top"),
        (b["width"] * factor).alias("width"),
        (b["height"] * factor).alias("height"),
        b["page_width"].alias("page_width"),
        b["page_height"].alias("page_height"),
        b["page_number"].alias("page_number"),
        b["segment_type"].alias("segment_type"),
    )


def scale_boxes(boxes_col: str | Column, factor: float) -> Column:
    """array<SegmentBox> scaled by factor (page dims / type preserved)."""
    col = F.col(boxes_col) if isinstance(boxes_col, str) else boxes_col
    return F.transform(col, lambda b: _scale_box(b, factor))


def scale_down_labels(boxes_col: str | Column) -> Column:
    """F5: ingest ×0.75 (label_segments_boxes only)."""
    return scale_boxes(boxes_col, INGEST_SCALE)


def scale_up_output(boxes_col: str | Column) -> Column:
    """F6: egress ×4/3."""
    return scale_boxes(boxes_col, EGRESS_SCALE)


# ---------------------------------------------------------------- python-side
# (used inside the segmentation Arrow kernel; numpy-vectorizable shapes)
def boxes_intersect(
    al: float, at: float, aw: float, ah: float,
    bl: float, bt: float, bw: float, bh: float,
) -> bool:
    return al < bl + bw and bl < al + aw and at < bt + bh and bt < at + ah
