"""Structured-Streaming task feed — the reference's Redis RSMQ queue
recast (SURVEY.md §2.1 S6, §2.8).

Reference analogue: JSON task messages polled from RSMQ
(/root/reference/src/drivers/queues_processor/
MetadataExtractorQueueProcessor.py:57-70), invalid messages dropped with
a log (F4, :155-162; pinned src/tests/test_end_to_end.py:52-53).

Spark recast: ``readStream`` over a task directory (swap for Kafka in
production — same plan), ``from_json`` validation filter, ``foreachBatch``
dispatch. The reference needs no event-time semantics (its queue is a
work dispatcher), so no watermark/window here; checkpointLocation gives
the same at-least-once + resume guarantees its retry loop provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TASK_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType(), False),
        T.StructField("task", T.StringType(), False),  # create_model | suggestions
        T.StructField(
            "params",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), False),
                    T.StructField("multi_value", T.BooleanType(), True),
                    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
                    # search tasks (served from the persisted BM25
                    # postings index): bag-of-words terms + top-k
                    T.StructField("terms", T.ArrayType(T.StringType()), True),
                    T.StructField("topk", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

VALID_TASKS = ("create_model", "suggestions", "extract_paragraphs", "search")


def parse_tasks(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """F4: from_json + validity filter — malformed messages are dropped,
    never fail the stream (the reference logs and continues)."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), TASK_SCHEMA).alias("msg")
    )
    return (
        parsed.where(F.col("msg").isNotNull())
        .where(F.col("msg.task").isin(*VALID_TASKS))
        .where(F.col("msg.params.id").isNotNull())
        .select("msg.*")
    )


def task_stream(spark: SparkSession, task_dir: str) -> DataFrame:
    """File-source stream of newline-JSON task messages."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(task_dir)
    )
    return parse_tasks(raw, "value")


def run_dispatch(
    tasks: DataFrame,
    handler,
    checkpoint_dir: str,
    once: bool = True,
):
    """foreachBatch dispatch loop with checkpointed progress (resume =
    the reference's at-least-once retry semantics)."""
    writer = (
        tasks.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda batch, epoch: handler(batch.collect(), epoch))
    )
    if once:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    return q
