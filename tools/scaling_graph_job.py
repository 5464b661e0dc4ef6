"""One scaling-bench run: the link-graph + PageRank chain at a given
parallelism — the SECOND workload shape for the two-cluster-size
criterion (the KG pipeline curve lives in tools/scaling_job.py; this
one is shuffle-bearing: anchor resolution is map-only, then the
host-pair aggregation and three join+sum PageRank iterations).

Invoked via spark-submit --py-files dist/pipeline.zip:
    spark-submit --master local[N] tools/scaling_graph_job.py <pages_dir> [runs]

Prints one JSON line {"master": ..., "runs": [sec, ...], "pages": N,
"edges": E, "ranked": R}. The synthetic pages' nav anchors are all
same-host, so each page gets one deterministic cross-host anchor
appended (crc32-derived target) — the graph then has real inter-host
edges for PageRank to rank.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pages_dir = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdf_metadata_extraction_spark.operators.graph import pagerank_fixed
    from pdf_metadata_extraction_spark.operators.links import host_link_edges

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    master = spark.sparkContext.master

    pages = spark.read.parquet(pages_dir).select(
        "url", F.col("html").cast("string").alias("html_text")
    )
    n_pages = pages.count()
    n_bytes = pages.select(F.sum(F.length("html_text"))).collect()[0][0] or 0
    aug = pages.withColumn(
        "html_text",
        F.concat(
            "html_text",
            F.lit('<a href="https://hub'),
            (F.crc32("url") % 50).cast("string"),
            F.lit('.example/x">t</a>'),
        ),
    )

    runs = []
    n_edges = n_ranked = -1
    for _ in range(n_runs):
        t0 = time.monotonic()
        edges = host_link_edges(aug).select(
            F.col("src_host").alias("id_a"), F.col("dst_host").alias("id_b")
        )
        ranks = pagerank_fixed(edges, iters=3)
        n_ranked = ranks.count()
        runs.append(round(time.monotonic() - t0, 3))
    n_edges = host_link_edges(aug).count()

    print(json.dumps({
        "master": master, "pages": n_pages, "bytes": n_bytes,
        "edges": n_edges, "ranked": n_ranked, "runs": runs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
