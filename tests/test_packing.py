"""Sequence packing: exact global offsets from the distributed prefix
sum, boundary-straddling docs, and invariance to the range count."""

import pyspark.sql.functions as F

from pdf_metadata_extraction_spark.operators.packing import (
    doc_token_counts,
    pack_sequences,
    with_global_offsets,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_offsets_partition_the_stream_exactly(spark):
    docs = _docs(spark, ["a b c", "d e", "f g h i", "", "j"])
    offs = with_global_offsets(doc_token_counts(docs), num_ranges=2).collect()
    # offsets sorted by the deterministic key form an exact partition
    # of [0, total): each off equals the running sum before it
    rows = sorted(offs, key=lambda r: r["off"])
    acc = 0
    for r in rows:
        if r["n_tokens"] == 0:
            continue
        assert r["off"] == acc or r["n_tokens"] == 0
        acc += r["n_tokens"]
    assert acc == 10  # 3 + 2 + 4 + 0 + 1


def test_offsets_invariant_to_range_count_and_input_layout(spark):
    """The two-pass prefix sum must yield byte-identical offsets for
    any num_ranges and any input partitioning — the scale knob cannot
    change results."""
    docs = _docs(spark, [f"w{i} " * (i % 7 + 1) for i in range(50)])
    base = sorted(
        tuple(r)
        for r in with_global_offsets(doc_token_counts(docs), 1).collect()
    )
    for variant in (
        with_global_offsets(doc_token_counts(docs), 8),
        with_global_offsets(doc_token_counts(docs.repartition(13)), 4),
    ):
        assert sorted(tuple(r) for r in variant.collect()) == base


def test_pack_sequences_chunks_and_straddles(spark):
    """seq_len=4 over 10 tokens → sequences 0 and 1 hold exactly 4
    tokens, sequence 2 holds the 2-token tail; a doc straddling a
    boundary splits into consecutive pieces that tile the doc."""
    docs = _docs(spark, ["a b c", "d e", "f g h i", "", "j"])
    pieces = pack_sequences(docs, seq_len=4).collect()
    by_seq = {}
    for p in pieces:
        by_seq.setdefault(p["seq_id"], []).append(p)
    assert sum(p["n_piece"] for p in pieces) == 10
    assert sorted(by_seq) == [0, 1, 2]
    assert sum(p["n_piece"] for p in by_seq[0]) == 4
    assert sum(p["n_piece"] for p in by_seq[1]) == 4
    assert sum(p["n_piece"] for p in by_seq[2]) == 2
    # in-sequence positions tile [0, fill) with no gaps or overlaps
    for sid, ps in by_seq.items():
        spans = sorted((p["start_in_seq"], p["n_piece"]) for p in ps)
        pos = 0
        for start, n in spans:
            assert start == pos and n > 0
            pos += n
    # each doc's pieces tile the doc itself
    by_doc = {}
    for p in pieces:
        by_doc.setdefault(p["doc_id"], []).append(p)
    for did, ps in by_doc.items():
        spans = sorted((p["tok_start_in_doc"], p["n_piece"]) for p in ps)
        pos = 0
        for start, n in spans:
            assert start == pos
            pos += n
        n_tok = {r["doc_id"]: r["n_tokens"] for r in
                 doc_token_counts(docs).withColumnRenamed("id", "doc_id").collect()}
        assert pos == n_tok[did]
    # the empty doc emitted nothing
    assert 3 not in by_doc


def test_pack_no_global_partitionless_window(spark):
    """The physical plan must not contain a Window over an unpartitioned
    global sort (the single-task trap this operator exists to avoid):
    every Window partitions by the range id."""
    docs = _docs(spark, [f"w{i} " * 5 for i in range(20)])
    plan = (
        pack_sequences(docs, seq_len=16, num_ranges=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line, line


def test_exact_quantiles_definition_and_range_invariance(spark):
    """Exact discrete quantiles: value at rank max(1, ceil(q*n)) in
    (value, id) order — checked against a python recompute, invariant
    to num_ranges, NULLs excluded."""
    import math

    from pdf_metadata_extraction_spark.operators.quantiles import (
        exact_quantiles,
    )

    vals = [(i, ((i * 37) % 101) + 1) for i in range(200)]
    rows = vals + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    qs = [0.5, 0.9, 0.99, 1.0]
    got = {
        r["q_ppm"]: (r["value"], r["n"])
        for r in exact_quantiles(df, "v", "doc_id", qs).collect()
    }
    ordered = sorted(vals, key=lambda t: (t[1], t[0]))
    for q in qs:
        rank = max(1, math.ceil(q * 200))
        assert got[int(round(q * 1e6))] == (ordered[rank - 1][1], 200), q
    for nr in (1, 3, 64):
        alt = {
            r["q_ppm"]: (r["value"], r["n"])
            for r in exact_quantiles(
                df, "v", "doc_id", qs, num_ranges=nr
            ).collect()
        }
        assert alt == got, nr


def test_global_rank_exact_at_boundary_sampling_scale(spark):
    """Regression (round 7): with enough rows that the range
    partitioner SAMPLES boundaries (spark.sql.execution.rangeExchange
    .sampleSizePerPartition ~100/partition) instead of seeing every
    row, the count pass and the rank pass MUST observe the same
    boundaries. The old two-action form (driver-collected totals, then
    a separate rank job) re-sampled boundaries per action with a
    different seed and produced duplicated/skipped ranks; the one-plan
    form shares one exchange, so ranks are exactly 1..n."""
    from pdf_metadata_extraction_spark.operators.packing import global_rank

    n = 60_000
    df = spark.range(0, n).select(
        (F.col("id") % 997).alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    ranked = global_rank(df, ["k", "v"], num_ranges=8)
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.countDistinct("rnk").alias("d"),
        F.min("rnk").alias("lo"),
        F.max("rnk").alias("hi"),
    ).collect()[0]
    assert (agg["n"], agg["d"], agg["lo"], agg["hi"]) == (n, n, 1, n)
