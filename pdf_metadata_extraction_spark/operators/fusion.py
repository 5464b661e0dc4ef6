"""Knowledge fusion: conflicting-triple resolution + co-occurrence PMI.

The extraction layer emits one (subj, pred, obj) assertion per source
page (triples.py; reference analogue: one Suggestion per sample,
/root/reference/src/tests/test_app.py:565-587). At corpus scale the
same (subj, pred) carries CONFLICTING objects — different pages assert
different values — so a knowledge graph needs a fusion step that picks
one canonical object per (subj, pred) with an auditable confidence
(Dong et al., "Knowledge Vault" / "From Data Fusion to Knowledge
Fusion", VLDB 2014: truth-finding by source-vote majority is the
baseline every weighted scheme is measured against).

Scale shape: everything is narrow (subj, pred, obj, src) rows through
hash aggregations with map-side partials — no windows, no driver
loops. The winner per (subj, pred) is a single ``min(struct(-support,
obj))`` aggregate (max support, lexicographically-smallest object on
ties: a total order, so re-runs and re-partitionings pick the same
winner), NOT a row_number window (which would sort whole partitions).

``cooccurrence_pmi`` is the sibling edge-DISCOVERY step: entities
co-mentioned on one page more often than chance (positive PMI) are
candidate relation edges (Church & Hanks 1990). Pairs are generated
row-locally from each page's sorted distinct mention set (array
expressions — no self-join of the mention table with itself, which at
10^12 pages would shuffle the whole table twice); only the (a, b) pair
counts — quadratic only in the PER-PAGE mention count — reach the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fuse_edges", "cooccurrence_pmi", "ordered_pairs", "fuse_timeline",
    "triple_diff", "match_bgp",
]


def ordered_pairs(arr):
    """All (i < j) combinations of a SORTED array column as an array of
    (a, b) structs — row-local, no self-join. Shared by co-occurrence
    PMI and graph link prediction; quadratic in the ARRAY length only,
    so callers bound the array (max_per_doc / max_center_degree)."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(
                    arr, i + 2,
                    F.greatest(F.size(arr) - (i + 1), F.lit(0)),
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def fuse_edges(
    edges: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    src: str = "provenance_url",
) -> DataFrame:
    """One canonical object per (subj, pred) by source-vote majority.

    - one vote per SOURCE per assertion (a page repeating the same
      claim five times still counts once): votes = distinct
      (subj, pred, obj, src);
    - ``support`` = number of sources asserting the winning object;
    - winner = max support, ties broken by smallest obj (total order —
      deterministic under any partitioning);
    - ``n_objs`` = how many distinct objects competed;
    - ``n_sources`` = distinct sources asserting ANYTHING for the
      (subj, pred) — so ``confidence`` = support / n_sources is the
      fraction of sources that back the winner (≤ 1.0; sources may
      assert several objects).

    Returns (subj, pred, obj, support, n_objs, n_sources, confidence)
    with counts as BIGINT and confidence rounded to 6dp (cross-engine
    stable: one IEEE division of two exact integers, then round).
    """
    votes = edges.select(subj, pred, obj, src).where(
        F.col(obj).isNotNull() & F.col(src).isNotNull()
    ).distinct()
    support = votes.groupBy(subj, pred, obj).agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    # winner via a single aggregate: min over (-support, obj) is
    # (max support, then min obj) — no window, no per-group sort
    winner = support.groupBy(subj, pred).agg(
        F.min(
            F.struct((-F.col("support")).alias("neg"), F.col(obj).alias("o"))
        ).alias("w"),
        F.count(F.lit(1)).cast("long").alias("n_objs"),
    ).select(
        subj, pred,
        F.col("w.o").alias(obj),
        (-F.col("w.neg")).cast("long").alias("support"),
        "n_objs",
    )
    totals = votes.groupBy(subj, pred).agg(
        F.countDistinct(src).cast("long").alias("n_sources")
    )
    return winner.join(totals, [subj, pred]).select(
        subj, pred, obj, "support", "n_objs", "n_sources",
        F.round(F.col("support") / F.col("n_sources"), 6).alias("confidence"),
    )


def cooccurrence_pmi(
    mentions: DataFrame,
    doc_col: str = "doc_id",
    ent_col: str = "label",
    min_pairs: int = 1,
    max_per_doc: int | None = None,
) -> DataFrame:
    """Pointwise mutual information over per-document entity co-mentions.

    ``mentions``: one row per (document, entity) observation (dups
    fine — votes are per document). For entities a < b (lexicographic):

        pmi(a, b) = ln( n_pair * n_docs / (n_a * n_b) )

    with n_docs = documents carrying ≥1 mention, n_a = documents
    mentioning a. All counts are exact BIGINTs; the quotient is ONE
    IEEE division and the ln is rounded to 6dp (cross-engine: ln may
    differ 1 ulp between engines, 6dp absorbs it — same discipline as
    corpus_lm).

    Pair generation is row-local: each document's sorted distinct
    entity array expands to its (i < j) combinations with nested array
    ``transform``s, so the only shuffles are the per-doc set agg and
    the (a, b) count — never a mention ⨝ mention self-join.

    ``max_per_doc`` bounds the row-local expansion: a page with k
    distinct mentions emits C(k, 2) pair structs IN ONE ROW, so at
    web scale an entity-stuffed page (k ~ 10⁴ → 5·10⁷ structs) must
    be capped. The cap keeps the lexicographically-first N mentions
    of the SORTED set — deterministic under any partitioning. Counts
    (n_ent, n_docs) are computed on the capped sets too, so the PMI
    stays self-consistent. None (default) = uncapped, exact.
    """
    m = mentions.select(
        F.col(doc_col).alias("_doc"), F.col(ent_col).alias("_ent")
    ).where(F.col(ent_col).isNotNull())
    ents = F.sort_array(F.collect_set("_ent"))
    if max_per_doc is not None:
        ents = F.slice(ents, 1, max_per_doc)
    per_doc = m.groupBy("_doc").agg(ents.alias("_ents"))
    n_docs = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    ent_counts = per_doc.select(F.explode("_ents").alias("_ent")).groupBy(
        "_ent"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_ent"))
    pairs = per_doc.select(
        F.explode(ordered_pairs(F.col("_ents"))).alias("p")
    ).groupBy(
        F.col("p.a").alias("ent_a"), F.col("p.b").alias("ent_b")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pair")).where(
        F.col("n_pair") >= min_pairs
    )
    # entity marginals are corpus-vocabulary-sized (≪ pages) → broadcast
    ca = F.broadcast(ent_counts.select(
        F.col("_ent").alias("ent_a"), F.col("n_ent").alias("n_a")
    ))
    cb = F.broadcast(ent_counts.select(
        F.col("_ent").alias("ent_b"), F.col("n_ent").alias("n_b")
    ))
    return pairs.join(ca, "ent_a").join(cb, "ent_b").crossJoin(
        F.broadcast(n_docs)  # one-row corpus stat
    ).select(
        "ent_a", "ent_b", "n_pair", "n_a", "n_b", "n_docs",
        F.round(
            F.log(
                (F.col("n_pair") * F.col("n_docs"))
                / (F.col("n_a") * F.col("n_b"))
            ), 6
        ).alias("pmi"),
    )


def fuse_timeline(
    edges: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    ts: str = "ts",
) -> DataFrame:
    """Temporal fusion: the assertion TIMELINE per (subj, pred) over
    timestamped triples — what a Common-Crawl-style corpus (every page
    carries ``warc_ts``) adds over fuse_edges' source-vote snapshot.

    Returns ``(subj, pred, current_obj, n_changes, n_objs, first_ts,
    last_ts)``:

    - ``current_obj``: the object of the LATEST assertion —
      last-write-wins, the standard temporal-KG currency rule; ties at
      the same second break by max object (total order → deterministic
      under any partitioning);
    - ``n_changes``: transitions in the time-ordered assertion
      sequence where the object differs from its predecessor — the
      churn signal (a (subj, pred) that flips objects every crawl is
      either genuinely volatile or an extraction bug; both need the
      audit row);
    - ``n_objs``: distinct objects ever asserted;
    - ``first_ts`` / ``last_ts``: assertion validity span.

    Cross-engine contract: timestamps are floored to epoch SECONDS
    first (Spark unix_timestamp floors; DuckDB epoch() keeps
    fractions, so the oracle wraps it in floor()), ordering is by
    (epoch_s, obj) — fully deterministic even when two crawls land in
    the same second — and duplicate (subj, pred, obj, second)
    assertions collapse before sequencing, so re-crawls of an
    unchanged page don't inflate n_changes' denominators. All counts
    BIGINT.

    Scale shape: one distinct + one window + one hash aggregate, all
    shuffling on the (subj, pred) key. The window sorts only
    within each (subj, pred) group; a pathologically hot key (one
    entity asserted from 10^9 pages) serializes its own partition —
    the distinct-first step bounds that by distinct (obj, second)
    combinations, and a production run with hotter keys pre-aggregates
    to per-(obj, day) buckets before sequencing (same contract,
    coarser clock).
    """
    from pyspark.sql import Window

    es = F.unix_timestamp(F.col(ts)).cast("long")
    t = (
        edges.select(
            F.col(subj).alias("subj"),
            F.col(pred).alias("pred"),
            F.col(obj).alias("obj"),
            es.alias("es"),
        )
        .where(F.col("obj").isNotNull() & F.col("es").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("subj", "pred").orderBy("es", "obj")
    seq = t.withColumn("prev", F.lag("obj").over(w))
    return (
        seq.groupBy("subj", "pred")
        .agg(
            F.max(
                F.struct(F.col("es").alias("_e"), F.col("obj").alias("_o"))
            ).alias("_cur"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("prev") != F.col("obj")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_changes"),
            F.countDistinct("obj").cast("long").alias("n_objs"),
            F.min("es").alias("first_ts"),
            F.max("es").alias("last_ts"),
        )
        .select(
            "subj",
            "pred",
            F.col("_cur._o").alias("current_obj"),
            "n_changes",
            "n_objs",
            "first_ts",
            "last_ts",
        )
    )


def triple_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot-to-snapshot KG diff — what changed between two crawls'
    edge tables: ``(subj, pred, obj, status, fact_status)`` for every
    triple in the symmetric difference.

    ``status``: ``added`` (new snapshot only) / ``removed`` (old only).
    ``fact_status`` classifies the change at (subj, pred) granularity:
    ``object_changed`` when the key exists in BOTH snapshots (the fact
    was re-asserted with a different object — the interesting churn),
    ``new_fact`` / ``retracted_fact`` when the key itself appeared or
    vanished. Unchanged triples never emit (a 10^12-edge diff output
    must be proportional to the CHANGE, not the graph).

    Scale shape: ONE full-outer join on (subj, pred, obj) — both
    snapshots shuffle once on the same key — executed ONCE: the
    key-presence bits come from a (subj, pred) window over the joined
    rows, not a second aggregate branch (Catalyst reuses no exchanges,
    so an agg+re-join formulation would execute the full-outer twice —
    measured, 2 FullOuter nodes; this shape has exactly 1). The window
    adds one (subj, pred) shuffle+sort; a key with a pathological
    object fan-out sorts in one task — the same documented skew class
    as the h-index window, irrelevant next to re-joining two 10^12-row
    snapshots. Deterministic: output is a pure set function of the
    two inputs.
    """
    from pyspark.sql import Window

    o = old.select("subj", "pred", "obj").distinct().withColumn(
        "_o", F.lit(1)
    )
    n = new.select("subj", "pred", "obj").distinct().withColumn(
        "_n", F.lit(1)
    )
    j = o.join(n, ["subj", "pred", "obj"], "full_outer")
    # key presence across BOTH snapshots (unchanged triples count —
    # they prove the key survived) in the same pass over j
    w = Window.partitionBy("subj", "pred")
    classified = j.select(
        "subj",
        "pred",
        "obj",
        "_o",
        "_n",
        F.max("_o").over(w).alias("_ko"),
        F.max("_n").over(w).alias("_kn"),
    )
    return classified.where(
        F.col("_o").isNull() | F.col("_n").isNull()
    ).select(
        "subj",
        "pred",
        "obj",
        F.when(F.col("_o").isNull(), F.lit("added"))
        .otherwise(F.lit("removed"))
        .alias("status"),
        F.when(
            F.col("_ko").isNotNull() & F.col("_kn").isNotNull(),
            F.lit("object_changed"),
        )
        .when(F.col("_o").isNull(), F.lit("new_fact"))
        .otherwise(F.lit("retracted_fact"))
        .alias("fact_status"),
    )


def match_bgp(edges: DataFrame, patterns) -> DataFrame:
    """Basic-graph-pattern matching over the edges table — the KG
    serving primitive behind SPARQL-style queries: ``patterns`` is a
    list of ``(subj, pred, obj)`` triple patterns where a term
    starting with ``?`` is a variable and anything else is a constant;
    the result is one column per variable, one row per binding that
    satisfies EVERY pattern (bag-of-mappings over the distinct triple
    set, like SPARQL over a graph).

    Example: ``[("?x", "capital", "?y"), ("?y", "population", "?z")]``
    finds every chain x -capital-> y -population-> z.

    Semantics (documented, oracle-mirrored): the edge table is
    deduplicated to a triple SET first (provenance multiplicity must
    not multiply bindings); a variable repeated INSIDE one pattern
    constrains equality (``(?x, p, ?x)`` = self-loops); each
    subsequent pattern must share ≥1 variable with the accumulated
    bindings — a disconnected pattern is a cartesian product and is
    refused loudly rather than silently exploding.

    Scale shape: each pattern is a constant-pruned slice of the edges
    scan (predicate constants push into the scan — a pred-partitioned
    or Iceberg-bucketed edge table prunes files); patterns then chain
    as plain equi-joins on the shared variables, which Catalyst/AQE
    reorders and broadcasts by real selectivity. No windows, no UDFs.
    """
    if not patterns:
        raise ValueError("match_bgp: empty pattern list")
    triples = edges.select("subj", "pred", "obj").distinct()
    out = None
    for i, (s, p, o) in enumerate(patterns):
        t = triples
        renames: dict[str, str] = {}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if isinstance(term, str) and term.startswith("?"):
                var = term[1:]
                if not var:
                    raise ValueError("match_bgp: bare '?' variable")
                if var in renames:
                    # repeated var inside one pattern: equality filter
                    t = t.where(F.col(col) == F.col(renames[var]))
                else:
                    renames[var] = col
            else:
                t = t.where(F.col(col) == F.lit(term))
        t = t.select(
            *[F.col(c).alias(v) for v, c in renames.items()]
        )
        if out is None:
            out = t
        else:
            shared = [c for c in t.columns if c in out.columns]
            if not shared:
                raise ValueError(
                    f"match_bgp: pattern {i} shares no variable with "
                    "the preceding patterns (cartesian product refused)"
                )
            out = out.join(t, shared)
    return out
