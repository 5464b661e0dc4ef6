"""N-Triples serialization of the materialized KG — the interchange
format (W3C RDF 1.1 N-Triples) a downstream triple store actually
loads, as pure map-only column expressions.

Why expressions and not a UDF: serialization is per-row string
assembly — exactly what whole-stage codegen eats. Escaping is a chain
of LITERAL ``F.replace`` calls (no regex engine), safe by construction
in the encode direction because each rewrite's output introduces only
backslash/percent sequences that no later rewrite targets (backslash
and ``%`` are rewritten FIRST). The decode direction is the classic
splice trap (``\\\\n`` must become backslash+n, never newline), so
``unescape_literal`` does a single-pass fold over a backslash split —
the same shape as urlnorm's single-pass %-decode — instead of chained
replaces.

Reference anchor: the reference emits suggestions as JSON rows
(SURVEY.md §2.7 X5); N-Triples is the KG-shaped final-mile serializer
over the canonicalized edges table (north rule: "graph materialize").

Scale shape: both directions are map-only (zero shuffles, zero UDFs,
zero windows); export fuses into whatever scan produced the edges and
writes as ``spark.write.text`` — a 10^12-edge export is pure
parallel-write throughput.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# IRI percent-escapes: the N-Triples IRIREF production forbids these
# raw characters inside <...>. '%' must be first (it appears in every
# escape's output); backslash is forbidden too.
_IRI_ESCAPES = [
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("\\", "%5C"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("\n", "%0A"),
    ("\r", "%0D"),
    ("\t", "%09"),
]

# literal ECHAR escapes: backslash first (its output is the escape
# introducer), then the characters whose escapes contain it.
_LIT_ESCAPES = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]


def escape_iri(c: Column) -> Column:
    for raw, enc in _IRI_ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(enc))
    return c


def escape_literal(c: Column) -> Column:
    for raw, enc in _LIT_ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(enc))
    return c


def unescape_literal(c: Column) -> Column:
    """Single-pass ECHAR decode: split on backslash, fold with a
    (out, pending-literal) struct accumulator. Each boundary backslash
    either starts a 2-char escape (next segment's first char is the
    code) or — when the next segment is empty — IS an escaped
    backslash, which consumes the following boundary (the ``lit``
    flag). Unknown codes pass through unchanged (lenient, like real
    loaders). No regex, no UDF; DuckDB mirror = list_reduce over
    string_split (same fold)."""
    segs = F.split(c, r"\\")  # regex for ONE literal backslash
    first = F.get(segs, 0)
    rest = F.slice(
        segs, 2, F.greatest(F.size(segs) - 1, F.lit(0))
    )
    decode = (
        lambda s: F.when(s == "n", F.lit("\n"))
        .when(s == "t", F.lit("\t"))
        .when(s == "r", F.lit("\r"))
        .when(s == '"', F.lit('"'))
        .otherwise(F.concat(F.lit("\\"), s))
    )
    folded = F.aggregate(
        rest,
        F.struct(
            first.alias("out"), F.lit(False).alias("lit")
        ),
        lambda acc, seg: F.when(
            acc["lit"],
            F.struct(
                F.concat(acc["out"], seg).alias("out"),
                F.lit(False).alias("lit"),
            ),
        )
        .when(
            seg == "",
            F.struct(
                F.concat(acc["out"], F.lit("\\")).alias("out"),
                F.lit(True).alias("lit"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(
                    acc["out"],
                    decode(F.substring(seg, 1, 1)),
                    F.substring(seg, 2, F.length(seg)),
                ).alias("out"),
                F.lit(False).alias("lit"),
            )
        ),
        # a trailing consumed boundary ("...\\" at end of string)
        # leaves lit=true with the backslash already emitted
        lambda acc: acc["out"],
    )
    return F.when(c.isNull(), F.lit(None)).otherwise(folded)


def to_ntriples(
    edges: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    base_iri: str = "kg:",
) -> DataFrame:
    """Serialize (subj, pred, obj) rows to one N-Triples ``line`` per
    edge: ``<base+subj> <base+pred> "obj" .`` — subjects/predicates as
    percent-escaped IRIs under ``base_iri``, objects as ECHAR-escaped
    string literals. NULL in any term drops the row (N-Triples has no
    null; a half-serialized triple is corrupt output)."""
    return edges.where(
        F.col(subj_col).isNotNull()
        & F.col(pred_col).isNotNull()
        & F.col(obj_col).isNotNull()
    ).select(
        F.concat(
            F.lit("<" + base_iri),
            escape_iri(F.col(subj_col)),
            F.lit("> <" + base_iri),
            escape_iri(F.col(pred_col)),
            F.lit('> "'),
            escape_literal(F.col(obj_col)),
            F.lit('" .'),
        ).alias("line")
    )


_NT_LINE_RE = r'^<([^>]*)> <([^>]*)> "((?:[^"\\]|\\.)*)" \.$'


def parse_ntriples(
    lines: DataFrame,
    line_col: str = "line",
    base_iri: str = "kg:",
) -> DataFrame:
    """Parse N-Triples lines (as produced by ``to_ntriples``) back to
    (subj, pred, obj). Lines that don't match the production (comments,
    blank lines, foreign syntax like typed literals) drop — the
    documented lenient-reader contract. IRI %-unescape inverts only
    the escapes the writer emits (%-encode of a fixed set — a reserved
    residue like %2525 decodes once, matching the writer exactly);
    literal unescape is the single-pass fold."""
    m = F.regexp_extract(F.col(line_col), _NT_LINE_RE, 0)
    parsed = lines.where(m != "").select(
        F.regexp_extract(F.col(line_col), _NT_LINE_RE, 1).alias("_s"),
        F.regexp_extract(F.col(line_col), _NT_LINE_RE, 2).alias("_p"),
        F.regexp_extract(F.col(line_col), _NT_LINE_RE, 3).alias("_o"),
    )

    def un_iri(c: Column) -> Column:
        # inverse order: '%25' must decode LAST (it's the writer's
        # first escape, so decoding it first would splice)
        for raw, enc in reversed(_IRI_ESCAPES):
            c = F.replace(c, F.lit(enc), F.lit(raw))
        return c

    strip = len(base_iri) + 1
    return parsed.select(
        un_iri(F.substring("_s", strip, F.lit(2147483647))).alias("subj"),
        un_iri(F.substring("_p", strip, F.lit(2147483647))).alias("pred"),
        unescape_literal(F.col("_o")).alias("obj"),
    )
