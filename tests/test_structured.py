"""JSON-LD structured-data extraction (operators/structured.py):
island lifting, path probes, honest degradation, and the synthetic
corpus + KG-runner composition."""

from pdf_metadata_extraction_spark.operators.structured import (
    extract_jsonld_blocks,
    jsonld_triples,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode() if isinstance(h, str) else h) for u, h in rows],
        "url string, html binary",
    )


GOOD = (
    '{"@context":"https://schema.org","@type":"Article",'
    '"headline":"Hello KG","datePublished":"2021-03-04",'
    '"author":{"@type":"Person","name":"Ada L"}}'
)


def test_jsonld_island_attribute_variants(spark):
    # double quotes, single quotes, extra attrs, uppercase TYPE, and
    # surrounding whitespace/newlines inside the island
    variants = [
        f'<script type="application/ld+json">{GOOD}</script>',
        f"<script type='application/ld+json'>{GOOD}</script>",
        f'<script async type="application/ld+json" id="x">\n{GOOD}\n</script>',
        f'<SCRIPT TYPE="application/LD+JSON">{GOOD}</SCRIPT>',
    ]
    rows = [(f"u{i}", f"<html><head>{v}</head><body></body></html>")
            for i, v in enumerate(variants)]
    out = extract_jsonld_blocks(_pages(spark, rows)).collect()
    assert len(out) == 4
    assert all(r.json.strip() == GOOD for r in out)


def test_jsonld_triples_values_and_nesting(spark):
    out = jsonld_triples(_pages(spark, [
        ("u", f'<html><script type="application/ld+json">{GOOD}</script></html>'),
    ])).collect()
    got = {(r.pred): r.obj for r in out}
    assert got == {
        "rdf:type": "Article",
        "jsonld:headline": "Hello KG",
        "jsonld:datePublished": "2021-03-04",
        "jsonld:author.name": "Ada L",
    }
    assert all(r.block_idx == 0 for r in out)


def test_jsonld_degrades_to_zero_rows(spark):
    # plain <script> (no type), malformed JSON (object- and
    # array-rooted), a non-array @graph, null html: none of them
    # error, none of them emit triples
    rows = [
        ("plain", "<html><script>var x=1;</script></html>"),
        ("broken", '<html><script type="application/ld+json">{"a": </script></html>'),
        ("brokenarr", '<html><script type="application/ld+json">[{"a": </script></html>'),
        ("graphscalar", '<html><script type="application/ld+json">'
                        '{"@graph": 7}</script></html>'),
    ]
    df = _pages(spark, rows)
    assert jsonld_triples(df).count() == 0
    nulls = spark.createDataFrame([("n", None)], "url string, html binary")
    assert jsonld_triples(nulls).count() == 0


def test_jsonld_array_root_and_graph_container(spark):
    # r5 verdict #4: array-rooted islands and @graph containers lift
    # one node per element, node_idx distinguishing them
    arr = ('[{"@type":"Article","headline":"A1"},'
           '{"@type":"BreadcrumbList","name":"crumbs"}]')
    graph = ('{"@context":"https://schema.org","@graph":'
             '[{"@type":"Article","headline":"G1"},'
             '{"@type":"WebSite","name":"site"}]}')
    out = jsonld_triples(_pages(spark, [
        ("ua", f'<html><script type="application/ld+json">{arr}</script></html>'),
        ("ug", f'<html><script type="application/ld+json">{graph}</script></html>'),
    ])).collect()
    got = {(r.subj, r.node_idx, r.pred): r.obj for r in out}
    assert got == {
        ("ua", 0, "rdf:type"): "Article",
        ("ua", 0, "jsonld:headline"): "A1",
        ("ua", 1, "rdf:type"): "BreadcrumbList",
        ("ua", 1, "jsonld:name"): "crumbs",
        ("ug", 0, "rdf:type"): "Article",
        ("ug", 0, "jsonld:headline"): "G1",
        ("ug", 1, "rdf:type"): "WebSite",
        ("ug", 1, "jsonld:name"): "site",
    }
    # the @graph WRAPPER's own keys are container metadata — not probed
    assert all(r.obj != "https://schema.org" for r in out)
    # scalar array elements degrade to zero rows, object elements keep
    mixed = '[{"@type":"A"}, 42, "str"]'
    m = jsonld_triples(_pages(spark, [
        ("um", f'<html><script type="application/ld+json">{mixed}</script></html>'),
    ])).collect()
    assert {(r.node_idx, r.pred, r.obj) for r in m} == {(0, "rdf:type", "A")}


def test_jsonld_non_scalar_probes_filtered(spark):
    # "name" resolves to an OBJECT here; the scalar filter drops it but
    # keeps the scalar probes of the same island
    island = '{"@type":"Org","name":{"legal":"Acme Inc"},"headline":"t"}'
    out = jsonld_triples(_pages(spark, [
        ("u", f'<html><script type="application/ld+json">{island}</script></html>'),
    ])).collect()
    got = {r.pred: r.obj for r in out}
    assert got == {"rdf:type": "Org", "jsonld:headline": "t"}


def test_jsonld_multiple_islands_indexed(spark):
    h = (
        '<html><script type="application/ld+json">{"@type":"A"}</script>'
        '<p>x</p><script type="application/ld+json">{"@type":"B"}</script></html>'
    )
    out = jsonld_triples(_pages(spark, [("u", h)])).collect()
    got = {(r.block_idx, r.pred): r.obj for r in out}
    assert got == {(0, "rdf:type"): "A", (1, "rdf:type"): "B"}


def test_synth_corpus_carries_jsonld_and_text_is_unchanged(spark):
    from pdf_metadata_extraction_spark.operators.extract import (
        extract_text_of_bytes,
    )
    from pdf_metadata_extraction_spark.sources.pages_synth import (
        generate_pages,
        jsonld_island,
        row_for_doc,
        synth_blocks,
    )

    pages = generate_pages(spark, 40)
    trips = jsonld_triples(pages)
    rows = trips.collect()
    assert rows, "synthetic corpus carries no JSON-LD"
    # exactly the docs whose deterministic island function fires
    with_ld = {r.subj for r in rows}
    expect = set()
    for d in range(6, 40):  # 0..5 are fixture docs (pdf2xml, no HTML head)
        row = row_for_doc(d)
        if jsonld_island(d, synth_blocks(d)[0][1]) is not None:
            expect.add(row["url"])
        # the golden text invariant survives the island injection
        assert extract_text_of_bytes(row["html"]) == row["text"]
    assert with_ld == expect
    # headline mirrors the page title (blocks[0])
    by_url = {(r.subj, r.pred): r.obj for r in rows}
    some = next(iter(expect))
    did = int(some.rsplit("/", 1)[1])
    assert by_url[(some, "jsonld:headline")] == synth_blocks(did)[0][1]


def test_kg_run_jsonld_stage(spark, tmp_path):
    from pdf_metadata_extraction_spark.plans.kg_run import run_kg_pipeline
    from pdf_metadata_extraction_spark.sources.pages_synth import generate_pages

    # a dictionary with ZERO corpus matches: the mention channel comes
    # up empty (which every stage must survive — the empty-checkpoint
    # contract) while the structured channel still yields triples
    opts = spark.createDataFrame(
        [("mentions", "1", "zzz-no-such-token", True)],
        "extraction_name string, option_id string, label string, multi_value boolean",
    )
    pages = generate_pages(spark, 30, partitions=2).select("url", "html")
    work = str(tmp_path / "kgj")
    out = run_kg_pipeline(spark, pages, opts, work, run_id="j1", jsonld=True)
    assert out["edges"].count() == 0
    got = out["edges_jsonld"].collect()
    assert got and all(r.pred.startswith(("rdf:", "jsonld:")) for r in got)
    disk = spark.read.parquet(f"{work}/stages/j1/edges_jsonld").count()
    assert disk == len(got)
    lineage = spark.read.parquet(f"{work}/lineage").collect()
    jl = [r for r in lineage if r["stage"] == "jsonld_extraction"]
    assert jl and jl[0]["input_rows"] == 30 and jl[0]["output_rows"] == len(got)


# ---------------------------------------------------------- og/meta channel
def test_meta_triples_both_attribute_orders(spark):
    from pdf_metadata_extraction_spark.operators.structured import meta_triples

    h = (
        '<html><head>'
        '<meta property="og:title" content="Hello OG" />'
        "<meta content='fr_FR' property='og:locale'/>"
        '<meta name="twitter:title" content="tw" >'
        '<meta property="og:unwanted" content="zzz" />'
        '<meta charset="utf-8"><meta name="viewport" content="width=1">'
        "</head><body></body></html>"
    )
    out = meta_triples(
        _pages(spark, [("u", h)]),
        props=("og:title", "og:locale", "twitter:title"),
    ).collect()
    got = {r.pred: r.obj for r in out}
    assert got == {
        "meta:og:title": "Hello OG",
        "meta:og:locale": "fr_FR",
        "meta:twitter:title": "tw",
    }


def test_meta_triples_first_occurrence_wins_and_nulls(spark):
    from pdf_metadata_extraction_spark.operators.structured import meta_triples

    h = (
        '<html><meta property="og:title" content="first"/>'
        '<meta property="og:title" content="second"/></html>'
    )
    out = meta_triples(_pages(spark, [("u", h)]), props=("og:title",)).collect()
    assert len(out) == 1 and out[0].obj == "first"
    nulls = spark.createDataFrame([("n", None)], "url string, html binary")
    assert meta_triples(nulls).count() == 0


def test_meta_triples_plan_is_window_free(spark):
    from pdf_metadata_extraction_spark.operators.structured import meta_triples

    plan = meta_triples(
        _pages(spark, [("u", "<html></html>")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------- tables
TABLE_PAGE = """<html><body>
<table>
<tr><th>Country</th><th>Capital</th><th>Population</th></tr>
<tr><td>France</td><td>Paris</td><td>67m</td></tr>
<tr><td>Japan</td><td><b>Tokyo</b></td><td>125m</td></tr>
<tr><td>Chad</td><td>N'Djamena</td><td>17m</td><td>extra</td></tr>
<tr><td>Cuba</td><td>Havana</td></tr>
<tr><td></td><td>nokey</td><td>drop</td></tr>
</table>
<table><tr><td>headerless</td><td>drops</td></tr></table>
<table><tr><th>K</th><th>V</th></tr><tr><td>k1</td><td>v1</td></tr></table>
</body></html>"""


def test_table_triples_shapes(spark):
    from pdf_metadata_extraction_spark.operators.structured import table_triples

    out = table_triples(_pages(spark, [("u", TABLE_PAGE)])).collect()
    got = {(r.subj, r.pred, r.obj, r.table_idx, r.row_idx) for r in out}
    assert got == {
        ("France", "Capital", "Paris", 0, 0),
        ("France", "Population", "67m", 0, 0),
        # nested markup stripped from the cell
        ("Japan", "Capital", "Tokyo", 0, 1),
        ("Japan", "Population", "125m", 0, 1),
        # ragged-wide: the extra 4th cell drops
        ("Chad", "Capital", "N'Djamena", 0, 2),
        ("Chad", "Population", "17m", 0, 2),
        # ragged-narrow: missing Population obj drops
        ("Cuba", "Capital", "Havana", 0, 3),
        # headerless table consumed table_idx 1 and emitted nothing;
        # empty-key row emitted nothing
        ("k1", "V", "v1", 2, 0),
    }


def test_table_triples_degrades_and_plan(spark):
    from pdf_metadata_extraction_spark.operators.structured import table_triples

    rows = [
        ("none", "<html><body><p>no tables</p></body></html>"),
        ("empty", "<html><body><table></table></body></html>"),
        # single-column header is not an entity-attribute table
        ("onecol", "<html><table><tr><th>X</th></tr>"
                   "<tr><td>a</td></tr></table></html>"),
    ]
    df = table_triples(_pages(spark, rows))
    assert df.count() == 0
    nulls = spark.createDataFrame([("n", None)], "url string, html binary")
    assert table_triples(nulls).count() == 0
    # map-only: no shuffle, no window, no python UDF in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan
    assert "Python" not in plan
