"""pages source + extraction invariants (BASELINE.json input_hint)."""

from pyspark.sql import functions as F

from graphriccicurvature_spark.sources.extract import extract_links, extract_text, pages_to_edges
from graphriccicurvature_spark.sources.pages import generate_pages, page_outlinks, page_url


def test_pages_schema_and_determinism(spark):
    p = generate_pages(spark, 50)
    assert [f.name for f in p.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    a = sorted(r.url for r in p.collect())
    b = sorted(r.url for r in generate_pages(spark, 50).collect())
    assert a == b


def test_extracted_text_byte_identical(spark):
    """The north-rule invariant: extractor(html) == text, byte for byte."""
    p = generate_pages(spark, 200)
    mismatches = (
        p.withColumn("extracted", extract_text("html"))
        .filter(
            F.encode("extracted", "utf-8").cast("binary") != F.encode("text", "utf-8")
        )
        .count()
    )
    assert mismatches == 0


def test_links_and_edges_match_formula(spark):
    n = 120
    p = generate_pages(spark, n)
    edges, verts = pages_to_edges(p)
    vmap = {r.url: r.id for r in verts.collect()}
    got = {(r.src, r.dst) for r in edges.collect()}
    want = set()
    for i in range(n):
        for j in page_outlinks(i, n):
            want.add((vmap[page_url(i)], vmap[page_url(j)]))
    assert got == want


def test_extract_links_udf(spark):
    p = generate_pages(spark, 30)
    row = (
        p.filter(F.col("url") == page_url(7))
        .select(extract_links("html").alias("links"))
        .collect()[0]
    )
    assert row.links == [page_url(j) for j in page_outlinks(7, 30)]
