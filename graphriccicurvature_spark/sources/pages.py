"""Synthetic Common-Crawl-style ``pages`` table (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Fully deterministic — word choice is modular arithmetic on (i, k), no RNG —
so the same (url -> text) mapping is reproducible anywhere, which is what
the byte-identical extraction invariant is tested against. Generation is a
vectorized pandas UDF over ``spark.range`` (scales out; no driver-side list
building).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value graph "
    "edge node curve flow mass link page crawl rank web text corpus shard"
).split()

_LANGS = ["en", "fr", "es", "zh", "de"]

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def page_url(i: int, n_sites: int = 10) -> str:
    return f"https://site{i % n_sites}.example/p/{i}"


def page_text(i: int) -> str:
    n_words = 8 + (i * 7) % 25
    return " ".join(_WORDS[(i * 2654435761 + k * 97) % len(_WORDS)] for k in range(n_words))


def page_outlinks(i: int, n: int) -> list[int]:
    """Deterministic outlink rule shared with FIXTURES.md F2."""
    out = []
    for j in range(i % 5):
        d = (i * 31 + j * 17 + 7) % n
        if d != i:
            out.append(d)
    return out


def anchor_word(i: int, d: int) -> str:
    """Deterministic anchor text of the link from page i to page d —
    a pure function of (source, destination) so the DuckDB anchor oracle
    replays it without tracking link positions."""
    return _WORDS[(i * 13 + d * 29 + 3) % len(_WORDS)]


def generate_pages(spark: SparkSession, n: int, n_sites: int = 10) -> DataFrame:
    """Deterministic pages table with ``n`` rows."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in ids:
                i = int(i)
                text = page_text(i)
                anchors = "".join(
                    f'<a href="{page_url(d, n_sites)}">{anchor_word(i, d)}</a>'
                    for d in page_outlinks(i, n)
                )
                html = f"<html><body><p>{text}</p>{anchors}</body></html>".encode("utf-8")
                rows["url"].append(page_url(i, n_sites))
                rows["warc_ts"].append(
                    pd.Timestamp("2026-01-01T00:00:00Z").tz_localize(None)
                    + pd.Timedelta(seconds=i)
                )
                rows["html"].append(html)
                rows["text"].append(text)
                rows["lang"].append(_LANGS[i % 5])
            yield pd.DataFrame(rows)

    return spark.range(0, n).mapInPandas(gen, PAGES_SCHEMA)
