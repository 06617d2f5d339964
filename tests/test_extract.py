"""Byte-identity invariant for the extractor (north rule; SURVEY.md §7.4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import fixtures
from kgspark.extract import extract_text_bytes, with_extracted_text


def test_extract_pure_function_basics():
    html = (
        b"<html><head><style>p{color:red}</style><script>x=1</script></head>"
        b"<body><nav>Nav</nav><h1>Title</h1><p>Hello &amp; welcome.</p>"
        b"<!-- comment --><footer>&copy; 1900</footer></body></html>"
    )
    text = extract_text_bytes(html)
    assert "x=1" not in text and "color" not in text and "comment" not in text
    assert "Hello & welcome." in text
    assert "© 1900" in text
    # block tags become newlines, runs of spaces collapse
    assert "Nav\nTitle\nHello" in text.replace("  ", " ")


def test_extract_none_and_empty():
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"") == ""


def test_extract_byte_identical_per_url(spark):
    """UDF output must equal the golden `text` column byte-for-byte."""
    pages = fixtures.gen_pages(spark, 120)
    redone = with_extracted_text(pages, out_col="text2")
    mismatches = redone.where(~F.col("text").eqNullSafe(F.col("text2"))).count()
    assert mismatches == 0


def test_extract_deterministic_across_runs(spark):
    a = fixtures.gen_pages(spark, 40).select("url", "text")
    b = fixtures.gen_pages(spark, 40).select("url", "text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
