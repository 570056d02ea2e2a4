"""CDX-J crawl-index ingestion (sources/cdx.py)."""

from __future__ import annotations

from remediner_spark.sources.kg_fixture import _surt, ensure_kg_fixture


def test_surt_rendering():
    assert _surt("https://example.org/doc/00000007") == \
        "org,example)/doc/00000007"
    assert _surt("http://a.b.example.com/x/y") == "com,example,b,a)/x/y"
    assert _surt("https://example.org") == "org,example)"


class TestCdxIngest:
    def test_selection_and_surt_verification(self, spark):
        from remediner_spark.sources.cdx import parse_cdx, q_cdx_ingest

        d = ensure_kg_fixture()
        raw = spark.read.text(f"{d}/crawl.cdx")
        n_lines = raw.count()
        assert n_lines == 400
        rows = q_cdx_ingest(spark, "").collect()
        # every 17th is a 404, every 23rd non-html; i=0 hits both
        dropped = {i for i in range(400) if i % 17 == 0 or i % 23 == 0}
        assert len(rows) == 400 - len(dropped)
        # published urlkey always equals the recomputed SURT
        assert all(r["surt_ok"] == 1 for r in rows)
        # offsets accumulate: strictly increasing in url order, start 0
        parsed = {r["url"]: r for r in rows}
        offs = [parsed[u]["offset"]
                for u in sorted(parsed)[:50]]
        assert offs == sorted(offs)
        # locator points at real byte lengths (html of that page)
        rec = parse_cdx(raw).collect()[0]
        assert rec["length"] > 0 and rec["offset"] == 0
