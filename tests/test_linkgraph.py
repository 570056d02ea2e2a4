"""Link-graph extraction (operators/linkgraph.py) + corpus outlinks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from remediner_spark.kernels.webtext import extract_text
from remediner_spark.sources.corpus import add_outlinks, generate_pages


class TestOutlinkInjection:
    def test_extraction_byte_identity_preserved(self):
        """The north-rule invariant: anchors carry empty display text,
        so tag-stripping extraction still inverts html to `text`
        byte-for-byte on EVERY page."""
        pages, _ = generate_pages(120)
        linked = add_outlinks(pages)
        extracted = extract_text(pd.Series(list(linked["html"])))
        assert list(extracted) == list(linked["text"])

    def test_deterministic_and_counts(self):
        pages, _ = generate_pages(60)
        a, b = add_outlinks(pages), add_outlinks(pages)
        assert list(a["html"]) == list(b["html"])
        # page i carries 1 + i%4 internal + (i%3==0) external anchors
        for i in (0, 1, 5, 9):
            n_hrefs = a["html"][i].count(b'href="')
            assert n_hrefs == 1 + i % 4 + (1 if i % 3 == 0 else 0)


class TestLinkGraph:
    @pytest.fixture(scope="class")
    def pages_df(self, spark):
        pages, _ = generate_pages(60)
        return spark.createDataFrame(add_outlinks(pages))

    def test_edges_match_injection_rule(self, spark, pages_df):
        from remediner_spark.operators.linkgraph import link_graph

        got = {
            (r["src_url"], r["dst_url"]): r["n_links"]
            for r in link_graph(pages_df).collect()
        }
        n = 60
        expect: dict[tuple[str, str], int] = {}
        for i in range(n):
            src = f"https://example.org/doc/{i:08d}"
            for j in range(1 + i % 4):
                t = (i * 31 + j * 17 + 1) % n
                key = (src, f"https://example.org/doc/{t:08d}")
                expect[key] = expect.get(key, 0) + 1
            if i % 3 == 0:
                key = (src,
                       f"https://cdn{(i // 3) % 7}.example-assets.net"
                       f"/l/{i % 11}")
                expect[key] = expect.get(key, 0) + 1
        assert got == expect

    def test_pagerank_mass_and_determinism(self, spark, pages_df):
        """Fixed-point PageRank over the internal doc graph: every
        page ranks (all have outlinks), ranks are positive, and a
        repeat run is bit-identical (integer arithmetic)."""
        from pyspark.sql import functions as F

        from remediner_spark.operators.components import (
            pagerank_fixed_point,
        )
        from remediner_spark.operators.linkgraph import extract_outlinks

        edges = extract_outlinks(pages_df).where(
            F.col("dst_url").startswith("https://example.org/doc/")
        ).select(
            F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
        )
        r1 = {r["node"]: r["rank_fp"]
              for r in pagerank_fixed_point(edges).collect()}
        r2 = {r["node"]: r["rank_fp"]
              for r in pagerank_fixed_point(edges).collect()}
        assert r1 == r2
        assert len(r1) == 60
        assert all(v > 0 for v in r1.values())
        # the most-linked-to pages outrank the median page
        assert max(r1.values()) > int(np.median(list(r1.values())))
