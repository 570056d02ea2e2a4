"""robots.txt matching semantics (RFC 9309) + the Spark filter stage."""

from __future__ import annotations

from remediner_spark.sources.robots import (
    is_allowed,
    parse_robots,
    synth_robots,
)


def _g(text):
    return parse_robots(text)


def test_prefix_longest_match_and_allow_tie():
    g = _g(
        "User-agent: *\n"
        "Disallow: /example/\n"
        "Allow: /example/page/\n"
    )
    assert not is_allowed(g, "bot", "/example/other")
    assert is_allowed(g, "bot", "/example/page/1")  # longer Allow wins
    assert is_allowed(g, "bot", "/different")  # no rule = allowed

    # equal-length patterns: Allow wins the tie (RFC 9309 §2.2.2)
    g = _g("User-agent: *\nDisallow: /page\nAllow: /page\n")
    assert is_allowed(g, "bot", "/page")

    # prefix semantics: /p matches /page
    g = _g("User-agent: *\nDisallow: /p\n")
    assert not is_allowed(g, "bot", "/page")
    assert is_allowed(g, "bot", "/other")


def test_wildcards_and_end_anchor():
    g = _g("User-agent: *\nDisallow: /*.pdf$\n")
    assert not is_allowed(g, "bot", "/a/b/file.pdf")
    assert is_allowed(g, "bot", "/a/file.pdf?download=1")  # not at end

    g = _g("User-agent: *\nAllow: /$\nDisallow: /\n")
    assert is_allowed(g, "bot", "/")  # only the exact root
    assert not is_allowed(g, "bot", "/anything")

    g = _g("User-agent: *\nDisallow: /a/*/c\n")
    assert not is_allowed(g, "bot", "/a/b/c")
    assert not is_allowed(g, "bot", "/a/x/y/c")
    assert is_allowed(g, "bot", "/a/b")


def test_group_selection_and_replacement():
    text = (
        "User-agent: *\n"
        "Disallow: /all/\n"
        "\n"
        "User-agent: kgbot\n"
        "Disallow: /kg/\n"
    )
    g = _g(text)
    # specific group REPLACES '*' (not merged)
    assert is_allowed(g, "kgbot/1.0", "/all/x")
    assert not is_allowed(g, "kgbot/1.0", "/kg/x")
    assert not is_allowed(g, "otherbot", "/all/x")
    assert is_allowed(g, "otherbot", "/kg/x")
    # longest agent token wins
    text2 = (
        "User-agent: kg\nDisallow: /short/\n\n"
        "User-agent: kgbot\nDisallow: /long/\n"
    )
    g2 = _g(text2)
    assert not is_allowed(g2, "kgbot-news", "/long/a")
    assert is_allowed(g2, "kgbot-news", "/short/a")

    # consecutive User-agent lines share one group
    g3 = _g("User-agent: a\nUser-agent: b\nDisallow: /x/\n")
    assert not is_allowed(g3, "a", "/x/1")
    assert not is_allowed(g3, "b", "/x/1")

    # no group at all -> everything allowed
    assert is_allowed(_g("Sitemap: https://e/s.xml\n"), "bot", "/x")


def test_empty_disallow_and_comments():
    g = _g(
        "# politeness file\n"
        "User-agent: *\n"
        "Disallow:\n"  # empty = matches nothing
        "Disallow: /x/ # trailing comment\n"
    )
    assert is_allowed(g, "bot", "/anything")
    assert not is_allowed(g, "bot", "/x/1")


def test_synth_rules_match_closed_form():
    """The gate's synthetic rules produce exactly the oracle's
    closed-form decision table for agent kgbot."""
    for h in range(5):
        g = _g(synth_robots(h))
        assert not is_allowed(g, "kgbot/1.0", f"/private-{h}/page9")
        pub = is_allowed(g, "kgbot/1.0", f"/private-{h}/pub/page9")
        assert pub == (h != 0)  # host 0: kgbot group replaces '*'
        pdf = is_allowed(g, "kgbot/1.0", "/docs/file9.pdf")
        assert pdf == (h == 0)  # kgbot group has no pdf rule
        search = is_allowed(g, "kgbot/1.0", "/search?q=9")
        assert search == (h != 0)


def test_robots_filter_stage_spark(spark):
    from remediner_spark.sources.robots import q_robots_filter

    out = q_robots_filter(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 500
    # kind 0 (private) always denied; kind 3 (search) denied on host 0
    k0 = out[out.doc_id % 4 == 0]
    assert not k0["allowed"].any()
    k3 = out[out.doc_id % 4 == 3]
    assert (k3["allowed"] == (k3.doc_id % 5 != 0)).all()
