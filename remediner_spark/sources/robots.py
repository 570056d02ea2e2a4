"""robots.txt evaluation (RFC 9309) — the crawl-politeness filter.

A crawl frontier is a (url, host) table; fetch eligibility is a JOIN
against per-host robots rules. This module implements the RFC 9309
matching semantics exactly:

* groups are selected by user-agent token (case-insensitive,
  longest-token match; ``*`` is the fallback group; consecutive
  ``User-agent`` lines share one group),
* within the chosen group the rule with the LONGEST matching pattern
  wins; on equal length ``Allow`` beats ``Disallow``,
* patterns support ``*`` (any char run) and ``$`` (end anchor),
  matched against the url path+query,
* an empty ``Disallow:`` matches nothing; no matching rule = allowed;
  no group for the agent = allowed.

Spark shape: rules are parsed driver-side or in a map stage (robots
files are per-host and tiny), then BROADCAST and applied map-side to
the frontier — the 100 TB frontier never shuffles for politeness.
Matching runs as a vectorized batch over Arrow (mapInPandas), not a
per-row Python UDF.

The driver tables carry no robots corpus, so the gate entry
synthesizes per-host rule sets and frontier URLs from doc_id residues
and the DuckDB oracle recomputes the allow/deny decision in closed
form (by construction of the synthetic rules); the RFC matching
semantics themselves are pinned by tests/test_robots.py against the
RFC 9309 examples.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """[(agent tokens, [(is_allow, pattern), ...]), ...] per group.
    Lines outside any group and unknown directives are skipped
    (Sitemap etc.); ``#`` starts a comment."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    open_group = False  # collecting User-agent lines for the NEXT rules
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not open_group and agents:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(val.lower())
            open_group = True
        elif key in ("allow", "disallow"):
            if not agents:
                continue  # rule before any User-agent line: skipped
            open_group = False
            rules.append((key == "allow", val))
        # other directives (sitemap, crawl-delay, ...) are ignored
    if agents:
        groups.append((agents, rules))
    return groups


def _select_group(groups, agent: str) -> list[tuple[bool, str]] | None:
    """RFC 9309 group selection: the group whose agent token is the
    LONGEST case-insensitive prefix-token of ``agent``; '*' fallback."""
    agent = agent.lower()
    best_len, best = -1, None
    star = None
    for agents, rules in groups:
        for tok in agents:
            if tok == "*":
                if star is None:
                    star = rules
            elif agent.startswith(tok) and len(tok) > best_len:
                best_len, best = len(tok), rules
    return best if best is not None else star


def _pattern_regex(pattern: str) -> re.Pattern:
    """robots pattern -> anchored regex: '*' = '.*', trailing '$' =
    end anchor; everything else literal."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile("^" + body + ("$" if anchored else ""))


def is_allowed(groups, agent: str, path: str) -> bool:
    """RFC 9309 decision for one path (path + optional ?query)."""
    rules = _select_group(groups, agent)
    if rules is None:
        return True
    best: tuple[int, bool] | None = None  # (pattern length, is_allow)
    for is_allow, pattern in rules:
        if not pattern:
            continue  # empty Disallow/Allow matches nothing
        if _pattern_regex(pattern).match(path):
            key = (len(pattern), is_allow)
            # longest pattern wins; Allow wins ties (True > False)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


# ------------------------------------------------------------- Spark


def robots_filter_stage(
    frontier: DataFrame, robots_by_host: dict[str, str], agent: str
) -> DataFrame:
    """frontier(host, path, ...) + {host: robots.txt text} -> frontier
    with an ``allowed`` column. The rules dict rides the closure
    (broadcast by Spark); matching is batch-vectorized per Arrow
    chunk. Hosts with no robots file are allowed (RFC: unavailable
    robots.txt = full allow)."""
    parsed = {h: parse_robots(t) for h, t in robots_by_host.items()}
    cols = frontier.columns

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["allowed"] = [
                is_allowed(parsed[h], agent, p) if h in parsed else True
                for h, p in zip(pdf["host"], pdf["path"])
            ]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in frontier.schema
    ) + ", allowed boolean"
    return frontier.mapInPandas(fn, schema)


# ------------------------------------------------------------- gate

N_HOSTS = 5


def synth_robots(host_idx: int) -> str:
    """Deterministic per-host robots.txt exercising group fallback,
    longest-match, Allow-over-Disallow ties, '*' wildcards and '$'
    anchors. Host h disallows /private-h/ except /private-h/pub/,
    blocks *.pdf$ downloads, and host 0 additionally blocks
    /search via a specific-agent group the gate's agent matches."""
    lines = [
        "# synthetic robots for host %d" % host_idx,
        "User-agent: *",
        f"Disallow: /private-{host_idx}/",
        f"Allow: /private-{host_idx}/pub/",
        "Disallow: /*.pdf$",
        "Crawl-delay: 1",  # ignored directive
    ]
    if host_idx == 0:
        lines += [
            "",
            "User-agent: kgbot",
            "Disallow: /search",
            f"Disallow: /private-{host_idx}/",
        ]
    return "\n".join(lines)


def _synth_frontier_row(doc_id: int) -> tuple[str, str]:
    host = f"host{doc_id % N_HOSTS}.example.com"
    h = doc_id % N_HOSTS
    kind = doc_id % 4
    if kind == 0:
        path = f"/private-{h}/page{doc_id}"
    elif kind == 1:
        path = f"/private-{h}/pub/page{doc_id}"
    elif kind == 2:
        path = f"/docs/file{doc_id}.pdf"
    else:
        path = f"/search?q={doc_id}"
    return host, path


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), *_synth_frontier_row(int(d)))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "host", "path"])

    frontier = docs.mapInPandas(synth, "doc_id long, host string, path string")
    robots = {
        f"host{h}.example.com": synth_robots(h) for h in range(N_HOSTS)
    }
    return robots_filter_stage(frontier, robots, agent="kgbot/1.0")


# Decision recomputed in closed form: the synthetic rule sets make the
# outcome a function of (doc_id % 4, doc_id % N_HOSTS) — private pages
# denied, their /pub/ subtree allowed (longest-match + Allow tie
# rule), *.pdf$ denied, /search denied only on host 0 (the kgbot
# group REPLACES the '*' group per RFC 9309, so host 0's pdf rule no
# longer applies to kgbot — but its /private rule is re-stated there).
SQL_ROBOTS_FILTER = f"""
SELECT doc_id,
       'host' || CAST(doc_id % {N_HOSTS} AS VARCHAR) || '.example.com'
         AS host,
       CASE doc_id % 4
         WHEN 0 THEN '/private-' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                     || '/page' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN '/private-' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                     || '/pub/page' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN '/docs/file' || CAST(doc_id AS VARCHAR) || '.pdf'
         ELSE '/search?q=' || CAST(doc_id AS VARCHAR)
       END AS path,
       CASE
         WHEN doc_id % 4 = 0 THEN FALSE
         -- /pub/ allowed via longest-match EXCEPT on host 0, where
         -- the kgbot group replaces '*' and restates only the
         -- Disallow (group replacement, not merge — RFC 9309)
         WHEN doc_id % 4 = 1 THEN NOT (doc_id % {N_HOSTS} = 0)
         -- *.pdf$ denied by the '*' group; host 0's kgbot group has
         -- no pdf rule, so kgbot may fetch pdfs there
         WHEN doc_id % 4 = 2 THEN doc_id % {N_HOSTS} = 0
         ELSE NOT (doc_id % {N_HOSTS} = 0)
       END AS allowed
FROM documents"""


QUERIES = {"robots_filter": q_robots_filter}
ORACLES = {"robots_filter": SQL_ROBOTS_FILTER}
