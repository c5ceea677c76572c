"""parse_robots_txt — raw robots.txt bodies → gate-ready rules (VERDICT r4
item 8). Three layers:

1. unit pins on the pure parser for every clause of the pinned RFC 9309
   subset (functions/robots.py docstring);
2. the renderer round-trip: gen_robots_txt renders robots.parquet's rules
   wrapped in formatting noise, so parse ∘ render ≡ identity over the whole
   fixture — every noise construct (comments, CRLF, decoys, stacking,
   preamble, empty Disallow, unparseable delay) must be invisible;
3. the chain property: robots_gate fed by parse_robots_txt(raw bodies)
   produces EXACTLY the rows it produces when fed the pre-parsed table —
   including the ([], null) no-match hosts behaving like missing hosts.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crawlingathome_worker_spark.functions.robots import parse_robots_body
from crawlingathome_worker_spark.operators.politeness import parse_robots_txt


def test_basic_group():
    p, d = parse_robots_body(
        "User-agent: cah-worker\nDisallow: /a\nDisallow: /b\nCrawl-delay: 1.5\n"
    )
    assert p == ["/a", "/b"] and d == 1.5


def test_star_fallback_and_specific_wins():
    body = (
        "User-agent: *\nDisallow: /star\nCrawl-delay: 7\n\n"
        "User-agent: CAH-WORKER\nDisallow: /mine\nCrawl-delay: 2\n"
    )
    assert parse_robots_body(body) == (["/mine"], 2.0)  # case-insensitive match
    assert parse_robots_body(body, agent="unlisted-bot") == (["/star"], 7.0)


def test_no_matching_group_and_empty_body():
    assert parse_robots_body("User-agent: otherbot\nDisallow: /x\n") == ([], None)
    assert parse_robots_body("") == ([], None)
    assert parse_robots_body(None) == ([], None)


def test_stacked_headers_share_rules():
    body = "User-agent: a\nUser-agent: cah-worker\nDisallow: /shared\n"
    assert parse_robots_body(body) == (["/shared"], None)
    assert parse_robots_body(body, agent="a") == (["/shared"], None)


def test_unrecognized_and_blank_lines_do_not_break_stacking():
    # RFC 9309: unknown rules are ignored — including for group structure
    body = (
        "User-agent: a\nSitemap: https://e.com/s.xml\n\n# c\n"
        "User-agent: cah-worker\nAllow: /pub\nDisallow: /priv\n"
    )
    assert parse_robots_body(body) == (["/priv"], None)


def test_rules_after_rule_line_start_new_group():
    # a user-agent AFTER a rule line opens a NEW group (header closed)
    body = "User-agent: a\nDisallow: /a\nUser-agent: cah-worker\nDisallow: /b\n"
    assert parse_robots_body(body) == (["/b"], None)
    assert parse_robots_body(body, agent="a") == (["/a"], None)


def test_matching_groups_merge_in_document_order():
    body = (
        "User-agent: cah-worker\nDisallow: /one\nCrawl-delay: 1\n"
        "User-agent: other\nDisallow: /no\n"
        "User-agent: cah-worker\nDisallow: /two\nCrawl-delay: 3\n"
    )
    assert parse_robots_body(body) == (["/one", "/two"], 3.0)  # last delay wins


def test_comments_crlf_case_and_preamble():
    body = (
        "Disallow: /preamble\r\n"  # before any header: ignored
        "# full-line comment\r\n"
        "USER-AGENT: cah-worker\r\n"
        "DisAllow: /a   # inline comment\r\n"
        "noclolonline\r\n"
        "Crawl-Delay: 0.5\r\n"
    )
    assert parse_robots_body(body) == (["/a"], 0.5)


def test_empty_disallow_and_bad_delay_ignored():
    body = (
        "User-agent: cah-worker\nDisallow:\nDisallow: /real\n"
        "Crawl-delay: soon\nCrawl-delay: -1\nCrawl-delay: 1e3\nCrawl-delay: nan\n"
    )
    # empty Disallow = allow-all; only nonnegative decimal literals parse
    assert parse_robots_body(body) == (["/real"], None)


def test_render_parse_roundtrip(fx_dir):
    """parse ∘ gen_robots_txt ≡ robots.parquet for every covered host; the
    five extra no-match hosts parse to ([], None)."""
    rules = {
        r["host"]: r
        for r in pq.read_table(os.path.join(fx_dir, "robots.parquet")).to_pylist()
    }
    raw = pq.read_table(os.path.join(fx_dir, "robots_txt.parquet")).to_pylist()
    assert len(raw) == len(rules) + 5
    for row in raw:
        p, d = parse_robots_body(row["body"], agent="cah-worker")
        if row["host"] in rules:
            exp = rules[row["host"]]
            assert p == exp["disallow_prefixes"], row["host"]
            assert d == exp["crawl_delay"], row["host"]
        else:
            assert (p, d) == ([], None), row["host"]


def test_spark_operator_matches_pure_parser(spark, fx_dir):
    raw = spark.read.parquet(os.path.join(fx_dir, "robots_txt.parquet"))
    got = {
        r["host"]: (r["disallow_prefixes"], r["crawl_delay"])
        for r in parse_robots_txt(raw, agent="cah-worker").collect()
    }
    for row in pq.read_table(os.path.join(fx_dir, "robots_txt.parquet")).to_pylist():
        assert got[row["host"]] == parse_robots_body(row["body"], "cah-worker")


def test_gate_chain_equivalence(spark, fx_dir):
    """robots_gate(cands, parse_robots_txt(raw)) ≡ robots_gate(cands, parsed
    table): the parsed dim is a drop-in for the pre-parsed one, and a
    no-match body gates exactly like a missing host (default-allow)."""
    from crawlingathome_worker_spark.config import EngineConfig
    from crawlingathome_worker_spark.operators.parse import parse_links
    from crawlingathome_worker_spark.operators.politeness import robots_gate

    cfg = EngineConfig(default_host_budget=20, wave_seconds=30.0)
    links = spark.read.parquet(os.path.join(fx_dir, "wat_links.parquet"))
    cands = parse_links(links, cfg)
    pre = spark.read.parquet(os.path.join(fx_dir, "robots.parquet"))
    raw = spark.read.parquet(os.path.join(fx_dir, "robots_txt.parquet"))
    cols = ["url", "host", "host_budget"]
    a = robots_gate(cands, pre, cfg).select(*cols)
    b = robots_gate(cands, parse_robots_txt(raw), cfg).select(*cols)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert a.count() == b.count() > 0


def test_operator_keeps_other_columns_and_drops_body(spark):
    raw = spark.createDataFrame(
        [("h1", "x", "User-agent: *\nDisallow: /a\n")], "host string, extra string, body string"
    )
    out = parse_robots_txt(raw)
    assert out.columns == ["host", "extra", "disallow_prefixes", "crawl_delay"]
    row = out.collect()[0]
    assert row["extra"] == "x" and row["disallow_prefixes"] == ["/a"]
    assert row["crawl_delay"] is None
