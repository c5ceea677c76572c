"""Parse-stage equivalence: Spark parse_links vs the oracle, full fixture set,
plus targeted edge-case units (B4 license positioning, J1 first-occurrence)."""

import pytest
from pyspark.sql import Row

from crawlingathome_worker_spark.config import EngineConfig
from crawlingathome_worker_spark.operators.parse import parse_links

from .oracle import load_fixture_inputs, oracle_parse

CFG = EngineConfig()


@pytest.fixture(scope="module")
def parsed_both(spark, fx_dir):
    links_df = spark.read.parquet(f"{fx_dir}/wat_links.parquet")
    got = parse_links(links_df, CFG).collect()
    links, _, _, _ = load_fixture_inputs(fx_dir)
    want = oracle_parse(links, CFG, wave_no=1)
    return got, want


def test_parse_matches_oracle_exactly(parsed_both):
    got, want = parsed_both
    assert len(got) == len(want) > 1000
    gkey = {
        r["url"]: (r["caption"], r["license"], r["pair_md5"], r["canonical_url"], r["host"])
        for r in got
    }
    wkey = {
        c.url: (c.caption, c.license, c.pair_md5, c.canonical_url, c.host) for c in want
    }
    assert gkey == wkey  # byte-equal captions, licenses, hashes (input_hint)


def test_parse_first_occurrence_positions(parsed_both):
    """J1 keeps the FIRST document-order occurrence (crawlingathome.py:74-77)."""
    got, want = parsed_both
    gpos = {r["url"]: (r["page_id"], r["pos"]) for r in got}
    wpos = {c.url: (c.page_id, c.pos) for c in want}
    assert gpos == wpos


def _mk_links(spark, rows):
    return spark.createDataFrame(
        [Row(**r) for r in rows],
        "page_id bigint, page_url string, pos int, link_url string, alt string, image_id string",
    )


def test_license_positional_semantics_b4(spark):
    """A CC link applies to itself and LATER links only (crawlingathome.py:48-52)."""
    page = "http://h.com/a/p.html"
    rows = [
        dict(page_id=1, page_url=page, pos=0, link_url="http://h.com/img/a.jpg", alt="the dog photo", image_id="a"),
        dict(page_id=1, page_url=page, pos=1, link_url="http://creativecommons.org/licenses/by/2.0/", alt="cc badge here", image_id=None),
        dict(page_id=1, page_url=page, pos=2, link_url="http://h.com/img/b.jpg", alt="the cat photo", image_id="b"),
    ]
    out = {r["url"]: r["license"] for r in parse_links(_mk_links(spark, rows), CFG).collect()}
    assert out["http://h.com/img/a.jpg"] == "?"  # before the CC link
    assert out["http://creativecommons.org/licenses/by/2.0/"].endswith("by/2.0/")  # itself
    assert out["http://h.com/img/b.jpg"] == "http://creativecommons.org/licenses/by/2.0/"


def test_blocklist_is_substring_not_suffix(spark):
    """F6 uses substring containment (crawlingathome.py:71-73): '.gif' anywhere."""
    page = "http://h.com/p.html"
    rows = [
        dict(page_id=1, page_url=page, pos=0, link_url="http://h.com/x.gif?big", alt="the gif photo", image_id="a"),
        dict(page_id=1, page_url=page, pos=1, link_url="http://h.com/gifts/x.jpg", alt="the gift photo", image_id="b"),
        dict(page_id=1, page_url=page, pos=2, link_url="http://h.com/x.jpg", alt="the dog photo", image_id="c"),
    ]
    urls = {r["url"] for r in parse_links(_mk_links(spark, rows), CFG).collect()}
    assert "http://h.com/x.gif?big" not in urls  # .gif substring
    assert "http://h.com/gifts/x.jpg" in urls  # 'gifts' does not contain '.gif'
    assert "http://h.com/x.jpg" in urls


def test_url_length_and_empty_alt(spark):
    page = "http://h.com/p.html"
    rows = [
        dict(page_id=1, page_url=page, pos=0, link_url="http://h.com/" + "x" * 2100, alt="the long photo", image_id="a"),
        dict(page_id=1, page_url=page, pos=1, link_url="http://h.com/y.jpg", alt="", image_id="b"),
        dict(page_id=1, page_url=page, pos=2, link_url="http://h.com/z.jpg", alt=None, image_id="c"),
    ]
    assert parse_links(_mk_links(spark, rows), CFG).count() == 0
