"""Raw WAT-line source path: IMG@ prefilter + from_json + posexplode must yield
the same candidates as the structured wat_links table for IMG@-bearing pages."""

from pyspark.sql import functions as F

from crawlingathome_worker_spark.config import EngineConfig
from crawlingathome_worker_spark.operators.parse import parse_links
from crawlingathome_worker_spark.sources.wat import read_wat_lines

CFG = EngineConfig()


def test_wat_lines_match_structured(spark, fx_dir):
    raw = read_wat_lines(spark, f"{fx_dir}/wat_lines.txt")
    got = parse_links(raw, CFG)

    links = spark.read.parquet(f"{fx_dir}/wat_links.parquet")
    # pages with at least one IMG@-marked link (image_id not null) survive F1
    img_pages = links.filter(F.col("image_id").isNotNull()).select("page_id").distinct()
    structured = links.join(img_pages, "page_id")
    want = parse_links(structured, CFG)

    g = {(r["url"], r["caption"], r["license"], r["pair_md5"]) for r in got.collect()}
    w = {(r["url"], r["caption"], r["license"], r["pair_md5"]) for r in want.collect()}
    assert len(g) > 500
    assert g == w


def test_img_prefilter_drops_pages(spark, fx_dir):
    n_lines = spark.read.text(f"{fx_dir}/wat_lines.txt").count()
    n_img = (
        spark.read.text(f"{fx_dir}/wat_lines.txt")
        .filter(F.col("value").contains("IMG@"))
        .count()
    )
    assert 0 < n_img < n_lines  # the prefilter has real work (F1)


def test_pushdown_visible_in_plan(spark, fx_dir):
    """The IMG@ contains-filter must sit AT the text scan, not above the JSON parse."""
    raw = read_wat_lines(spark, f"{fx_dir}/wat_lines.txt")
    plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "Contains" in plan or "contains" in plan
    # from_json appears only after (above) the filter in the plan tree: the
    # filter's child is the file scan.
    simple = raw._jdf.queryExecution().optimizedPlan().toString()
    filt = simple.find("Contains")
    fj = simple.find("from_json")
    assert filt != -1 and fj != -1 and fj < filt  # tree prints top-down: json above filter


def test_gzipped_wat_reads_identically(spark, fx_dir, tmp_path):
    """Common Crawl ships WAT as .gz — the text source must produce the same
    link records from a gzipped shard (Spark's codec inference, no extra code;
    this test pins that the path stays exercised)."""
    import gzip
    import shutil

    from crawlingathome_worker_spark.sources.wat import read_wat_lines

    gz = str(tmp_path / "shard.wat.gz")
    with open(f"{fx_dir}/wat_lines.txt", "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    plain = read_wat_lines(spark, f"{fx_dir}/wat_lines.txt")
    gzed = read_wat_lines(spark, gz)
    cols = ["page_url", "pos", "link_url", "alt"]  # page_id is per-scan monotonic
    a = sorted(tuple(r) for r in plain.select(*cols).collect())
    b = sorted(tuple(r) for r in gzed.select(*cols).collect())
    assert a == b and len(a) > 1000


def test_oracle_mirrors_from_json_on_structurally_off_lines(spark, tmp_path):
    """Differential: the g42 oracle must DROP and KEEP exactly what the
    engine's from_json pipeline drops and keeps on structurally-off-but-valid
    JSON (ADVICE r3 + round-4 probe: non-array Links and scalar/array
    elements null the whole array; null elements keep positions; non-string
    values in string fields coerce to compact JSON text)."""
    import json

    from tests.golden_queries import g42_wat_scan

    E = lambda uri, links: {
        "Envelope": {
            "WARC-Header-Metadata": {"WARC-Target-URI": uri},
            "Payload-Metadata": {"HTTP-Response-Metadata": {"HTML-Metadata": {"Links": links}}},
        }
    }
    lines = [
        "not json at all IMG@",
        json.dumps({"Envelope": "IMG@ string envelope"}),
        json.dumps(E("http://a/IMG@", "IMG@ string links")),
        json.dumps(E("http://a/IMG@", {"IMG@k": "v"})),
        json.dumps(E("http://a/IMG@", [123, {"url": "http://x/IMG@.jpg", "alt": "a"}])),
        json.dumps(E("http://a/IMG@", [["IMG@nested"], {"url": "http://x/IMG@.jpg"}])),
        json.dumps(E("http://b/IMG@", [None, {"url": "http://y/IMG@.jpg", "alt": "ok"}])),
        json.dumps(E("http://c/IMG@", [{"url": None, "alt": "IMG@"}, {"url": "http://z/IMG@.png"}])),
        json.dumps(E("http://d/IMG@", [{"url": 123, "alt": True}])),
        json.dumps(E("http://e/IMG@", [{"url": {"a": 1}, "alt": ["x", 2]}])),
        json.dumps(E(99, [{"url": "http://f/IMG@.gif", "alt": 1.5}])),
        json.dumps(E("http://g/IMG@", [])),
        json.dumps(E("http://h/IMG@", [{"alt": "no url IMG@"}])),
        json.dumps(E("http://i/IMG@", [{"url": "http://ok/IMG@.jpg", "alt": "fine", "extra": {"deep": [1]}}])),
        json.dumps(E("http://no-marker/", [{"url": "http://q/x.jpg"}])).replace("IMG@", "IMGAT"),
    ]
    fx = tmp_path / "fx"
    fx.mkdir()
    (fx / "wat_lines.txt").write_text("\n".join(lines) + "\n", encoding="utf-8")

    from crawlingathome_worker_spark.sources.wat import read_wat_lines

    engine = sorted(
        (r["page_url"], r["pos"], r["link_url"], r["alt"])
        for r in read_wat_lines(spark, str(fx / "wat_lines.txt")).collect()
    )
    oracle_tbl = g42_wat_scan("", str(fx)).to_pylist()
    oracle = sorted((r["page_url"], r["pos"], r["link_url"], r["alt"]) for r in oracle_tbl)
    assert engine == oracle and len(engine) > 0, (engine, oracle)
