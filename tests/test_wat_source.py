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
