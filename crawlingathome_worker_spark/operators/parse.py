"""Parse stage: WAT link records → deduplicated candidate pairs.

Re-expresses /root/reference/crawlingathome.py:37-96 (parse_wat) as one declarative
DataFrame plan. Operator map (SURVEY.md §2.2-2.4):

  F4 license attach   → last(ignorenulls) window over (page, pos)  [B4 semantics]
  F5 alt filter       → isNotNull & != ""
  T2 caption norm     → pandas UDF (ftfy stand-in)
  F8 en-only          → pandas UDF langid
  T3 absolutize       → pandas UDF urljoin
  T4 pair hash        → builtin md5(concat) — bit-identical to the reference
  F6 blocklist        → lower(url) contains any-of (substring semantics, not suffix)
  F7 length           → length(url) <= 2048
  J1 first-occurrence → row_number over (url) ordered by document position
  T6 canonicalize     → pandas UDF (north_rule)

Filter order is kept cheap-before-expensive exactly as the reference hand-ordered
it (SURVEY.md §4); Catalyst will not reorder across the non-deterministic-looking
pandas UDFs, which is what we want.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.udfs import (
    absolutize_udf,
    canonicalize_udf,
    detect_lang_udf,
    host_udf,
    normalize_caption_udf,
)

CANDIDATE_COLS = [
    "url",
    "canonical_url",
    "host",
    "caption",
    "license",
    "pair_md5",
    "image_id",
    "page_id",
    "pos",
]


def parse_links(links: DataFrame, cfg: EngineConfig) -> DataFrame:
    """links: (page_id, page_url, pos, link_url, alt, image_id?) → candidates.

    Document order is (page_id, pos) — the materialized equivalent of the
    reference's sequential line/link scan (SURVEY.md §2.4 J1).
    """
    if "image_id" not in links.columns:
        links = links.withColumn("image_id", F.lit(None).cast("string"))

    # F4: a CC-license link applies to itself and all *later* links on the page;
    # links before the first CC link get "?" (crawlingathome.py:48-52, bug/space B4).
    w_page = (
        Window.partitionBy("page_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cc = F.when(
        F.col("link_url").contains("creativecommons.org/licenses/"), F.col("link_url")
    )
    df = links.withColumn(
        "license", F.coalesce(F.last(cc, ignorenulls=True).over(w_page), F.lit("?"))
    )

    # F5 (crawlingathome.py:53-54)
    df = df.filter(F.col("alt").isNotNull() & (F.col("alt") != ""))
    # T2 (crawlingathome.py:56)
    df = df.withColumn("caption", normalize_caption_udf(F.col("alt")))
    # F8 (crawlingathome.py:58-63)
    df = df.filter(detect_lang_udf(F.col("caption")) == "en")
    # T3 (crawlingathome.py:66-67)
    df = df.withColumn("url", absolutize_udf(F.col("page_url"), F.col("link_url")))
    # T4 (crawlingathome.py:68) — JVM-side md5 over UTF-8 bytes, bit-identical
    df = df.withColumn("pair_md5", F.md5(F.concat(F.col("url"), F.col("caption"))))
    # F6 substring blocklist (crawlingathome.py:40, 71-73) + F7 length (74)
    low = F.lower(F.col("url"))
    blocked = reduce(or_, [low.contains(b) for b in cfg.blocklist])
    df = df.filter(~blocked).filter(F.length(F.col("url")) <= cfg.max_url_len)

    # J1: global first-occurrence-wins on the raw absolutized url, in document
    # order (crawlingathome.py:39, 74, 77).
    w_url = Window.partitionBy("url").orderBy("page_id", "pos")
    df = (
        df.withColumn("_rn", F.row_number().over(w_url))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # T6 north_rule canonical form + politeness partitioning key
    df = df.withColumn("canonical_url", canonicalize_udf(F.col("url")))
    df = df.withColumn("host", host_udf(F.col("url")))
    return df.select(*CANDIDATE_COLS)
