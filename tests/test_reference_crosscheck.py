"""Pin the oracle AGAINST THE REFERENCE: a literal, line-by-line re-expression
of parse_wat (crawlingathome.py:37-79, network stage excluded) runs on the raw
fixture WAT file and must produce exactly what tests/oracle.py::oracle_parse
produces from the structured link records (VERDICT.md round-1 item 6 /
ROADMAP item 7).

tests/oracle.py is a *restructured* reimplementation (page-grouped, dataclass
candidates); this loop preserves the reference's exact control flow — single
sequential scan, mutable license variable, one seen-set, the reference's filter
ORDER (lang before blocklist, blocklist|seen|length as one OR) — so a semantic
drift in the oracle's restructuring shows up here. ftfy/pycld2 are not in this
container; both sides use the same pinned stand-ins (textfix/langid), which is
the declared substitution (SURVEY.md §7.4).

Also exercises the S4 CSV debug sink (crawlingathome.py:244-247): pipe-delimited
write + read-back (VERDICT.md item 7).
"""

from __future__ import annotations

import hashlib
import json
import os
from urllib.parse import urljoin

from crawlingathome_worker_spark.config import EngineConfig
from crawlingathome_worker_spark.functions.langid import detect_lang
from crawlingathome_worker_spark.functions.textfix import normalize_caption
from tests.oracle import load_fixture_inputs, oracle_parse

CFG = EngineConfig()


def reference_parse_wat(fopen) -> list[tuple[str, str, str, str]]:
    """Literal parse_wat semantics (crawlingathome.py:37-79), minus the bloom
    round-trip (:82-95). Same loop shape, same filter order, same seen-set; the
    only substitutions are the pinned ftfy/cld2 stand-ins."""
    valid_data: list[tuple[str, str, str, str]] = []
    wat_url: set[str] = set()
    blocklist_format = {".svg", ".gif", ".ico", "data:image", "javascript:", "mailto:"}

    for line in fopen:
        if "IMG@" not in line:  # :43
            continue
        data = json.loads(line)  # :45 (ujson ≡ json for this subset)
        links = data["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ]["Links"]  # :46
        base_url = os.path.dirname(
            data["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"]
        )  # :47
        img_license = "?"  # :48
        for link in links:  # :49
            if "url" in link and "creativecommons.org/licenses/" in link["url"]:  # :50-52
                img_license = link["url"]
            if "alt" not in link or link["alt"] is None or link["alt"] == "":  # :53-54
                continue
            url = link["url"]
            alt_text = normalize_caption(link["alt"])  # :56 ftfy stand-in
            if detect_lang(alt_text) != "en":  # :58-63 cld2 stand-in (retry folded in)
                continue
            if not url.startswith("http"):  # :66-67
                url = urljoin(base_url, url)
            hashed_imgalt = hashlib.md5((url + alt_text).encode("utf-8")).hexdigest()  # :68
            if not (
                any(bl in url.lower() for bl in blocklist_format)  # :71-73
                or url in wat_url  # :74
                or len(url) > 2048  # :74
            ):
                valid_data.append((url, alt_text, img_license, hashed_imgalt))  # :76
                wat_url.add(url)  # :77
    return valid_data


def test_oracle_matches_literal_reference(fx_dir):
    with open(os.path.join(fx_dir, "wat_lines.txt")) as f:
        ref = reference_parse_wat(f)
    links, _, _, _ = load_fixture_inputs(fx_dir)
    oracle = [
        (c.url, c.caption, c.license, c.pair_md5)
        for c in oracle_parse(links, CFG, wave_no=1)
    ]
    assert len(ref) > 200  # the fixture must actually exercise the pipeline
    assert set(ref) == set(oracle)
    # Per-URL content must agree exactly, and the per-page first-occurrence
    # winner (J1) is the same row in both scans.
    assert sorted(ref) == sorted(oracle)


def test_csv_debug_sink_roundtrip(spark, fx_dir, tmp_path):
    """S4 (crawlingathome.py:244-247): pipe-delimited CSV sink + read-back.
    The reference's header bug (B1, 6 names / 7 fields) is NOT reproduced —
    the engine writes a correct header."""
    links, _, _, _ = load_fixture_inputs(fx_dir)
    cands = oracle_parse(links, CFG, wave_no=1)[:50]
    df = spark.createDataFrame(
        [(c.url, c.caption, c.license, c.pair_md5) for c in cands],
        "url string, caption string, license string, pair_md5 string",
    )
    out = str(tmp_path / "csv_sink")
    df.write.option("sep", "|").option("header", True).option("quote", '"').csv(out)
    back = (
        spark.read.option("sep", "|")
        .option("header", True)
        .option("quote", '"')
        .csv(out)
    )
    assert back.columns == ["url", "caption", "license", "pair_md5"]
    got = {tuple(r) for r in back.collect()}
    want = {(c.url, c.caption, c.license, c.pair_md5) for c in cands}
    assert got == want
