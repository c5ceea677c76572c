"""Pin every golden-parquet-oracled driver query: Spark result at sf0.01 must
equal golden/queries/qNN.parquet value-for-value (the same comparison the
driver's DuckDB gate performs — VERDICT.md round-1 item 1).

The goldens come from tests/golden_queries.py — independent non-Spark
implementations (brute-force pair finding, plain-int hashing). For the banding
operators (q21 simhash, q31 phash) the golden is a brute-force all-pairs scan,
so these tests also prove the pigeonhole banding has FULL candidate recall.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
GOLDEN_DIR = os.path.join(entry.REPO, "golden", "queries")

GOLDEN_QUERIES = [
    "q19_lang_pred",
    "q20_minhash_lsh_pairs",
    "q21_simhash_pairs",
    "q22_ngram_jaccard",
    "q24_ann_lsh",
    "q26_embedding_neardup",
    "q27_image_decode",
    "q28_phash_groups",
    "q29_clip_scores",
    "q30_wave_flagship",
    "q31_phash_near_pairs",
    "q32_bpe_tokens",
    "q33_image_resize",
    "q34_video_frames",
    "q35_ann_ivf",
    "q42_wat_scan",
    "q45_robots_rules",
    "q47_neardup_components",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata {SF_DIR} not present"
)


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: str(v) if v is not None else None)
    return pdf.sort_values(by=list(pdf.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_query_matches_golden(spark, name):
    golden = pq.read_table(
        os.path.join(GOLDEN_DIR, f"{name.split('_')[0]}.parquet")
    ).to_pandas()
    got = entry.queries()[name](spark, SF_DIR).toPandas()
    assert len(got) == len(golden), f"{name}: {len(got)} vs {len(golden)} rows"
    assert sorted(got.columns) == sorted(golden.columns)
    a, b = _canon(got), _canon(golden)
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            assert np.allclose(
                a[c].astype(float), b[c].astype(float),
                rtol=1e-9, atol=1e-12, equal_nan=True,
            ), f"{name}.{c} float mismatch"
        else:
            assert a[c].astype(str).equals(b[c].astype(str)), f"{name}.{c} mismatch"
