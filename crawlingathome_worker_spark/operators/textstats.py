"""Text analysis over document tables: language-ID, quality scoring, token
counting, document fingerprinting (driver-mandated training-data ops).

Everything except language-ID stays fully JVM-side (whole-stage codegen —
length/regexp/split/array builtins); langid reuses the shared heuristic as an
Arrow-batched pandas UDF. The SQL-expressible columns use formulas mirrored
verbatim in __spark_entry__.oracle_sql so the DuckDB check is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.langid import STOPWORDS
from ..functions.udfs import detect_lang_udf

# Pinned stopword list for the JVM-side quality column (array literal, tiny).
_EN_STOP = sorted(STOPWORDS["en"])


def token_count_col(text_col: str = "text"):
    """Whitespace token count via length arithmetic — identical formula in
    Spark and ANSI SQL: (len(trim) - len(replace(trim,' ',''))) + 1, 0 if empty."""
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.lit(0)).otherwise(
        F.length(t) - F.length(F.regexp_replace(t, " ", "")) + 1
    )


def with_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("n_tokens", token_count_col(text_col).cast("long"))


def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals: alpha ratio, stopword ratio, mean token length.

    quality = 0.5*stopword_ratio + 0.5*alpha_ratio, clipped — a lightweight
    C4/Gopher-style heuristic (length + composition), not a model."""
    t = F.col(text_col)
    alpha = (F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / F.greatest(F.length(t), F.lit(1))).alias("x")
    toks = F.split(F.trim(t), " ")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_STOP)))
    stop_ratio = stop_hits / F.greatest(F.size(toks), F.lit(1))
    mean_tok = F.length(F.regexp_replace(F.trim(t), " ", "")) / F.greatest(F.size(toks), F.lit(1))
    return (
        docs.withColumn("alpha_ratio", F.round(alpha, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("mean_token_len", F.round(mean_tok, 4))
        .withColumn(
            "quality",
            F.round(
                F.least(F.lit(1.0), F.lit(0.5) * stop_ratio * 4 + F.lit(0.5) * alpha), 4
            ),
        )
    )


def with_lang_pred(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language id (Arrow-batched UDF; shared with the oracle)."""
    return docs.withColumn("lang_pred", detect_lang_udf(F.col(text_col)))


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: md5 of lowercase space-collapsed text."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), " +", " "))
    return docs.withColumn("fingerprint", F.md5(norm))


def with_bpe_estimate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token estimate: count of word/number/punct chunks via regex —
    ~GPT-2-style pre-tokenization granularity without a vocab."""
    t = F.trim(F.col(text_col))
    chunks = F.filter(
        F.split(t, r"(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), lambda x: x != ""
    )
    # long words cost extra "subword" tokens: ceil(len/6) heuristic
    cost = F.aggregate(
        chunks,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.ceil(F.length(x) / F.lit(6.0)).cast("long"),
    )
    return docs.withColumn("bpe_tokens", cost)


def corpus_profile(
    docs: DataFrame,
    stratum_col: str,
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-stratum distribution profile: (stratum, n, mean, p<NN>…) — the
    corpus-health report a mixing/filtering pass reads before choosing
    thresholds.

    exact=True uses Spark's exact `percentile` — interpolated, bit-matching
    DuckDB's quantile_cont, but the aggregation buffers every group value, so
    it is for BOUNDED inputs (samples, small strata, CI oracles). The scale
    path is exact=False: `approx_percentile` (t-digest-style sketch, bounded
    memory, rank error ≤ 1/accuracy) — same map-side-combinable one-shuffle
    plan shape at any stratum size. Both modes in one operator mirrors the
    engine's bloom-vs-exact dedup pattern: the exact mode IS the oracle the
    approx mode is pinned against at fixture scale (tests/test_textops.py).
    """
    v = F.col(value_col)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        (F.round(F.avg(v), 4) + F.lit(0.0)).alias("mean"),
    ]
    for p in percentiles:
        name = f"p{int(round(p * 100)):02d}"
        if exact:
            expr = F.percentile(v, F.lit(p))
        else:
            expr = F.percentile_approx(v, F.lit(p), F.lit(accuracy)).cast("double")
        aggs.append((F.round(expr, 4) + F.lit(0.0)).alias(name))
    return docs.groupBy(stratum_col).agg(*aggs)
