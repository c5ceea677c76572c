"""Property-based tests (Hypothesis) over the shared semantics modules —
SURVEY.md §5.5. Pure-Python, no Spark session needed."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlingathome_worker_spark.functions.langid import detect_lang
from crawlingathome_worker_spark.functions.textfix import normalize_caption, remove_bad_chars
from crawlingathome_worker_spark.functions.urls import absolutize, canonicalize, host_of

url_path = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEF0123456789-_./", min_size=0, max_size=40
)
hosts = st.from_regex(r"[a-zA-Z][a-zA-Z0-9-]{0,20}(\.[a-zA-Z]{2,6}){1,2}", fullmatch=True)
queries = st.text(alphabet="abcdefgh=&123", min_size=0, max_size=20)


@st.composite
def urls(draw):
    h = draw(hosts)
    p = draw(url_path)
    q = draw(queries)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    port = draw(st.sampled_from(["", ":80", ":8080"]))
    return f"http://{h}{port}/{p}" + (f"?{q}" if q else "") + frag


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize(u)
    assert canonicalize(c) == c  # fixpoint
    assert "#" not in c  # fragment always stripped
    assert host_of(c) == host_of(u)  # host preserved (case-insensitively)


@given(urls(), url_path)
@settings(max_examples=200, deadline=None)
def test_absolutize_always_absolute(base, rel):
    out = absolutize(base + "/page.html", rel)
    # reference semantics: already-http links pass through; others join the base
    if rel.startswith("http"):
        assert out == rel
    else:
        assert out.startswith("http")


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_normalize_caption_stable(s):
    n = normalize_caption(s)
    assert "\n" not in n
    assert n == n.strip()
    assert normalize_caption(n) == n  # idempotent on its own output


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_remove_bad_chars_printable(s):
    out = remove_bad_chars(s)
    assert out.isprintable() or out == ""
    assert remove_bad_chars(out) == out


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_detect_lang_total_and_deterministic(s):
    lang = detect_lang(s)
    assert lang in {"en", "de", "fr", "es", "un"}
    assert detect_lang(s) == lang


@given(st.text(max_size=60), st.text(max_size=60))
@settings(max_examples=100, deadline=None)
def test_pair_md5_matches_spark_semantics(url, cap):
    """hashlib md5(utf-8) is the contract F.md5(concat(...)) must meet (T4)."""
    h = hashlib.md5((url + cap).encode("utf-8")).hexdigest()
    assert len(h) == 32 and h == h.lower()
