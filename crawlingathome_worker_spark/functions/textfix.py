"""Deterministic caption normalization (ftfy stand-in) + printable filter.

The reference normalizes captions with ``ftfy.fix_text(alt.replace("\\n", " ")).strip()``
(crawlingathome.py:56) and falls back to printable-only text when language detection
chokes (crawlingathome.py:33-34, 61). ftfy is not installed in this container
(SURVEY.md §7.4), so ``fix_text`` here is a pinned, deterministic subset: repair of
the classic UTF-8-bytes-decoded-as-cp1252 mojibake plus NFC normalization. The
caption byte-equality invariant (BASELINE.json input_hint) is defined against THIS
function — the oracle (tests/oracle.py) and the Spark pandas UDF import the same
symbol, so equality is exact by construction.
"""

from __future__ import annotations

import unicodedata


def _moji(target: str) -> str:
    """The cp1252-misdecoded rendering of `target`: what you see when UTF-8 bytes
    are read as cp1252 (latin-1 for the undefined slots)."""
    return target.encode("utf-8").decode("cp1252", errors="replace")


# Built programmatically so the table itself is immune to source-encoding mishaps.
# Longer/rarer sequences first so greedy replacement is stable.
_TARGETS = (
    "’",  # right single quote
    "‘",  # left single quote
    "“",  # left double quote
    "”",  # right double quote
    "–",  # en dash
    "—",  # em dash
    "…",  # ellipsis
    "é",  # e acute
    "è",  # e grave
    "á",  # a acute
    "ó",  # o acute
    "ú",  # u acute
    "ñ",  # n tilde
    "ü",  # u umlaut
    "ö",  # o umlaut
    "ä",  # a umlaut
    "ß",  # sharp s
    " ",  # nbsp (mojibake form -> plain space below)
)

_MOJIBAKE: tuple[tuple[str, str], ...] = tuple(
    (_moji(t), t if t != " " else " ") for t in _TARGETS
)


def fix_text(text: str) -> str:
    """Deterministic mojibake repair + NFC normalization (ftfy.fix_text stand-in)."""
    for bad, good in _MOJIBAKE:
        if bad in text:
            text = text.replace(bad, good)
    return unicodedata.normalize("NFC", text)


def remove_bad_chars(text: str) -> str:
    """Keep only printable characters — exact reference semantics
    (crawlingathome.py:33-34: ``"".join(c for c in text if c.isprintable())``)."""
    return "".join(c for c in text if c.isprintable())


def normalize_caption(alt: str) -> str:
    """Full caption pipeline: newline-flatten -> fix_text -> strip
    (crawlingathome.py:56)."""
    return fix_text(alt.replace("\n", " ")).strip()
