"""URL semantics shared by the Spark UDFs and the oracle.

- `absolutize`: exact reference behavior — `urljoin(dirname(page_url), url)` only
  when the link is not already http(s) (crawlingathome.py:47, 66-67).
- `canonicalize`: RFC 3986 canonical form (north_rule extension T6, SURVEY.md §2.3):
  lowercase scheme+host, strip fragment, drop default ports, sort query params.
  NOT in the reference (it dedups raw URLs); the engine keeps both columns.
"""

from __future__ import annotations

import posixpath
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit


def url_dirname(url: str) -> str:
    """`os.path.dirname` on a URL, as the reference does (crawlingathome.py:47)."""
    return posixpath.dirname(url)


def absolutize(page_url: str, link_url: str) -> str:
    """Resolve relative links against dirname(page_url) — crawlingathome.py:66-67."""
    if link_url.startswith("http"):
        return link_url
    return urljoin(url_dirname(page_url), link_url)


_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str) -> str:
    """RFC 3986 canonical URL: lowercase scheme/host, strip fragment & default
    port, sort query parameters, '/' path when empty."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    netloc = host
    if parts.port is not None and str(parts.port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{parts.port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = parts.path or "/"
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    """Lowercase hostname; "" when unparseable."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def path_of(url: str) -> str:
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"
