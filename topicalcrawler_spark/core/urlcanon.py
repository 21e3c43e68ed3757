"""URL canonicalization — the exact rule set from the spec.

Spec (``BASELINE.json:6`` north_star): "seed URLs are canonicalized
(lowercase host, strip fragments/default ports, sort query params)".

Rules, in order:

1. strip surrounding whitespace
2. scheme lowercased
3. host lowercased (userinfo, if any, preserved verbatim)
4. default port stripped (http:80, https:443); other ports kept
5. fragment dropped
6. empty path becomes "/"
7. query parameters split on "&", empty params dropped, sorted
   lexicographically by the full "k=v" token, re-joined with "&";
   an empty query drops the "?"

Strings that do not parse as ``scheme://...`` are returned stripped but
otherwise untouched — the engine's scheme filter (P4) drops them later.

One code path is shared by the Spark pandas-UDF (functions/) and the
pure-Python oracle (tests/oracle_crawler.py) so both sides agree
byte-for-byte.  Note on "vectorized": pandas ``.str`` accessors execute
a per-element Python loop internally, so a memoization-friendly scalar
function applied batch-at-a-time inside an Arrow-transferred pandas UDF
has the same execution profile — the per-row *serialization* cost that
the no-per-row-Python rule targets is avoided either way.
"""

from __future__ import annotations

import re

import pandas as pd

_URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://"  # scheme
    r"([^/?#]*)"  # authority (userinfo@host:port)
    r"([^?#]*)"  # path
    r"(?:\?([^#]*))?"  # query
    r"(?:#.*)?$"  # fragment (dropped)
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canon_url(url: str) -> str:
    """Canonicalize one URL according to the spec rules above."""
    if url is None:
        return None
    u = url.strip()
    m = _URL_RE.match(u)
    if m is None:
        return u
    scheme, authority, path, query = m.groups()
    scheme = scheme.lower()

    userinfo = ""
    hostport = authority
    at = authority.rfind("@")
    if at >= 0:
        userinfo = authority[: at + 1]
        hostport = authority[at + 1 :]

    host, port = hostport, ""
    colon = hostport.rfind(":")
    if colon >= 0 and hostport[colon + 1 :].isdigit():
        host = hostport[:colon]
        port = hostport[colon + 1 :]
    host = host.lower()
    if port and port != _DEFAULT_PORTS.get(scheme, ""):
        host = f"{host}:{port}"

    if not path:
        path = "/"

    out = f"{scheme}://{userinfo}{host}{path}"
    if query:
        params = sorted(p for p in query.split("&") if p)
        if params:
            out += "?" + "&".join(params)
    return out


def canon_series(s: pd.Series) -> pd.Series:
    """Batch canonicalization for pandas-UDF use; same rules as canon_url."""
    return s.map(canon_url, na_action="ignore")


# The bracketed-IPv6 alternative must come first: without it the
# plain-host branch stops at the first ':' INSIDE the brackets and
# http://[::1]/x extracts host '[' — every IPv6 literal then collapses
# into one politeness group and its robots rows can never join.
_HOST_RE = re.compile(
    r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#]*@)?(\[[^\]/?#]*\]|[^/?#:]*)"
)
_PATH_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)")


def host_of(url_canon: str) -> str:
    """Extract the (already lowercased) host from a canonical URL."""
    if url_canon is None:
        return None
    m = _HOST_RE.match(url_canon)
    return m.group(1) if m else ""


def path_of(url_canon: str) -> str:
    """Extract the path component (for robots prefix matching).

    Prefix regex (``_PATH_RE``), NOT the fully-anchored ``_URL_RE``:
    the engine's JVM-side ``functions.path_expr`` is this function's
    literal twin, and an anchored form diverges from it on strings the
    anchor rejects but the prefix accepts — e.g. a newline inside a
    fragment (``_URL_RE``'s ``#.*$`` stops at ``\\n``, failing the whole
    match → ``""`` here while the prefix regex still extracts the
    path).  Such URLs survive canon_url un-canonicalized yet pass the
    http(s) scheme gate, so both sides MUST extract identically or the
    robots join diverges on the first weird-but-real link."""
    if url_canon is None:
        return None
    m = _PATH_RE.match(url_canon)
    if m is None:
        return ""
    return m.group(1) or "/"
