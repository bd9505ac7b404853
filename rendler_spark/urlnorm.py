"""Vectorized URL resolution + canonicalization (pandas string ops).

The reference resolved each extracted href with ``urlparse.urljoin(url,
href)`` and enqueued the result verbatim [upstream: python/crawl_executor.py
~L35-40] — no normalization at all, so ``HTTP://H0.TEST:80/p1`` and
``http://h0.test/p1`` were *different* URLs to RENDLER's seen-set.  The
north rule upgrades this to real canonicalization ("vectorized Arrow/pandas
UDFs for URL canonicalization", BASELINE.json:L6):

    lowercase scheme + host, strip default ports (:80/:443), strip
    fragments, resolve dot segments, resolve relative / root-relative /
    protocol-relative hrefs against the base, sort query keys.

Everything is pandas vectorized string ops except query-key sorting, which
runs only on the (rare) rows that contain '?' — documented small path.

The oracle simulator calls the same functions on single-element Series, so
engine and oracle canonicalize identically by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"
_BASE_RE = r"^(https?)://([^/?#]*)((?:/[^?#]*)?)"
_ABS_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"


def resolve(base: pd.Series, href: pd.Series) -> pd.Series:
    """Resolve href against base (RFC 3986-lite), vectorized.

    Handles absolute, protocol-relative (//host/p), root-relative (/p) and
    directory-relative (p) hrefs.  base must be an absolute http(s) URL
    (always true for frontier rows — they are canonical by induction).
    """
    href = href.astype(str).str.strip()
    base = base.astype(str)
    b = base.str.extract(_BASE_RE)
    b_scheme, b_host, b_path = b[0].fillna("http"), b[1].fillna(""), b[2].fillna("")
    b_dir = b_path.str.replace(r"[^/]*$", "", regex=True)
    b_dir = b_dir.where(b_dir.str.len() > 0, "/")

    has_scheme = href.str.match(_SCHEME_RE)
    protorel = href.str.startswith("//")
    rootrel = href.str.startswith("/") & ~protorel

    out = pd.Series(np.where(
        has_scheme,
        href,
        np.where(
            protorel,
            b_scheme + ":" + href,
            np.where(
                rootrel,
                b_scheme + "://" + b_host + href,
                b_scheme + "://" + b_host + b_dir + href,
            ),
        ),
    ), index=href.index)
    return out


def _resolve_dots(path: pd.Series) -> pd.Series:
    """Remove ./ and seg/../ dot segments — bounded regex-replace loop.

    Each iteration is a vectorized regex over the whole column; the loop
    runs until fixpoint (depth of nesting, <= ~10 for real URLs).
    """
    prev = None
    cur = path
    for _ in range(64):
        if prev is not None and cur.equals(prev):
            break
        prev = cur
        cur = cur.str.replace(r"/\.(?=/|$)", "/", regex=True)  # /./ and /.$
        cur = cur.str.replace(r"/(?!\.\.(?:/|$))[^/]+/\.\.(?=/|$)", "/", regex=True)
        cur = cur.str.replace(r"^/\.\.(?=/|$)", "/", regex=True)
        cur = cur.str.replace(r"//+", "/", regex=True)
    return cur


def _sort_query(q: pd.Series) -> pd.Series:
    """Sort query keys.  Only called on rows that HAVE a query ('?...') —
    the one per-row-Python path in the canonicalizer, on a rare slice."""
    mask = q.str.len() > 1
    if not mask.any():
        return q
    sub = q[mask].str.slice(1)
    q = q.copy()
    q[mask] = "?" + sub.map(lambda s: "&".join(sorted(s.split("&"))))
    return q


def canonicalize_abs(urls: pd.Series) -> pd.Series:
    """Canonicalize absolute URLs (vectorized).  Non-URL garbage passes
    through unchanged — the scheme filter downstream drops it."""
    urls = urls.astype(str)
    # fragment strip first (never part of the request)
    urls = urls.str.replace(r"#.*$", "", regex=True)
    ex = urls.str.extract(_ABS_RE)
    ok = ex[0].notna()
    scheme = ex[0].str.lower()
    auth = ex[1].str.lower()
    path = ex[2].fillna("")
    query = ex[3].fillna("")

    # strip default ports
    auth = auth.where(~((scheme == "http") & auth.str.endswith(":80")),
                      auth.str.replace(r":80$", "", regex=True))
    auth = auth.where(~((scheme == "https") & auth.str.endswith(":443")),
                      auth.str.replace(r":443$", "", regex=True))

    path = path.where(path.str.len() > 0, "/")
    path = _resolve_dots(path)
    query = _sort_query(query)

    canon = scheme + "://" + auth + path + query
    return pd.Series(np.where(ok, canon, urls), index=urls.index)


def canonicalize(base: pd.Series, href: pd.Series) -> pd.Series:
    """resolve + canonicalize_abs, the full H2 operator (SURVEY.md §2H)."""
    return canonicalize_abs(resolve(base, href))


def canonicalize_one(base: str, href: str) -> str:
    """Scalar convenience for the oracle — same code path as the engine."""
    return str(canonicalize(pd.Series([base]), pd.Series([href])).iloc[0])


def host_of(urls: pd.Series) -> pd.Series:
    """Host (authority) of canonical URLs, vectorized."""
    return urls.str.extract(r"^https?://([^/?#]*)")[0].fillna("")


def path_of(urls: pd.Series) -> pd.Series:
    """Path component of canonical URLs, vectorized."""
    return urls.str.extract(r"^https?://[^/?#]*([^?#]*)")[0].fillna("/")


def is_http(urls: pd.Series) -> pd.Series:
    """Scheme filter: keep http(s) only — mirrors the reference's implicit
    behavior (only absolute http links survive urljoin + fetch)."""
    return urls.str.match(r"^https?://")
