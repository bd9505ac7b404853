"""Vectorized link extraction from HTML (SURVEY.md §2H H1).

The reference used a SAX HTMLParser subclass collecting every ``<a href>``
[upstream: python/crawl_executor.py ~L18-40 ``class LinkParser``]; the C++
port used regex over the body [upstream: cpp/crawl_executor.cpp ~L40-80].
We take the regex route, vectorized with ``pandas.Series.str.extractall``
(C-level regex engine, no per-row Python).
"""

from __future__ import annotations

import pandas as pd

_HREF_RE = r"""<a\s[^>]*href=["']([^"']+)["']"""

#: separator used to pack a page's links into one string column so the
#: JVM side can split+posexplode (keeps html Python-side only)
SEP = "\x1f"


def extract_links(html: pd.Series) -> pd.Series:
    """Per page: list of raw hrefs, packed as a SEP-joined string.

    Vectorized: extractall -> unstack to a bounded-width grid -> string
    concat.  Pages with no links yield ''.
    """
    m = html.str.extractall(_HREF_RE)[0]
    if m.empty:
        return pd.Series([""] * len(html), index=html.index)
    grid = m.unstack()
    out = pd.Series("", index=html.index, dtype=str)
    first = True
    for col in grid.columns:  # bounded by max links per page
        c = grid[col]
        present = c.notna()
        add = c.fillna("")
        if first:
            out = out.add(add, fill_value="")
            first = False
        else:
            out = out.add((SEP + c[present]).reindex(html.index, fill_value=""),
                          fill_value="")
    return out.reindex(html.index, fill_value="")


def extract_links_list(html: pd.Series) -> pd.Series:
    """Same extraction, returned as Python lists (for tests/oracle)."""
    packed = extract_links(html)
    return packed.map(lambda s: s.split(SEP) if s else [])
