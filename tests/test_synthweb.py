import numpy as np
import pandas as pd

from rendler_spark import synthweb, urlnorm
from rendler_spark.functions import links as linkfns

CFG = synthweb.WebConfig()


def test_url_parse_inverse():
    hi = np.arange(CFG.n_hosts).repeat(4)
    pj = np.tile(np.arange(4), CFG.n_hosts)
    urls = synthweb.page_url(CFG, hi, pj)
    h2, p2, ok = synthweb.parse_url(urls)
    assert ok.all() and (h2 == hi).all() and (p2 == pj).all()


def test_mega_host_pages():
    assert int(synthweb.n_pages(CFG, [0])[0]) == CFG.pages_per_host * CFG.mega_factor
    assert int(synthweb.n_pages(CFG, [1])[0]) == CFG.pages_per_host


def test_world_deterministic():
    hi, pj = np.array([0, 3]), np.array([5, 7])
    assert synthweb.page_html(CFG, hi, pj).tolist() == synthweb.page_html(CFG, hi, pj).tolist()
    assert (synthweb.render_pixels(CFG, 3, 7) == synthweb.render_pixels(CFG, 3, 7)).all()
    assert synthweb.render_encoded(CFG, 3, 7) == synthweb.render_encoded(CFG, 3, 7)


def test_links_extract_and_canonicalize():
    """Every href in every variant canonicalizes back into the URL grammar
    and points at the target (t_hi, t_pj) the generator intended."""
    hi = np.arange(CFG.n_hosts).repeat(2)
    pj = np.tile(np.arange(2), CFG.n_hosts)
    urls = synthweb.page_url(CFG, hi, pj)
    html = synthweb.page_html(CFG, hi, pj)
    row, pos, t_hi, t_pj, href = synthweb.link_targets(CFG, hi, pj)
    extracted = linkfns.extract_links_list(html)
    # extraction recovers exactly the generated hrefs, in page order
    flat = [(r, p) for r, lst in enumerate(extracted) for p in range(len(lst))]
    assert flat == list(zip(row.tolist(), pos.tolist()))
    canon = urlnorm.canonicalize(urls.iloc[row].reset_index(drop=True), href)
    want = synthweb.page_url(CFG, t_hi, t_pj)
    assert canon.tolist() == want.tolist()


def test_seeds_valid_and_public():
    s = synthweb.seeds(CFG)
    assert len(s) == CFG.n_seeds
    hi, pj, ok = synthweb.parse_url(pd.Series(s))
    assert ok.all()
    assert not synthweb.is_private(CFG, hi, pj).any()


def test_effective_budget():
    assert synthweb.effective_budget(8, None) == 8
    assert synthweb.effective_budget(8, 2.0) == 4
    assert synthweb.effective_budget(8, 100.0) == 1


def test_caption_shape():
    cap = synthweb.page_caption(CFG, [1], [2]).iloc[0]
    assert len(cap.split(" ")) == 8
