import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from rendler_spark import urlnorm

CASES = [
    # (base, href, expected)
    ("http://a.test/x/y", "z?b=2&a=1#f", "http://a.test/x/z?a=1&b=2"),
    ("http://a.test/", "HTTPS://B.TEST:443/../p", "https://b.test/p"),
    ("http://a.test/d/e", "../p0", "http://a.test/p0"),
    ("http://a.test/", "//c.test/p1", "http://c.test/p1"),
    ("http://a.test/", "mailto:x@y", "mailto:x@y"),  # passes through; filtered later
    ("http://a.test/p", "HTTP://A.TEST:80/q", "http://a.test/q"),
    ("http://a.test/p", "/x/../q", "http://a.test/q"),
    ("http://a.test/p", "/x/./y/../q#frag", "http://a.test/x/q"),
    ("http://a.test/p", "http://b.test", "http://b.test/"),
    ("https://a.test/p", "//c.test/q", "https://c.test/q"),
    ("http://a.test/private/p3", "p9", "http://a.test/private/p9"),
    ("http://a.test/p", "http://b.test//x//y", "http://b.test/x/y"),
]


def test_cases_scalar():
    for base, href, want in CASES:
        assert urlnorm.canonicalize_one(base, href) == want, (base, href)


def test_cases_vectorized_batch():
    base = pd.Series([c[0] for c in CASES])
    href = pd.Series([c[1] for c in CASES])
    got = urlnorm.canonicalize(base, href)
    assert got.tolist() == [c[2] for c in CASES]


def test_helpers():
    s = pd.Series(["http://h1.test/private/p3", "https://x.test:8080/a?q=1"])
    assert urlnorm.host_of(s).tolist() == ["h1.test", "x.test:8080"]
    assert urlnorm.path_of(s).tolist() == ["/private/p3", "/a"]
    assert urlnorm.is_http(pd.Series(["http://a/", "ftp://b/", "mailto:c"])).tolist() == [
        True, False, False,
    ]


_hosts = st.sampled_from(["A.Test", "h0.test", "WWW.X.TEST", "b.test"])
_scheme = st.sampled_from(["http", "HTTP", "https"])
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_path = st.lists(
    st.sampled_from(["p1", "x", "..", ".", "private"]), min_size=0, max_size=4
).map(lambda segs: "/" + "/".join(segs))
_frag = st.sampled_from(["", "#f", "#sec/2"])


@given(_scheme, _hosts, _port, _path, _frag)
@settings(max_examples=150, deadline=None)
def test_idempotence(scheme, host, port, path, frag):
    """canon(canon(u)) == canon(u) — FIXTURES.md §5 property."""
    u = f"{scheme}://{host}{port}{path}{frag}"
    c1 = urlnorm.canonicalize_one(u, u)
    c2 = urlnorm.canonicalize_one(c1, c1)
    assert c1 == c2


@given(_path)
@settings(max_examples=100, deadline=None)
def test_dot_resolution_matches_posix(path):
    """Dot-segment removal agrees with a reference sequential algorithm."""
    got = urlnorm.canonicalize_one("http://h.test/", f"http://h.test{path or '/'}")
    # reference: RFC 3986 remove_dot_segments (sequential), plus our
    # //-collapse rule; '.'/'..'/'' as the LAST segment leave a trailing /
    segs = (path or "/").split("/")[1:]
    out, trail = [], False
    for i, seg in enumerate(segs):
        last = i == len(segs) - 1
        if seg in ("", "."):
            trail = last
        elif seg == "..":
            if out:
                out.pop()
            trail = last
        else:
            out.append(seg)
            trail = False
    want = "http://h.test/" + "/".join(out) + ("/" if trail and out else "")
    assert got == want, (path, got, want)
