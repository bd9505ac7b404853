"""Second-tier equivalence: bigger web, more waves, crawl_delay + deferrals
actually exercised (t1 rarely defers).  Same gates as the t1 suite."""

import pytest

from oracle_rendler import run_oracle
from rendler_spark import synthweb
from rendler_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(
    n_hosts=16, pages_per_host=64, max_links=10, n_seeds=3, budget=6
)
WAVES = 4


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh") / "t15")
    eng = CrawlEngine(spark, CFG, wh, n_salt=4)
    stats = eng.run(WAVES)
    oracle = run_oracle(CFG, WAVES)
    return eng, stats, oracle


def test_fetch_order_and_deferral(run, spark):
    eng, stats, oracle = run
    rows = eng.wh.read(spark, "fetch_log").collect()
    got = sorted((r["wave"], r["host"], r["depth"], r["seq"], r["url"]) for r in rows)
    assert got == sorted(oracle.fetch_order)
    # this tier must actually exercise budget deferral
    assert sum(s["n_deferred"] for s in stats) > 0


def test_seen_edges_images(run, spark):
    eng, _, oracle = run
    seen = {r["url"] for r in eng.wh.read(spark, "seen").select("url").collect()}
    assert seen == oracle.seen
    edges = sorted(
        (r["src"], r["dst"], r["wave"]) for r in eng.wh.read(spark, "edges").collect()
    )
    assert edges == sorted(oracle.edges)
    img = {
        r["image_id"]: (bytes(r["bytes"]), r["fmt"], r["phash"], r["caption"])
        for r in eng.wh.read(spark, "images").collect()
    }
    assert set(img) == set(oracle.images)
    for url, (b, fmt, ph, cap) in img.items():
        ob, _, _, ofmt, oph, ocap = oracle.images[url]
        assert (b, fmt, ph, cap) == (ob, ofmt, oph, ocap)
