"""M2/M3 equivalence gates (SURVEY.md §5.2.2, BASELINE.json:L6):

engine (distributed waves) vs oracle (sequential reference loop) on the
same synthetic web:

  * identical per-host BFS fetch order
  * identical final URL-seen set
  * identical edge multiset
  * per-row image equality: decoded-pixel allclose (byte-identical for
    lossless; PSNR>=40dB vs source pixels for qlossy) + caption equality
"""

import numpy as np
import pytest

from oracle_rendler import run_oracle
from rendler_spark import codecs, synthweb
from rendler_spark.engine import CrawlEngine

CFG = synthweb.WebConfig()  # t1 smoke tier (FIXTURES.md §1)
WAVES = 3


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh") / "t1")
    eng = CrawlEngine(spark, CFG, wh)
    stats = eng.run(WAVES)
    oracle = run_oracle(CFG, WAVES)
    return eng, stats, oracle


def test_fetch_order_exact(run, spark):
    eng, _, oracle = run
    rows = eng.wh.read(spark, "fetch_log").collect()
    got = sorted((r["wave"], r["host"], r["depth"], r["seq"], r["url"]) for r in rows)
    assert got == sorted(oracle.fetch_order)


def test_seen_set_identical(run, spark):
    eng, _, oracle = run
    got = {r["url"] for r in eng.wh.read(spark, "seen").select("url").collect()}
    assert got == oracle.seen


def test_blocked_set_identical(run, spark):
    eng, _, oracle = run
    got = {
        r["url"]
        for r in eng.wh.read(spark, "seen").filter("blocked").select("url").collect()
    }
    assert got == oracle.blocked


def test_edges_multiset_identical(run, spark):
    eng, _, oracle = run
    got = sorted(
        (r["src"], r["dst"], r["wave"]) for r in eng.wh.read(spark, "edges").collect()
    )
    assert got == sorted(oracle.edges)


def test_images_per_row_fidelity(run, spark):
    eng, _, oracle = run
    rows = eng.wh.read(spark, "images").collect()
    assert len(rows) == len(oracle.images)
    for r in rows:
        ob, ow, oh, ofmt, oph, ocap = oracle.images[r["image_id"]]
        assert (bytes(r["bytes"]), r["w"], r["h"], r["fmt"], r["phash"]) == (
            ob, ow, oh, ofmt, oph,
        )
        assert r["caption"] == ocap
        # decoded-pixel gate vs the SOURCE pixels (BASELINE.json:L15)
        hi, pj, _ = synthweb.parse_url(__import__("pandas").Series([r["image_id"]]))
        src = synthweb.render_pixels(CFG, int(hi[0]), int(pj[0]))
        dec = codecs.decode(bytes(r["bytes"]), r["fmt"])
        if r["fmt"] == "qlossy":
            assert codecs.psnr(src, dec) >= 40.0
        else:
            assert np.array_equal(src, dec)


def test_metrics_and_manifests(run, spark):
    eng, stats, oracle = run
    assert [s["n_fetched"] for s in stats] == [m["n_fetched"] for m in oracle.metrics]
    assert [s["n_robots_blocked"] for s in stats] == [
        m["n_robots_blocked"] for m in oracle.metrics
    ]
    # manifests: version 0 (init) + one per wave, with per-partition lineage
    assert eng.wh.last_version() == len(stats)
    for v in range(1, len(stats) + 1):
        man = eng.wh.manifest(v)
        assert man["kind"] == "wave" and "partitions" in man
        assert sum(man["partitions"].values()) == man["n_fetched"]


def test_export_graph(run, spark, tmp_path):
    """A5/C4: GraphViz export — edges kept iff BOTH endpoints rendered;
    the distributed (write.text) path is byte-identical to the
    driver-assembled path; nodes carry the thumbnail image attribute."""
    from rendler_spark.operators.export_graph import (
        export_dot, export_dot_distributed, rendered_edges,
    )

    eng, _, oracle = run
    edges = eng.wh.read(spark, "edges")
    images = eng.wh.read(spark, "images")
    got = {(r["src"], r["dst"]) for r in rendered_edges(edges, images).collect()}
    want = {
        (s, d) for s, d, _ in oracle.edges if s in oracle.images and d in oracle.images
    }
    assert got == want
    dot = export_dot(edges, images, str(tmp_path / "result.dot"))
    assert dot.startswith("digraph G {") and dot.rstrip().endswith("}")
    assert dot.count(" -> ") == len(want)
    assert dot.count('image="images/') == images.count()  # thumbnail attrs
    assert (tmp_path / "result.dot").exists()
    # distributed path: same bytes, no row ever collected to the driver
    dist = export_dot_distributed(edges, images, str(tmp_path / "dist"))
    assert dist == dot


def test_fetch_udf_modes_agree(spark, tmp_path):
    """mapInArrow and mapInPandas fetch stages must produce byte-identical
    images tables (same kernel, different Arrow plumbing)."""
    outs = {}
    for mode in ("arrow", "pandas"):
        e = CrawlEngine(spark, CFG, str(tmp_path / mode), fetch_udf=mode)
        e.run(2)
        outs[mode] = {
            r["image_id"]: (bytes(r["bytes"]), r["w"], r["h"], r["fmt"],
                            r["caption"], r["phash"])
            for r in e.wh.read(spark, "images").collect()
        }
    assert outs["arrow"] == outs["pandas"] and len(outs["arrow"]) > 0


def test_max_render_tasks_cap(spark, tmp_path):
    """B4: the reference's global render cutoff [upstream: python/rendler.py
    ~L120-135] as crawl_semantics rule 7 — a binding cumulative cap must
    split a wave deterministically and stop the crawl, matching the oracle
    simulator grown with the same knob."""
    cap = 9  # binds mid-wave-2 on t1 (uncapped fetches are 2, 5, 7, ...)
    eng = CrawlEngine(spark, CFG, str(tmp_path / "cap"), max_render_tasks=cap)
    stats = eng.run(6)
    oracle = run_oracle(CFG, 6, max_render_tasks=cap)
    assert sum(s["n_fetched"] for s in stats) == cap
    assert stats[-1]["n_total_fetched"] == cap
    rows = eng.wh.read(spark, "fetch_log").collect()
    got = sorted((r["wave"], r["host"], r["depth"], r["seq"], r["url"]) for r in rows)
    assert got == sorted(oracle.fetch_order)
    seen = {r["url"] for r in eng.wh.read(spark, "seen").select("url").collect()}
    assert seen == oracle.seen
    # the cap-deferred remainder stays in the frontier, resumable — and
    # matches the oracle's post-cap frontier exactly
    got_frontier = sorted(
        (r["url"], r["depth"], r["seq"])
        for r in eng.wh.read(spark, "frontier", wave=len(stats)).collect()
    )
    want_frontier = sorted((u, d, s) for u, _, d, s in oracle.frontier)
    assert got_frontier == want_frontier and len(got_frontier) > 0


def test_bloom_modes_agree(spark, tmp_path):
    """bloom=off (pure anti-join), bloom=broadcast, and bloom=copartition
    (cogrouped shard-bits table — the 10^10-scale path) produce identical
    seen sets and frontiers: the prefilter is invisible to semantics."""
    engines = {
        mode: CrawlEngine(spark, CFG, str(tmp_path / mode), bloom_mode=mode)
        for mode in ("off", "broadcast", "copartition")
    }
    results = {}
    for mode, e in engines.items():
        e.run(2)
        seen = frozenset(
            r["url"] for r in e.wh.read(spark, "seen").select("url").collect()
        )
        frontier = tuple(
            sorted(
                (r["url"], r["depth"], r["seq"])
                for r in e.wh.read(spark, "frontier", wave=2).collect()
            )
        )
        results[mode] = (seen, frontier)
    assert results["off"] == results["broadcast"] == results["copartition"]
