"""A6 / BASELINE.json:L14: exact resume from per-wave checkpoint.

Full run vs (partial run -> kill -> resume) must produce identical final
tables — content-identical row sets including image bytes.
"""

import shutil

from rendler_spark import synthweb
from rendler_spark.engine import CrawlEngine

CFG = synthweb.WebConfig()
WAVES = 3


def _table_rows(spark, eng, table, cols):
    return sorted(
        tuple(bytes(r[c]) if isinstance(r[c], (bytes, bytearray)) else r[c] for c in cols)
        for r in eng.wh.read(spark, table).select(*cols).collect()
    )


def test_kill_and_resume_bit_identical(spark, tmp_path):
    full = CrawlEngine(spark, CFG, str(tmp_path / "full"))
    full.run(WAVES)

    part = CrawlEngine(spark, CFG, str(tmp_path / "part"))
    part.run(2)  # "crash" after wave-1 commit
    # simulate an uncommitted partial write of the next wave: garbage in
    # wave=2 dirs must be overwritten on resume (idempotent re-run)
    garbage = part.wh.part_dir("images", 2)
    garbage.mkdir(parents=True, exist_ok=True)
    (garbage / "junk.txt").write_text("partial uncommitted write")

    stats = CrawlEngine.resume(spark, CFG, str(tmp_path / "part"), WAVES)
    assert [s["wave"] for s in stats] == [2]

    resumed = CrawlEngine(spark, CFG, str(tmp_path / "part"))
    checks = {
        "seen": ("url", "depth", "seq", "blocked"),
        "edges": ("src", "dst", "wave"),
        "fetch_log": ("wave", "host", "depth", "seq", "url"),
        "images": ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"),
        "frontier": ("url", "host", "depth", "seq"),
    }
    for table, cols in checks.items():
        assert _table_rows(spark, full, table, cols) == _table_rows(
            spark, resumed, table, cols
        ), table
    assert full.wh.last_version() == resumed.wh.last_version() == WAVES
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_snapshot_keep_bounds_manifests_and_stays_identical(spark, tmp_path):
    """snapshot_keep expires old manifests after each wave commit; the
    crawl's outputs are unchanged vs the default engine and resume from
    the latest (retained) manifest still works."""
    ref = CrawlEngine(spark, CFG, str(tmp_path / "ref"))
    ref.run(WAVES)

    kept = CrawlEngine(spark, CFG, str(tmp_path / "kept"), snapshot_keep=2)
    kept.run(2)
    assert kept.wh.first_version() == kept.wh.last_version() - 1  # expired
    stats = CrawlEngine.resume(spark, CFG, str(tmp_path / "kept"), WAVES)
    assert [s["wave"] for s in stats] == [2]

    resumed = CrawlEngine(spark, CFG, str(tmp_path / "kept"))
    for table, cols in {
        "seen": ("url", "depth", "seq", "blocked"),
        "edges": ("src", "dst", "wave"),
        "images": ("image_id", "bytes", "caption", "phash"),
    }.items():
        assert _table_rows(spark, ref, table, cols) == _table_rows(
            spark, resumed, table, cols
        ), table
    shutil.rmtree(tmp_path, ignore_errors=True)
