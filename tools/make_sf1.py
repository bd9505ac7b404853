"""Derive an sf1.0-equivalent testdata dir from sf0.1 — deterministically,
with no external data (the driver testdata stops at sf0.1; the Spark-vs-
DuckDB trend needs a bigger point).

Each big table is 10 key-shifted copies of its sf0.1 self (CROSS JOIN
range(10), keys offset by rep * 1e9 so join fanout and group cardinality
scale the way TPC-H's own sf scaling does); small dims are copied as-is.
Written by DuckDB as SINGLE parquet files with ~200k-row ROW GROUPS —
deliberately: the sf0.1 testdata files are one-file/one-row-group, which
caps Spark's scan parallelism at 1 task (split granularity = row group,
BENCH/BASELINE.md "Engine vs DuckDB"); at sf1 both engines see ~30 row
groups and the comparison measures engines, not file layout.
"""

from __future__ import annotations

import os
import shutil

BIG = {
    "lineitem": "l_orderkey + rep * 1000000000 AS l_orderkey",
    "orders": "o_orderkey + rep * 1000000000 AS o_orderkey",
    "events": "event_id + rep * 1000000000 AS event_id",
    # near-identical replicas (tail token differs): the shape a dedup
    # pipeline actually faces at scale — MinHash/LSH must bucket the 10
    # copies together and the verify stage sees real candidate volume
    "documents": "doc_id + rep * 1000000000 AS doc_id, "
    "text || ' r' || rep AS text",
}
SMALL = "region nation customer supplier part embeddings".split()


def ensure_sf1(sf01_dir: str, out_dir: str = "/tmp/rendler_sf1") -> str:
    """Create (or reuse) the sf1 dir; returns its path.  Idempotent: a
    completed build is detected via a marker file."""
    layout = "v2"  # bump when BIG/SMALL change so stale dirs rebuild
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == layout:
                return out_dir
    import duckdb

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t, shift in BIG.items():
        con.sql(
            f"""COPY (SELECT t.* REPLACE ({shift})
                      FROM '{sf01_dir}/{t}.parquet' t CROSS JOIN range(10) r(rep))
                TO '{out_dir}/{t}.parquet'
                (FORMAT PARQUET, ROW_GROUP_SIZE 200000)"""
        )
    con.close()
    for t in SMALL:
        shutil.copyfile(f"{sf01_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")
    with open(marker, "w") as f:
        f.write(layout + "\n")
    return out_dir
