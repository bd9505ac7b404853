#!/usr/bin/env python
"""Full-registry correctness sweep — the driver harness, self-hosted.

The driver's CORRECTNESS_r{N}.json covers only the first 50 registered
queries; this script runs the SAME compare over EVERY entry in
``rendler_spark.queries.QUERIES`` (including everything deferred past the
driver window — see queries.py WINDOW/DEFERRED; the window rotates each
round so all families eventually get external rows too) so each
registered operator has committed, reproducible evidence each round.

Compare per query, mirroring the driver contract:
  * rows_match    — Spark row count == DuckDB oracle row count
  * schema_match  — sorted column-name lists equal
  * hash_match    — order-insensitive value hash equal: columns sorted by
                    name, rows sorted, every cell canonicalized (floats
                    bitwise via struct '>d' — NaN normalized, -0.0 kept
                    distinct from +0.0, exactly the property the r2
                    q_math_fns bug hid behind ==), sha256 over the bytes
  * queries with no oracle record a rows-only row (err="no_oracle")

Usage:  python tools/check_correctness.py [round_tag]
Writes: CORRECTNESS_SELF_{round_tag}.json  (default tag: "local")
"""

from __future__ import annotations

import hashlib
import json
import math
import struct
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.01"


def _cell_bytes(x) -> bytes:
    if x is None:
        return b"\x00N"
    if isinstance(x, float):
        if math.isnan(x):
            return b"\x01NaN"
        return b"\x01" + struct.pack(">d", x)
    if isinstance(x, bool):
        return b"\x02" + (b"1" if x else b"0")
    if isinstance(x, int):
        return b"\x03" + str(x).encode()
    if isinstance(x, (bytes, bytearray)):
        return b"\x04" + bytes(x)
    if isinstance(x, (list, tuple)):
        return b"\x05" + b"|".join(_cell_bytes(v) for v in x)
    return b"\x06" + str(x).encode()


def value_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = [
        b"\x1e".join(_cell_bytes(v) for v in rec)
        for rec in pdf.itertuples(index=False, name=None)
    ]
    h = hashlib.sha256()
    for r in sorted(rows):
        h.update(r)
        h.update(b"\x1f")
    return h.hexdigest()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "local"

    from rendler_spark.queries import ORACLE, QUERIES, TABLES
    from rendler_spark.session import get_spark

    spark = get_spark("local[16]", "correctness_self", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    out: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.monotonic()
        try:
            got = fn(spark, SF).toPandas()
            rec["spark_rows"] = int(len(got))
            if name in ORACLE:
                want = con.sql(ORACLE[name]).df()
                rec["oracle_rows"] = int(len(want))
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = sorted(got.columns) == sorted(want.columns)
                rec["hash_match"] = value_hash(got) == value_hash(want)
                # an oracled query returning 0 rows "matches" vacuously
                # (0 == 0 proves nothing about the operator under test) —
                # flag it so it cannot pass silently (ADVICE r4)
                rec["vacuous"] = len(got) == 0
            else:
                rec["err"] = "no_oracle"
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        rec["sec"] = round(time.monotonic() - t0, 2)
        out[name] = rec
        status = (
            "PASS" if rec["hash_match"]
            else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        )
        if rec.get("vacuous"):
            status = "VACUOUS"
        print(f"{name:32s} {status:9s} rows={rec['spark_rows']} {rec['sec']}s",
              flush=True)

    con.close()
    spark.stop()
    path = f"CORRECTNESS_SELF_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    n_pass = sum(1 for r in out.values() if r["hash_match"])
    n_rows = sum(1 for r in out.values() if r["err"] == "no_oracle")
    n_fail = len(out) - n_pass - n_rows
    n_vac = sum(1 for r in out.values() if r.get("vacuous"))
    print(
        f"\n{path}: {n_pass} oracle-exact, {n_rows} rows-only, "
        f"{n_fail} FAIL, {n_vac} vacuous"
    )
    sys.exit(1 if (n_fail or n_vac) else 0)


if __name__ == "__main__":
    main()
