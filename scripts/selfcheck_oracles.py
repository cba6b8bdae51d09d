#!/usr/bin/env python
"""Full-registry correctness self-check: run EVERY queries() entry on Spark
and its oracle_sql() twin on DuckDB at sf0.01, mirroring the driver's
CORRECTNESS gate (row count + column names + order-insensitive value hash),
and write one JSON file covering the whole registry.

Why this exists: the driver's per-round CORRECTNESS_r{N}.json caps at 50
queries while the registry holds ~250.  `queries()` rotates
least-recently-driver-verified entries to the front so every query cycles
through the driver window, but a single round can only evidence 50.  This
script is the whole-registry complement: the same comparison, all entries,
one artifact (committed as CORRECTNESS_SELF.json with the producing
commit).  tests/test_entry_contract.py runs the identical comparison as
pytest parametrizations; this emits the machine-readable summary.

Usage:  python scripts/selfcheck_oracles.py [--out CORRECTNESS_SELF.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(pdf):
    import numpy as np

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(6)
            # DuckDB surfaces some integer results (HUGEINT sums, // on
            # aggregates) as float64 while Spark keeps int64 — canonical-
            # ize integral float columns so the value hash is dtype-blind
            # (the driver's compare is; assert_frame_equal check_dtype=False)
            v = pdf[c].to_numpy()
            if (
                len(v) == 0
                or (
                    np.isfinite(v).all()
                    and (v % 1 == 0).all()
                    and np.abs(v).max() < 2**53
                )
            ):
                pdf[c] = pdf[c].astype("int64")
        elif "int" in str(pdf[c].dtype).lower():
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _value_hash(pdf) -> str:
    return hashlib.sha256(
        pdf.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="CORRECTNESS_SELF.json")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all)")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from split_merge_partitioner_spark.session import get_spark

    spark = get_spark(app_name="smp-selfcheck", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qd = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qd) if args.only is None else args.only.split(",")
    results: dict[str, dict] = {}
    n_ok = n_rows_only = n_fail = 0
    t_start = time.monotonic()
    for i, name in enumerate(names, 1):
        row: dict = {"err": None}
        t0 = time.monotonic()
        try:
            got = _normalize(qd[name](spark, args.sf_dir).toPandas())
            row["spark_rows"] = len(got)
            if name in oracles:
                exp = _normalize(con.execute(oracles[name]).df())
                row["oracle_rows"] = len(exp)
                row["rows_match"] = len(got) == len(exp)
                row["schema_match"] = list(got.columns) == list(exp.columns)
                row["hash_match"] = (
                    row["rows_match"] and row["schema_match"]
                    and _value_hash(got) == _value_hash(exp)
                )
                if row["hash_match"]:
                    n_ok += 1
                else:
                    n_fail += 1
            else:
                row.update(rows_match=None, schema_match=None,
                           hash_match=None, oracle_rows=None)
                n_rows_only += 1
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            n_fail += 1
        row["sec"] = round(time.monotonic() - t0, 2)
        results[name] = row
        status = ("OK" if row.get("hash_match") else
                  "rows" if row.get("hash_match") is None and not row["err"]
                  else "FAIL")
        print(f"[{i}/{len(names)}] {name}: {status} ({row['sec']}s)",
              flush=True)

    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    out = {
        "_meta": {
            "sf_dir": args.sf_dir,
            "n_queries": len(names),
            "n_hash_match": n_ok,
            "n_rows_only": n_rows_only,
            "n_fail": n_fail,
            "wall_sec": round(time.monotonic() - t_start, 1),
            "commit": commit,
            # the driver's correctness gate checks the FIRST 50 queries()
            # entries; record the window so the artifact shows the
            # rotation state this run was produced under
            "driver_window_first_50": list(qd)[:50],
        }
    }
    out.update(results)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    if args.out.endswith(".json") and args.only is None:
        md = args.out[:-5] + ".md"
        with open(md, "w") as f:
            f.write(
                "# Full-registry oracle self-check\n\n"
                f"sf_dir `{args.sf_dir}` · commit `{commit[:12]}` · "
                f"{len(names)} queries: **{n_ok} hash-match**, "
                f"{n_rows_only} rows-only (no SQL oracle by design), "
                f"{n_fail} fail · {round(time.monotonic() - t_start, 1)} s\n\n"
                "| query | status | rows | sec |\n|---|---|---|---|\n"
            )
            for name, row in results.items():
                st = ("hash-match" if row.get("hash_match")
                      else "rows-only" if row.get("hash_match") is None
                      and not row["err"] else f"FAIL: {row['err']}")
                f.write(
                    f"| {name} | {st} | {row.get('spark_rows', '—')} "
                    f"| {row['sec']} |\n"
                )
    print(json.dumps(out["_meta"]))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
