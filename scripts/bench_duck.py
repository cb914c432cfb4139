#!/usr/bin/env python3
"""Time the DuckDB oracle suite over a testdata dir.

The perf target is ENGINE vs DUCKDB ON THE SAME MACHINE IN THE SAME
SESSION (absolute seconds moved 3.5x between rounds 8 and 9 on identical
code, so only the same-session ratio means anything). Run graft.Bench
first, then this, and compare totals.

Usage: python3 scripts/bench_duck.py <sfDir> <oracle_sql.json> [reps]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, oracle_json: str, reps: int = 2) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    times = {}
    failed = []
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(reps):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"FAIL {name}: {e}")
                failed.append(name)
                best = -1.0
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = best
        print(f"DUCK {name} {best:.3f}s", flush=True)
    total = sum(v for v in times.values() if v >= 0)
    print(json.dumps({
        "metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "n_failed": len(failed), "failed": failed, "sf": sf_dir}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 2))
