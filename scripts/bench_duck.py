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


def anchor_sec() -> float:
    """Fixed CPU-anchor calibration, mirroring graft.Bench.cpuAnchorSec:
    a pinned single-threaded 64-bit hash-fold over a constant row count,
    whose wall-time depends ONLY on host speed and load — never on the
    registry or the data. Quiet hosts here measure ~0.9-1.1 s; >2x the
    round ledger's value => treat the totals as contaminated. (Round-16:
    the weak bar's DuckDB denominators swing 3-4x between hosts, so the
    oracle side of every pairing now carries machine state too.)"""
    con = duckdb.connect()
    con.execute("SET threads=1")
    con.execute("SELECT bit_xor(hash(range)) FROM range(5000000)").fetchall()
    best = None
    for _ in range(3):
        t0 = time.time()
        con.execute(
            "SELECT bit_xor(hash(range)) FROM range(200000000)").fetchall()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    con.close()
    return best


def loadavg() -> str:
    try:
        with open("/proc/loadavg") as f:
            return " ".join(f.read().split()[:3])
    except Exception:
        return ""


def main(sf_dir: str, oracle_json: str, reps: int = 2) -> int:
    anchor = anchor_sec()
    load_before = loadavg()
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
        "n_failed": len(failed), "failed": failed,
        "anchor_sec": round(anchor, 3), "loadavg_before": load_before,
        "loadavg_after": loadavg(), "sf": sf_dir}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 2))
