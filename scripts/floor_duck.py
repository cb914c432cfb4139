#!/usr/bin/env python3
"""DuckDB leg of the x89/x91 sub-second floor receipts.

ScaleProbe's SCALE-AUCFLOOR / SCALE-QTFLOOR sections write the scaled
operator INPUTS to target/scale_auc_k{k} and target/scale_qtile_k{k};
this script times DuckDB recomputing the same operator on the same
parquet, so the pairing is same-data, same-machine, same-session-class.
The point: the engine's curve is ~flat (Spark scheduling floor), so a
crossover k exists where DuckDB's corpus-linear time passes it.

Usage: python3 scripts/floor_duck.py [k1,k2,...]   (default 1,4,16)
"""
import sys
import time

import duckdb

AUC_SQL = """
WITH h AS (
  SELECT s, CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM read_parquet('target/scale_auc_k{k}/*.parquet') GROUP BY s),
c AS (
  SELECT np, nn,
    CAST(coalesce(sum(nn) OVER (ORDER BY s
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cnb
  FROM h)
SELECT round(CAST(sum(np * (2 * cnb + nn)) AS DOUBLE)
             / CAST(2 * sum(np) * sum(nn) AS DOUBLE), 6) AS auc6
FROM c"""

QT_SQL = """
WITH hist AS (
  SELECT n_chars // 64 AS bin, count(*) AS cnt
  FROM read_parquet('target/scale_qtile_k{k}/*.parquet') GROUP BY 1),
cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM hist),
tot AS (SELECT sum(cnt) AS n FROM hist),
q AS (SELECT unnest([250000, 500000, 750000, 900000, 990000]) AS q_ppm)
SELECT q_ppm, min(bin) AS qbin
FROM q, tot, cum WHERE cum >= (q_ppm * n + 999999) // 1000000
GROUP BY q_ppm ORDER BY q_ppm"""


def main(ks):
    con = duckdb.connect()
    for name, sql in (("AUCFLOOR", AUC_SQL), ("QTFLOOR", QT_SQL)):
        for k in ks:
            best = None
            for _ in range(2):
                t0 = time.time()
                con.execute(sql.format(k=k)).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"DUCK-{name} k={k} t={best:6.2f}s")
    return 0


if __name__ == "__main__":
    ks = [int(x) for x in
          (sys.argv[1] if len(sys.argv) > 1 else "1,4,16").split(",")]
    sys.exit(main(ks))
