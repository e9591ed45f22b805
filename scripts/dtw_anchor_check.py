#!/usr/bin/env python3
"""Independent-engine anchor for long-series DTW.

Consumes graft.scale.DtwAnchor's JSON line (both Spark dispatch arms +
the dumped (pos, a, b) pair parquet), replays the SAME banded DTW DP as
a DuckDB recursive-CTE wavefront (the x1 oracle shape from
operators/SimilarityQueries.scala, single-pair specialization), and
requires spark_collected == spark_aggregator == duckdb at the
catalog's round-6 DTW comparability contract. Writes the combined
artifact JSON.

Usage: dtw_anchor_check.py <anchor_json_line_file> <out_artifact.json>
"""
import json
import sys
import time

import duckdb


def main() -> int:
    anchor_file, out_file = sys.argv[1], sys.argv[2]
    with open(anchor_file) as f:
        anchor = json.loads(
            [l for l in f if l.strip().startswith('{"metric":"dtw_anchor"')][-1])

    con = duckdb.connect()
    n = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{anchor['pair_parquet']}/*.parquet')"
    ).fetchone()[0]
    assert n == anchor["n_points"], (n, anchor["n_points"])
    # the kernel's band: w = max(10, max(n, m) // 4), n == m here
    w = max(10, n // 4)
    assert w == anchor["band"], (w, anchor["band"])
    last_d = 2 * n - 2

    # Single-pair banded wavefront: cell (i, j) with d = i + j advances
    # one anti-diagonal per recursion step; "ghost" rows (kind 1)
    # re-emit diagonal d-1 once so the D[i-1][j-1] candidate survives
    # band clipping, exactly as in the gated x1 oracle.
    sql = f"""
    WITH RECURSIVE
    av AS (SELECT pos - 1 AS i, a AS v FROM read_parquet('{anchor['pair_parquet']}/*.parquet')),
    bv AS (SELECT pos - 1 AS i, b AS v FROM read_parquet('{anchor['pair_parquet']}/*.parquet')),
    dp(kind, d, i, val) AS (
      SELECT 0, 0, 0, ABS(av.v - bv.v)
      FROM av, bv WHERE av.i = 0 AND bv.i = 0
      UNION ALL
      (
        SELECT 0, s.d, s.i2, ABS(a.v - b.v) + s.cand
        FROM (
          SELECT d + 1 + kind AS d, i + delta AS i2, MIN(val) AS cand
          FROM dp, (VALUES (0, 0), (0, 1), (1, 1)) g(k, delta)
          WHERE kind = g.k AND d + 1 + kind <= {last_d}
          GROUP BY d + 1 + kind, i + delta
        ) s
        JOIN av a ON a.i = s.i2
        JOIN bv b ON b.i = s.d - s.i2
        WHERE s.d - s.i2 BETWEEN 0 AND {n} - 1
          AND s.i2 BETWEEN 0 AND {n} - 1
          AND ABS(s.i2 - (s.d - s.i2)) <= {w}
        UNION ALL
        SELECT 1, d, i, val FROM dp WHERE kind = 0 AND d + 2 <= {last_d}
      ))
    SELECT val FROM dp WHERE kind = 0 AND d = {last_d} AND i = {n} - 1
    """
    t0 = time.time()
    rows = con.sql(sql).fetchall()
    wall = time.time() - t0
    assert len(rows) == 1, f"wavefront returned {len(rows)} corner cells"
    duck = rows[0][0]

    r6 = lambda x: round(x, 6)
    ok = (r6(duck) == r6(anchor["dtw_collected"]) == r6(anchor["dtw_aggregator"])
          and anchor["arms_identical"])
    artifact = dict(
        anchor,
        metric="dtw_anchor_cross_engine",
        dtw_duckdb=duck,
        duckdb_wall_s=round(wall, 2),
        round6_collected=r6(anchor["dtw_collected"]),
        round6_aggregator=r6(anchor["dtw_aggregator"]),
        round6_duckdb=r6(duck),
        cross_engine_identical_r6=ok,
    )
    with open(out_file, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
