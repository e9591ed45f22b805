#!/usr/bin/env python3
"""Fire-proof for the d5a adaptive-oracle's SQL-side planes guards.

The d5a oracle SQL carries fail-loud guards on the shared
adaptive_planes table (operators/VectorQueries.scala): a SIZE guard
(COUNT(*) < bands*bits+1024 -> error()) and, since r11, a
pid-CONTIGUITY guard (MAX(pid)+1 != COUNT(*) -> error()) — a partially
regenerated table can pass the count check while a pid-numbering gap
silently drops planes under `pid < bands*bits`, exactly the
silent-truncation class the guards exist to catch. A guard that has
never fired is decoration; this script doctors a COPY of the committed
planes table and asserts each case behaves:

  control   : intact copy           -> query runs, no error
  truncated : first 100 pids only   -> 'table too small' fires
  gap       : one middle pid deleted-> count check passes
                                       (6399 >= need) but contiguity fires
  dupgap    : one pid deleted AND    -> count AND max_pid+1 both still
              another duplicated       match, but COUNT(DISTINCT pid)
                                       doesn't — the r11-ADVICE dup+gap
                                       hole; the distinct guard fires

Usage: guard_fire_check.py <oracle_sql.json> <sfDir> [out_artifact.json]
(oracle_sql.json is graft.Verify's dump; sfDir supplies embeddings.)
"""
import json
import os
import re
import shutil
import sys
import tempfile

import duckdb


def run_case(sql, planes_glob, orig_glob, sf):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    emb = f"{sf}/embeddings.parquet"
    if os.path.isdir(emb):
        emb += "/*.parquet"
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{emb}')")
    try:
        rows = con.sql(sql.replace(orig_glob, planes_glob)).fetchall()
        return ("ok", len(rows))
    except Exception as e:
        return ("error", str(e))
    finally:
        con.close()


def main() -> int:
    oracle_json, sf = sys.argv[1], sys.argv[2]
    out_file = sys.argv[3] if len(sys.argv) > 3 else None
    with open(oracle_json) as f:
        sql = json.load(f)["d5a_neardup_adaptive"]
    m = re.search(r"read_parquet\('([^']*adaptive_planes[^']*)'\)", sql)
    assert m, "d5a oracle SQL no longer embeds an adaptive_planes glob"
    orig_glob = m.group(1)

    tmp = tempfile.mkdtemp(prefix="guard_fire_")
    con = duckdb.connect()
    results = {}
    try:
        for name, where in [
            ("control", "TRUE"),
            ("truncated", "pid < 100"),
            ("gap", "pid <> 3000"),
            # dup+gap: drop pid 3000, duplicate pid 2000 — row count and
            # MAX(pid)+1 both match the intact table, only the distinct
            # count betrays it
            ("dupgap", "pid <> 3000 UNION ALL "
                       f"SELECT * FROM read_parquet('{orig_glob}') "
                       "WHERE pid = 2000"),
        ]:
            d = os.path.join(tmp, name)
            os.makedirs(d)
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{orig_glob}') WHERE {where}) "
                f"TO '{d}/planes.parquet' (FORMAT PARQUET)")
            results[name] = run_case(sql, f"{d}/*.parquet", orig_glob, sf)
    finally:
        con.close()
        shutil.rmtree(tmp, ignore_errors=True)

    ok = (
        results["control"][0] == "ok"
        and results["truncated"][0] == "error"
        and "too small" in results["truncated"][1]
        and results["gap"][0] == "error"
        and "not contiguous" in results["gap"][1]
        and results["dupgap"][0] == "error"
        and "not contiguous" in results["dupgap"][1]
    )
    artifact = {
        "metric": "d5a_guard_fire_proof",
        "sf_dir": sf,
        "control": results["control"][0],
        "control_rows": results["control"][1] if results["control"][0] == "ok" else None,
        "truncated_fires_size_guard": results["truncated"][0] == "error"
        and "too small" in results["truncated"][1],
        "gap_fires_contiguity_guard": results["gap"][0] == "error"
        and "not contiguous" in results["gap"][1],
        "dupgap_fires_distinct_guard": results["dupgap"][0] == "error"
        and "not contiguous" in results["dupgap"][1],
        "truncated_msg": results["truncated"][1][:200],
        "gap_msg": results["gap"][1][:200],
        "dupgap_msg": results["dupgap"][1][:200],
        "all_ok": ok,
    }
    if out_file:
        with open(out_file, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
