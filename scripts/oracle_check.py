#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/oracle_check.py [sfDir] [outDir] [skip1,skip2,...]

Reads each parquet result that graft.Verify dumped to outDir, runs the
matching oracle SQL (outDir/oracle_sql.json) in DuckDB over the same sf
tables, sorts columns by name and rows by value, and compares cell-by-cell.
Exit 0 iff every query matches.

Works on scale replicas too: a table path that is a DIRECTORY of part
files (graft.ScaleData's layout) is globbed. The optional third arg
skips named queries (for replica-scale runs where a recursive-CTE
oracle would take DuckDB hours — skips are reported, not silently
dropped). Set ORACLE_JSON=<path> to also dump a machine-readable
per-query verdict artifact. Set ORACLE_TIMEOUT_S=<sec> to bound each
oracle SQL with a watchdog (duckdb interrupt): a query whose oracle
exceeds the budget is reported as TIMEOUT (named, like a skip) rather
than stalling the whole replica-scale gate. Timeouts are NAMED in the artifact and —
unless listed in ORACLE_TIMEOUT_OK (comma-separated, like the skip
list) — fail the gate, so raising query cost can't silently shrink
coverage.
"""
import json, math, sys, glob, os, threading

import duckdb
import pyarrow.types as pt

TIMEOUT_S = float(os.environ.get("ORACLE_TIMEOUT_S", "0") or 0)
TIMEOUT_OK = set(s for s in os.environ.get("ORACLE_TIMEOUT_OK", "").split(",") if s)


class OracleTimeout(Exception):
    pass


def run_with_timeout(con, sql):
    """Execute oracle SQL on a fresh cursor; raise OracleTimeout past the
    budget. Each query gets its own cursor (= its own DuckDB connection
    over the shared database) so a watchdog that fires AFTER the fetch
    completed interrupts only this dead cursor, never the next query on
    the parent connection. A timeout is only classified as such when the
    raised error is DuckDB's interrupt exception — a genuine SQL error
    that happens to race the timer still surfaces as a failure."""
    cur = con.cursor()
    if not TIMEOUT_S:
        try:
            return fetch(cur.sql(sql))
        finally:
            cur.close()
    timed_out = [False]

    def kill():
        timed_out[0] = True
        cur.interrupt()

    t = threading.Timer(TIMEOUT_S, kill)
    t.start()
    try:
        return fetch(cur.sql(sql))
    except duckdb.InterruptException:
        if timed_out[0]:
            raise OracleTimeout()
        raise
    finally:
        t.cancel()
        cur.close()


def type_cat(t):
    """Arrow type -> coarse category; the driver's hash is type-sensitive
    (e.g. DuckDB HUGEINT -> pandas float64), so value equality alone is
    not enough."""
    if pt.is_integer(t):
        return f"int{t.bit_width}"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal"
    if pt.is_date(t):
        return "date"
    if pt.is_timestamp(t):
        return "timestamp"
    return str(t)


def fetch(rel):
    """One execution per query: rows, column names, and type categories
    all come from a single .arrow() materialization."""
    tbl = rel.arrow()
    cols = tbl.column_names
    rows = list(zip(*[tbl.column(i).to_pylist()
                      for i in range(tbl.num_columns)])) if cols else []
    cats = {f.name: type_cat(f.type) for f in tbl.schema}
    return cols, rows, cats

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
SKIP = set(s for s in (sys.argv[3].split(",") if len(sys.argv) > 3 else []) if s)
JSON_OUT = os.environ.get("ORACLE_JSON")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows; normalize values for compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return str(v)

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    result_dirs = sorted(d for d in glob.glob(f"{OUT}/*") if os.path.isdir(d))
    failures, passed, rows_only, timeouts = [], [], [], []
    skipped = sorted(SKIP & {os.path.basename(d) for d in result_dirs})

    for d in result_dirs:
        name = os.path.basename(d)
        if name in SKIP:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            failures.append((name, "no parquet output"))
            continue
        gcols, grows, gtypes = fetch(con.sql(f"SELECT * FROM read_parquet({files!r})"))
        if name not in oracle:
            rows_only.append((name, len(grows)))
            continue
        try:
            ecols, erows, etypes = run_with_timeout(con, oracle[name])
        except OracleTimeout:
            timeouts.append(name)
            print(f"TIME  {name}: oracle exceeded {TIMEOUT_S:.0f}s budget", flush=True)
            continue
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            failures.append((name, f"schema mismatch: spark={gc} duck={ec}"))
            continue
        if gtypes != etypes:
            diff = {k: (gtypes.get(k), etypes.get(k))
                    for k in set(gtypes) | set(etypes)
                    if gtypes.get(k) != etypes.get(k)}
            failures.append((name, f"type mismatch (spark, duck): {diff}"))
            continue
        if len(gr) != len(er):
            failures.append((name, f"row count: spark={len(gr)} duck={len(er)}"))
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        if bad:
            i, a, b = bad[0]
            failures.append((name, f"{len(bad)}/{len(gr)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}\n  cols ={gc}"))
        else:
            passed.append((name, len(gr)))

    for n, c in passed:
        print(f"PASS  {n} ({c} rows)")
    for n, c in rows_only:
        print(f"ROWS  {n} ({c} rows, no oracle)")
    for n, msg in failures:
        print(f"FAIL  {n}: {msg}")
    for n in skipped:
        print(f"SKIP  {n}: excluded by skip list")
    unexpected_timeouts = [n for n in timeouts if n not in TIMEOUT_OK]
    for n in unexpected_timeouts:
        print(f"FAIL  {n}: timed out and not in ORACLE_TIMEOUT_OK allowlist")
    # Subset mode (graft.Verify's `only` arg dumps the FULL oracle map):
    # don't flag oracle entries outside the produced result set as missing.
    if os.environ.get("ORACLE_SUBSET_ONLY"):
        missing = set()
    else:
        missing = set(oracle) - {os.path.basename(d) for d in result_dirs} - SKIP
    for n in sorted(missing):
        print(f"MISS  {n}: oracle declared but no result dir")
    print(f"\n{len(passed)} pass, {len(rows_only)} rows-only, "
          f"{len(failures)} fail, {len(missing)} missing, "
          f"{len(skipped)} skipped, {len(timeouts)} timeout")
    if JSON_OUT:
        verdicts = {}
        verdicts.update({n: {"status": "pass", "rows": c} for n, c in passed})
        verdicts.update({n: {"status": "rows_only", "rows": c} for n, c in rows_only})
        verdicts.update({n: {"status": "fail", "detail": str(m)[:500]} for n, m in failures})
        verdicts.update({n: {"status": "skip"} for n in skipped})
        verdicts.update({n: {"status": "timeout", "budget_s": TIMEOUT_S,
                             "allowlisted": n in TIMEOUT_OK} for n in timeouts})
        verdicts.update({n: {"status": "missing"} for n in sorted(missing)})
        # graft.Verify dumps its run-env fingerprint (sha/cpus/heap/GC)
        # next to the results; carrying it into the artifact makes every
        # rung JSON self-describing (r10 verdict item 1).
        env = None
        env_path = f"{OUT}/run_env.json"
        if os.path.exists(env_path):
            env = json.load(open(env_path))
        with open(JSON_OUT, "w") as f:
            json.dump({"sf_dir": SF, "out_dir": OUT, "env": env,
                       "counts": {"pass": len(passed), "rows_only": len(rows_only),
                                  "fail": len(failures), "missing": len(missing),
                                  "skipped": len(skipped), "timeout": len(timeouts)},
                       "queries": verdicts}, f, indent=1, sort_keys=True)
        print(f"wrote {JSON_OUT}")
    sys.exit(1 if failures or missing or unexpected_timeouts else 0)


if __name__ == "__main__":
    main()
