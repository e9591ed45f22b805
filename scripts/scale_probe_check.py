#!/usr/bin/env python3
"""Invariant gate for the no-oracle dedup/ANN scale probe (r12 verdict
item 1). DuckDB cannot replay these pipelines past sf1, so above it the
row counts are gated against LAWS derived from the committed oracle
artifacts, plus the in-Spark postconditions and execution-shape checks
the probe JSONs carry.

Laws (factor F = replicas of sf0.1, jitter mode):

  quadratic  p(F) = A*F + B*F*(F-1)/2      pair queries: the replica
             makes every base item a near-dup of its F-1 jitter twins,
             so TRUE pair counts are quadratic in F by construction.
             The F=100 gate fits (A, B) through the committed F=10
             count (CORRECTNESS_sf1j_r11_full, oracle-verified) and the
             probe's own F=30 count — the F=1 point has no cross-replica
             term at all (slice-only pairs), so a {1,10} fit
             extrapolates curvature it never saw (d3 deviates 3.4%
             already at F=30). The {1,10} fit is still computed and
             reported at F=30 as the independent two-committed-points
             validation (gate: within 5%).

  affine     r(F) = a*F + c                 group/node-count queries:
             per-replica structure repeats exactly (a), plus one
             constant cross-replica family (c) — the +200000
             stripped-suffix docs are IDENTICAL across replicas, so
             their groups appear once, not per replica. (a, c) fit
             through F=10 (committed) and F=30 (probe), gate F=100.

  exact      r(10*F) = 10*r(F)              d4 (maxDf cap drops every
             interior shingle once F > 50, leaving only rep-local
             suffix shingles: replicas are isomorphic and disjoint),
             d12/v6/v8 (one row per doc/vector), and the
             constant-output v queries (fixed query/centroid sets).

Execution-shape gates (every probe run): straggler_max <= 4.0 on stages
with >= 8 tasks and median >= 0.5 s, failed_tasks == 0, every
postcondition true. Spill bytes are reported, not gated (bounded spill
is healthy at these sizes; failure is not).

Usage: scale_probe_check.py <out.json> <probe.json> [probe.json ...]
"""
import json
import sys

# Committed oracle-verified counts: F=1 = CORRECTNESS_sf01_r11.json,
# F=10 = CORRECTNESS_sf1j_r11_full.json (both 246/246 green).
P1 = {"d2_minhash_lsh": 15884, "d3_simhash": 26929,
      "d5a_neardup_adaptive": 877, "d5_embedding_neardup": 878}
P10 = {"d2_minhash_lsh": 1828258, "d3_simhash": 2614939,
       "d5a_neardup_adaptive": 179005, "d5_embedding_neardup": 177705,
       "d1_exact_dedup": 11070, "d1b_dedup_apply": 50920,
       "d6_dup_clusters": 59650, "d7_embedding_clusters": 20000,
       "d12_novelty": 60000}

QUAD = ["d2_minhash_lsh", "d3_simhash", "d5a_neardup_adaptive"]
AFFINE = ["d1_exact_dedup", "d1b_dedup_apply", "d6_dup_clusters"]
EXACT_LINEAR = ["d4_ngram_jaccard", "d12_novelty", "v6_quantize"]
# v8 codes every vector EXCEPT the 8 sub-centroid ids into 4 subcodes:
# rows = 4*(2000*F - 8), so r(1000) != 10*r(100) by exactly 288.
V8_FORM = lambda f: 4 * (2000 * f - 8)
CONST = ["v1_knn_brute", "v2_ivf_assign", "v4_ivf_search", "v5_centroid_update",
         "v7_kmeans2", "v9_pq_search", "v10_recall_eval", "v11_cluster_purity"]
QUAD_TOL, AFFINE_TOL = 0.05, 0.02


def quad_pred(q, f):
    a = P1[q]
    b = (P10[q] - 10 * a) / 45.0
    return a * f + b * f * (f - 1) / 2.0


def main():
    out_file, probes = sys.argv[1], sys.argv[2:]
    by_factor = {}   # factor -> {query: record}
    envs, posts = [], {}
    for p in probes:
        with open(p) as fh:
            j = json.load(fh)
        f = j["factor"]
        by_factor.setdefault(f, {}).update(j["queries"])
        for k, v in j.get("postconditions", {}).items():
            posts[f"F{f}:{k}"] = v
        envs.append({"file": p, "factor": f, "reps": j["reps"],
                     "sf_dir": j["sf_dir"], "env": j["env"]})

    gates = []
    def gate(name, ok, detail):
        gates.append({"gate": name, "ok": bool(ok), "detail": detail})

    def rows(f, q):
        return by_factor.get(f, {}).get(q, {}).get("rows")

    # 0. every probed record must have COMPLETED: a record carrying an
    # 'error' key or the rows=-1 failure sentinel is a failing gate, not
    # a silent skip — otherwise a driver-side failure with zero failed
    # tasks (analysis error, driver OOM) lets the law gates 'continue'
    # past it and const-family checks pass on -1 == -1, yielding an
    # all-green artifact for a run that computed nothing.
    for f, qs in sorted(by_factor.items()):
        for q, rec in sorted(qs.items()):
            err = rec.get("error")
            ok = err is None and rec.get("rows", -1) >= 0
            gate(f"completed:{q}@F{f}", ok,
                 f"rows={rec.get('rows')}" +
                 (f" error={err}" if err is not None else ""))

    # 1a. quadratic law, committed-points validation at F=30 ({1,10} fit)
    for q in QUAD:
        obs = rows(30, q)
        if obs is None:
            continue
        pred = quad_pred(q, 30)
        err = abs(obs - pred) / pred
        gate(f"quad_law_committed:{q}@F30", err <= QUAD_TOL,
             f"obs={obs} pred={pred:.0f} rel_err={err:.4f} tol={QUAD_TOL}")
    # 1b. quadratic law gate above F=30 ({10,30} fit — both points
    # inside the cross-replica regime). Each query gates at whatever
    # factor(s) it was probed at: the answer/candidate volume caps a
    # query's feasible factor on this box (d5a's candidate stream
    # exhausts spill disk at F=100; it gates at F=50).
    for q in QUAD:
        r30 = rows(30, q)
        if r30 is None:
            continue
        b = (r30 - 3 * P10[q]) / 300.0
        a = (P10[q] - 45 * b) / 10.0
        for f in sorted(by_factor):
            if f <= 30:
                continue
            obs = rows(f, q)
            if obs is None or obs < 0:
                continue
            pred = a * f + b * f * (f - 1) / 2.0
            err = abs(obs - pred) / pred
            gate(f"quad_law:{q}@F{f}", err <= 0.03,
                 f"obs={obs} pred={pred:.0f} (a={a:.0f} b={b:.1f}) "
                 f"rel_err={err:.4f} tol=0.03")

    # 2. affine law: fit (F=10 committed, F=30 probe), gate every
    # probed factor above 30 (empirically the fit is EXACT at F=100
    # and F=1000 for d1/d1b — the per-replica + constant-cross-family
    # decomposition is the true generative structure, not a model)
    for q in AFFINE:
        r30 = rows(30, q)
        if r30 is None:
            continue
        a = (r30 - P10[q]) / 20.0
        c = P10[q] - 10 * a
        for f in sorted(by_factor):
            if f <= 30:
                continue
            obs = rows(f, q)
            if obs is None or obs < 0:
                continue
            pred = a * f + c
            err = abs(obs - pred) / pred
            gate(f"affine_law:{q}@F{f}", err <= AFFINE_TOL,
                 f"obs={obs} pred={pred:.0f} (a={a:.1f} c={c:.0f}) "
                 f"rel_err={err:.4f} tol={AFFINE_TOL}")

    # 3. exact 10x between F=100 and F=1000 (rows must be REAL counts:
    # the -1 failure sentinel satisfies -1 == 10*-1 never, but guard
    # >= 0 explicitly so a sentinel can't sneak through any identity)
    for q in EXACT_LINEAR:
        r100, r1000 = rows(100, q), rows(1000, q)
        if r100 is None or r1000 is None:
            continue
        gate(f"exact_10x:{q}", r100 >= 0 and r1000 == 10 * r100,
             f"rows@100={r100} rows@1000={r1000}")

    # 3b. v8's closed form at every probed factor
    for f, qs in sorted(by_factor.items()):
        r = qs.get("v8_pq_codes", {}).get("rows")
        if r is not None and r >= 0:
            gate(f"closed_form:v8_pq_codes@F{f}", r == V8_FORM(f),
                 f"rows={r} expected 4*(2000*{f}-8)={V8_FORM(f)}")

    # 4. constant-output v queries: equal at F=100 and F=1000 — and
    # NON-NEGATIVE, so a query that failed at both factors (rows=-1
    # twice) cannot pass on -1 == -1
    for q in CONST:
        r100, r1000 = rows(100, q), rows(1000, q)
        if r100 is None or r1000 is None:
            continue
        gate(f"const_rows:{q}", r100 >= 0 and r100 == r1000,
             f"rows@100={r100} rows@1000={r1000}")
    # v3 is a <=256-bucket histogram: occupied buckets may only grow
    r100, r1000 = rows(100, "v3_lsh_buckets"), rows(1000, "v3_lsh_buckets")
    if r100 is not None and r1000 is not None:
        gate("v3_bucket_histogram", 0 <= r100 <= r1000 <= 256,
             f"rows@100={r100} rows@1000={r1000} (cap 256)")

    # 5. wall linearity F=100 -> F=1000 (10x rows => <= 15x wall).
    # True median from the walls array: the harness's wall_median field
    # takes the UPPER middle for even rep counts, which would bias a
    # 2-rep run's ratio high.
    def med(rec):
        ws = sorted(rec.get("walls", []))
        if not ws:
            return None
        n = len(ws)
        return ws[n // 2] if n % 2 else (ws[n // 2 - 1] + ws[n // 2]) / 2.0
    for q, rec in sorted(by_factor.get(1000, {}).items()):
        w100 = med(by_factor.get(100, {}).get(q, {}))
        w1000 = med(rec)
        if not w100 or not w1000:
            continue
        ratio = w1000 / w100
        gate(f"wall_linear:{q}", ratio <= 15.0,
             f"wall@100={w100:.2f}s wall@1000={w1000:.2f}s ratio={ratio:.1f} (<=15)")

    # 6. execution shape, every run
    for f, qs in sorted(by_factor.items()):
        for q, rec in sorted(qs.items()):
            gate(f"no_straggler:{q}@F{f}", rec["straggler_max"] <= 4.0,
                 f"max/median={rec['straggler_max']:.2f} "
                 f"stage={rec['straggler_stage']} (qualifying stages only)")
            gate(f"no_failed_tasks:{q}@F{f}", rec["failed_tasks"] == 0,
                 f"failed={rec['failed_tasks']} of {rec['n_tasks']}")

    # 7. in-Spark postconditions
    for k, v in sorted(posts.items()):
        gate(f"postcondition:{k}", str(v).startswith("true"), v)

    # 8. provenance: every consumed probe JSON must come from the SAME
    # committed engine sha — a gates artifact summarizing runs of two
    # different engines (or of a dirty tree) is not evidence of
    # anything. The summary then carries its own env block (the
    # self-describing-artifact rule every other bench JSON follows)
    # instead of delegating provenance to the files underneath it.
    shas = sorted({e["env"].get("sha", "unknown") for e in envs})
    dirties = sorted({bool(e["env"].get("git_dirty", True)) for e in envs})
    gate("env_single_sha", len(shas) == 1, f"shas={shas}")
    gate("env_clean_tree", dirties == [False], f"git_dirty values={dirties}")
    env_block = {
        "sha": shas[0] if len(shas) == 1 else "MIXED:" + ",".join(shas),
        "git_dirty": dirties != [False],
        "source_runs": len(envs),
    }

    n_fail = sum(1 for g in gates if not g["ok"])
    artifact = {
        "metric": "sf100_dedup_probe_gates",
        "value": n_fail,
        "unit": "failed_gates",
        "factors": {str(f): sorted(qs) for f, qs in sorted(by_factor.items())},
        "gates": gates,
        "runs": envs,
        "env": env_block,
        "all_ok": n_fail == 0,
    }
    with open(out_file, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"all_ok": n_fail == 0, "failed": n_fail,
                      "total": len(gates)}))
    for g in gates:
        if not g["ok"]:
            print(f"FAIL {g['gate']}: {g['detail']}")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
