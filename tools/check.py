#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonArtifactOut]

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, runs each oracle SQL, and compares against the Spark result
parquet in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted by
all columns, values compared exactly (timestamps normalized to microseconds).

With a third arg, also writes a CORRECTNESS-format JSON artifact
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) — used to stamp the materialized-tier correctness pass
(CORRECTNESS_10X) in the same shape the round driver emits.
"""
import sys, json, glob, os, re
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              type(v).__name__ == "ndarray" else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir, out_dir, json_out=None, only=None, exclude=None,
         staged=False):
    staged_deps = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (MakeTier tiers): a
            p = f"{p}/*.parquet"  # directory of part files, not one file
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    # a trailing '$' makes a filter pattern exact-match instead of
    # substring (q_multisignal_dedup$ excludes the N^2 baseline without
    # also excluding its q_multisignal_dedup_lsh scale twin)
    def matches(pat, name):
        return name == pat[:-1] if pat.endswith("$") else pat in name

    if staged:
        # Stage-decomposed mode (the materialized-tier gate for composed
        # pipelines whose monolithic oracle exceeds the sandbox disk):
        # register every Spark dump as a dump_<name> view, then override
        # the oracle SQL with the staged variant where one exists. A
        # staged oracle verifies its query's transformation against the
        # PREDECESSOR stage's dump, which this same run hash-verifies —
        # chain of trust is inductive from the base-table-anchored stage 1.
        for d in sorted(glob.glob(f"{out_dir}/*/")):
            name = os.path.basename(d.rstrip("/"))
            if glob.glob(f"{d}/*.parquet"):
                con.execute(f"CREATE VIEW dump_{name} AS "
                            f"SELECT * FROM read_parquet('{d}/*.parquet')")
        staged_sql = json.load(open(f"{out_dir}/oracle_sql_staged.json"))
        for k, v in staged_sql.items():
            if k in oracle:
                oracle[k] = v
                # chain of trust: record which dumps this staged oracle
                # trusts — each must hash-verify IN THIS RUN before the
                # dependent runs, or the inductive chain is broken (a
                # --only filter or a stale out_dir would otherwise let a
                # stage PASS against an unverified predecessor dump)
                staged_deps[k] = sorted(
                    set(re.findall(r"\bdump_([A-Za-z0-9_]+)", v)))
                print(f"[staged] {k}: using stage-decomposed oracle"
                      + (f" (trusts: {', '.join(staged_deps[k])})"
                         if staged_deps[k] else ""))
    if only:
        pats = only.split(",")
        oracle = {k: v for k, v in oracle.items()
                  if any(matches(p, k) for p in pats)}
    if exclude:
        pats = exclude.split(",")
        oracle = {k: v for k, v in oracle.items()
                  if not any(matches(p, k) for p in pats)}
    n_pass = n_fail = 0
    artifact = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        artifact[name] = {"rows_match": rows_match, "schema_match": schema_match,
                          "hash_match": hash_match, "spark_rows": spark_rows,
                          "oracle_rows": oracle_rows, "err": err}
        # write-through after EVERY query (the Bench r6 lesson, relearned
        # here when a 75 GB oracle spill got the checker killed 73 passes
        # into a tier run and the artifact held nothing): a killed run
        # keeps everything it verified
        if json_out:
            with open(json_out, "w") as f:
                json.dump(artifact, f, indent=1)

    # run order: predecessors before dependents, so a staged oracle only
    # ever consults dumps this run has ALREADY hash-verified (plain
    # sorted order would verify q_funnel_stage_containment against the
    # neardup dump before neardup itself was checked)
    ordered, seen = [], set()

    def visit(n, stack=()):
        if n in seen or n in stack:
            return
        for d in staged_deps.get(n, []):
            if d in oracle:
                visit(d, stack + (n,))
        seen.add(n)
        ordered.append(n)

    for n in sorted(oracle):
        visit(n)

    for name in ordered:
        sql = oracle[name]
        # staged-dep gate (inductive chain of trust): every dump the
        # staged oracle reads must have hash-verified in THIS run — a
        # dep filtered out by --only/--exclude, or one that failed, or a
        # dump left by some earlier Verify with no matching verification
        # here, invalidates the dependent's pass
        bad_deps = [d for d in staged_deps.get(name, [])
                    if not artifact.get(d, {}).get("hash_match")]
        if bad_deps:
            print(f"FAIL {name}: staged deps unverified this run: "
                  + ", ".join(bad_deps)); n_fail += 1
            record(name, False, False, False, None, None,
                   "staged dep unverified: " + ",".join(bad_deps))
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            record(name, False, False, False, 0, None, "no spark output")
            continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
            record(name, False, False, False, None, None,
                   f"{type(e).__name__}: {e}")
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            record(name, len(got) == len(want), False, False,
                   len(got), len(want), "schema mismatch")
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1
            record(name, False, True, False, len(got), len(want), "row count")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            record(name, True, True, True, len(got), len(want), None)
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: " + " | ".join(msg[:3])); n_fail += 1
            record(name, True, True, False, len(got), len(want),
                   " | ".join(msg[:2]))
    # queries without oracle: rows-only check (skipped under a name
    # filter — every filtered-out dump would false-fail as oracle-less)
    for d in (sorted(glob.glob(f"{out_dir}/*/")) if not (only or exclude) else []):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        nrows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        status = "PASS" if nrows > 0 else "FAIL"
        print(f"{status} {name} (rows-only: {nrows})")
        if nrows > 0: n_pass += 1
        else: n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"artifact -> {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("json_out", nargs="?", default=None)
    ap.add_argument("--only", help="comma-separated name substrings to run")
    ap.add_argument("--exclude", help="comma-separated name substrings to skip")
    ap.add_argument("--staged", action="store_true",
                    help="override oracles with oracle_sql_staged.json and "
                         "register dump_<name> views over the Spark dumps")
    a = ap.parse_args()
    sys.exit(main(a.sf_dir, a.out_dir, a.json_out, a.only, a.exclude, a.staged))
