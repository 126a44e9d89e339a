#!/usr/bin/env python3
"""Hash-verified correctness at 100x (VERDICT r18 ask 1): replay the
DuckDB oracle over the SCALE lake against graft.ScaleVerify's parquet
dumps, with a per-query timeout and a memory ceiling — some oracle SQL
(LSH band self-joins, shingle explosions) is written for sf0.01 and is
DuckDB-infeasible at 100x; those must surface as ORACLE-INFEASIBLE, not
hang the gate or silently pass.

Comparison semantics are tools/check.py's exactly (sorted columns,
sorted rows, exact values, dtype unit-sensitive); only the harness
around them differs (interrupt timer, resource-error classing, JSON
summary for SCALE.md).

Usage: python3 tools/scale_check.py SFDIR OUTDIR [--timeout SEC]
           [--memory GB] [--summary PATH] [--subproc] [query ...]

--subproc runs each query in its own child process with a hard kill at
timeout+grace: duckdb's con.interrupt() is advisory — a 20-core hash
join can ignore it for minutes (observed on the q161 oracle at 100x) —
and only SIGKILL bounds the gate's wall-clock for real.
"""
import json
import subprocess
import sys
import threading
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def logical_types(df: pd.DataFrame) -> dict:
    out = {}
    for c in df.columns:
        dt = df[c].dtype
        if isinstance(dt, pd.DatetimeTZDtype):
            out[c] = f"datetime64[{dt.unit}]"
        else:
            out[c] = str(dt)
    return out


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object and df[c].map(
                lambda v: hasattr(v, "year") or v is None).all():
            df[c] = pd.to_datetime(df[c])
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    args = sys.argv[1:]
    timeout_s, memory_gb, summary_path, subproc = 120.0, 48, None, False
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--timeout":
            timeout_s = float(args[i + 1]); i += 2
        elif args[i] == "--memory":
            memory_gb = int(args[i + 1]); i += 2
        elif args[i] == "--summary":
            summary_path = args[i + 1]; i += 2
        elif args[i] == "--subproc":
            subproc = True; i += 1
        else:
            pos.append(args[i]); i += 1
    sf_dir, out_dir, only = pos[0], pos[1], pos[2:]

    if subproc:
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
        names = sorted(n for n in oracle
                       if not only or any(n.startswith(o) for o in only))
        results = {}
        for name in names:
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, __file__, sf_dir, out_dir,
                     "--timeout", str(timeout_s), "--memory", str(memory_gb),
                     name],
                    capture_output=True, text=True, timeout=timeout_s + 90)
                line = next((l for l in r.stdout.splitlines()
                             if l.split(" ", 1)[0].isupper()), None)
                if line:
                    print(line, flush=True)
                    st, _, detail = line.partition(" ")
                    detail = detail.partition(": ")[2]
                    results[name] = {"status": st, "detail": detail,
                                     "oracle_sec": round(time.time() - t0, 1)}
                else:
                    st = "ORACLE-ERROR"
                    detail = (r.stderr.strip().splitlines() or ["no output"])[-1]
                    print(f"{st} {name}: {detail}", flush=True)
                    results[name] = {"status": st, "detail": detail,
                                     "oracle_sec": round(time.time() - t0, 1)}
            except subprocess.TimeoutExpired:
                print(f"ORACLE-INFEASIBLE {name}: killed at "
                      f"{timeout_s + 90:.0f}s wall", flush=True)
                results[name] = {"status": "ORACLE-INFEASIBLE",
                                 "detail": f"killed at {timeout_s + 90:.0f}s",
                                 "oracle_sec": round(time.time() - t0, 1)}
        counts = {}
        for r in results.values():
            counts[r["status"]] = counts.get(r["status"], 0) + 1
        print("\nSCALE CHECK SUMMARY: " +
              "  ".join(f"{k}={v}" for k, v in sorted(counts.items())) +
              f"  of {len(results)} compared / {len(oracle)} oracles")
        if summary_path:
            with open(summary_path, "w") as f:
                json.dump({"counts": counts, "timeout_s": timeout_s,
                           "memory_gb": memory_gb, "queries": results}, f,
                          indent=1, sort_keys=True)
        bad = counts.get("FAIL", 0) + counts.get("NO-SPARK-OUTPUT", 0)
        sys.exit(1 if bad else 0)

    con = duckdb.connect()
    con.execute(f"SET memory_limit='{memory_gb}GB'")
    con.execute("SET preserve_insertion_order=false")
    import os
    for t in TABLES:
        # ScaleLake writes Spark-style DIRECTORIES (t.parquet/part-*);
        # the driver's testdata is single files — accept both
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    results = {}  # name -> (status, detail, oracle_sec)

    def record(name, status, detail="", secs=0.0):
        results[name] = {"status": status, "detail": detail,
                         "oracle_sec": round(secs, 1)}
        print(f"{status} {name}" + (f": {detail}" if detail else "")
              + (f" [{secs:.1f}s oracle]" if secs >= 1 else ""),
              flush=True)

    for name, sql in sorted(oracle.items()):
        if only and not any(name.startswith(o) for o in only):
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            record(name, "NO-SPARK-OUTPUT", str(e).splitlines()[0])
            continue
        # interrupt the oracle rather than hang the gate: the timer fires
        # con.interrupt(), the execute raises, and the connection stays
        # usable for the next query
        timer = threading.Timer(timeout_s, con.interrupt)
        t0 = time.time()
        try:
            timer.start()
            exp = con.sql(sql).df()
        except duckdb.OutOfMemoryException as e:
            record(name, "ORACLE-INFEASIBLE",
                   f"memory>{memory_gb}GB", time.time() - t0)
            continue
        except (duckdb.InterruptException, RuntimeError) as e:
            if "INTERRUPT" in str(e).upper() or isinstance(
                    e, duckdb.InterruptException):
                record(name, "ORACLE-INFEASIBLE",
                       f"timeout>{timeout_s:.0f}s", time.time() - t0)
            else:
                record(name, "ORACLE-ERROR", str(e).splitlines()[0],
                       time.time() - t0)
            continue
        except Exception as e:
            record(name, "ORACLE-ERROR", str(e).splitlines()[0],
                   time.time() - t0)
            continue
        finally:
            timer.cancel()
        oracle_sec = time.time() - t0
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            record(name, "FAIL",
                   f"columns spark={list(g.columns)} duck={list(e.columns)}",
                   oracle_sec)
            continue
        tg, te = logical_types(got), logical_types(exp)
        mism = {c: (tg[c], te[c]) for c in tg
                if c in te and tg[c] != te[c]
                and "object" not in (tg[c], te[c])}
        if mism:
            record(name, "FAIL", f"dtype mismatch {mism}", oracle_sec)
            continue
        if len(g) != len(e):
            record(name, "FAIL", f"rows spark={len(g)} duck={len(e)}",
                   oracle_sec)
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            record(name, "PASS", f"{len(g)} rows", oracle_sec)
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              rtol=1e-9, atol=1e-9)
                record(name, "NEAR", "values equal only within 1e-9",
                       oracle_sec)
            except AssertionError as e2:
                record(name, "FAIL", " | ".join(str(e2).splitlines()[:6]),
                       oracle_sec)

    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    print("\nSCALE CHECK SUMMARY: " +
          "  ".join(f"{k}={v}" for k, v in sorted(counts.items())) +
          f"  of {len(results)} compared / {len(oracle)} oracles")
    if summary_path:
        with open(summary_path, "w") as f:
            json.dump({"counts": counts, "timeout_s": timeout_s,
                       "memory_gb": memory_gb, "queries": results}, f,
                      indent=1, sort_keys=True)
    bad = counts.get("FAIL", 0) + counts.get("NO-SPARK-OUTPUT", 0)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
