#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet,
and compares: row count, column names, and values (exact, after sorting
columns by name and rows by all columns). Reports per-query PASS/FAIL.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def logical_types(df: pd.DataFrame) -> dict:
    """Column → dtype string, tz stripped but UNIT KEPT: the driver's gate
    is unit-sensitive (round 6: ns-typed DuckDB output vs µs Spark output
    failed schema_match while values agreed), so datetime64[ns] vs
    datetime64[us] must be a mismatch here too."""
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
    # normalize datetimes to ns, strip tz
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
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        tg, te = logical_types(got), logical_types(exp)
        mism = {c: (tg[c], te[c]) for c in tg
                if c in te and tg[c] != te[c]
                # object covers str/date/list indistinctly; values catch those
                and "object" not in (tg[c], te[c])}
        if mism:
            print(f"FAIL {name}: dtype mismatch {mism}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError:
            # retry with tolerance to distinguish FP jitter from real bugs
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              rtol=1e-9, atol=1e-9)
                print(f"NEAR {name}: values equal only within 1e-9 "
                      f"(FP jitter — driver hash may still fail)")
                n_fail += 1
            except AssertionError as e2:
                msg = str(e2).splitlines()
                print(f"FAIL {name}: value mismatch: " + " | ".join(msg[:6]))
                n_fail += 1
    # Golden-schema drift report: Verify dumps every query's emitted Spark
    # schema; diffing against the committed golden turns a testdata
    # regeneration (round 6: events µs→ns) into a visible, reviewable
    # change instead of a silently red round.
    import os
    golden_path = os.path.join(os.path.dirname(__file__), "schema_golden.json")
    schemas_path = f"{out_dir}/schemas.json"
    if os.path.exists(golden_path) and os.path.exists(schemas_path):
        golden = json.load(open(golden_path))
        current = json.load(open(schemas_path))
        drift = {k: (golden.get(k), current.get(k))
                 for k in set(golden) & set(current)
                 if golden[k] != current[k]}
        # A golden entry absent from the current dump means the query
        # errored or an input table vanished — as much a drift signal as
        # a type change (verify-only partial runs excepted).
        absent = sorted(set(golden) - set(current))
        if drift:
            print(f"\nSCHEMA DRIFT vs tools/schema_golden.json "
                  f"({len(drift)} queries):")
            for k, (g, c) in sorted(drift.items()):
                print(f"  {k}: golden={g} current={c}")
        else:
            print(f"\nschema golden: OK "
                  f"({len(set(golden) & set(current))} queries compared)")
        if absent:
            print(f"schema golden: {len(absent)} entries ABSENT from this "
                  f"dump: {', '.join(absent[:10])}"
                  + (" …" if len(absent) > 10 else ""))
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracle)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
