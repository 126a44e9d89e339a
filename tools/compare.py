#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify's parquet
dumps against the DuckDB oracle SQL and compare rows/schema/values.

Usage: python3 tools/compare.py OUTDIR SFDIR [query ...]
"""
import json, sys, math

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main(outdir, sfdir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sdf = ds.dataset(f"{outdir}/{name}").to_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        # driver semantics: sort columns by name, then compare value multisets
        o_cols = sorted(odf.columns)
        s_cols = sorted(sdf.columns)
        if [c.lower() for c in o_cols] != [c.lower() for c in s_cols]:
            print(f"FAIL {name}: schema mismatch spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        # type-sensitive (round 6: the driver's schema gate failed ns-typed
        # oracle output vs µs Spark output while names and values agreed) —
        # tz stripped, unit kept; 'object' covers str/date/list indistinctly
        # so those fall through to the value compare.
        def ltype(df, c):
            dt = df[c].dtype
            u = getattr(dt, "unit", None)
            return f"datetime64[{u}]" if u else str(dt)
        mism = {c: (ltype(sdf, c), ltype(odf, c)) for c in o_cols
                if ltype(sdf, c) != ltype(odf, c)
                and "object" not in (ltype(sdf, c), ltype(odf, c))}
        if mism:
            print(f"FAIL {name}: dtype mismatch {mism}")
            n_fail += 1
            continue
        orows = sorted(tuple(norm(v) for v in r) for r in odf[o_cols].itertuples(index=False))
        srows = sorted(tuple(norm(v) for v in r) for r in sdf[s_cols].itertuples(index=False))
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        if orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  oracle: {orows[bad]}")
            print(f"  spark : {srows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
