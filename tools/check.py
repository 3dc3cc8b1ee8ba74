#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

For each query result parquet under <verifyOutDir>/<name>/ and the
matching SQL in <verifyOutDir>/oracle_sql.json, run the SQL in DuckDB
(tables = parquet files in <sfDir> registered as views by name), sort
columns by name, sort rows, and compare cell-by-cell (exact — floats
must match bit-for-bit after both sides' rounding).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_result(path):
    con = duckdb.connect()
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    df = con.sql(f"select * from read_parquet({files!r})").df()
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        got = load_result(os.path.join(out_dir, name))
        if got is None:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check: {len(got)} rows)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        g = g.sort_values(by=list(g.columns), ignore_index=True)
        e = e.sort_values(by=list(e.columns), ignore_index=True)
        diff = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            # the driver's hash is TYPE-sensitive: DuckDB HUGEINT/DECIMAL
            # landing in pandas as float64/object vs Spark's int64 hashes
            # differently even when every value is equal (the r2 SUM(int)
            # bug, and again pack_sequences in r3). int32-vs-int64 is the
            # only width difference the driver tolerates.
            gt, et = str(gv.dtype), str(ev.dtype)
            if gt != et and not (gt.startswith("int") and et.startswith("int")):
                diff.append(f"col {c}: DTYPE got={gt} exp={et} "
                            f"(driver hash will mismatch; CAST the oracle)")
            try:
                import pandas as pd
                eq = (gv == ev) | (gv.isna() & ev.isna())
                # normalize numeric dtype mismatches (int32 vs int64 ok)
                if not eq.all():
                    if str(gv.dtype).startswith(("float", "int")) and \
                       str(ev.dtype).startswith(("float", "int")):
                        eq = (gv.astype("float64") == ev.astype("float64")) | \
                             (gv.isna() & ev.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    diff.append(f"col {c} row {i}: got={gv[i]!r} exp={ev[i]!r} "
                                f"(+{int((~eq).sum())-1} more)")
            except Exception as ex:
                diff.append(f"col {c}: compare error {ex}")
        if diff:
            print(f"FAIL {name}: " + "; ".join(diff)); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(names)-n_pass-n_fail} skipped/other ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
