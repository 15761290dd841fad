#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2 gate).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers each parquet table in
<sfDir> as a DuckDB view, runs each oracle SQL, loads the matching Spark
result parquet, sorts columns by name and rows by all columns, and
compares values. Dev tool only — the shipped library has no Python
dependency.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Canonicalize the dtype differences the driver's hash also tolerates
    # (verified against CORRECTNESS_r01: int width and date representation
    # hash-match; int-vs-float/HUGEINT does NOT): ints -> int64,
    # date/datetime -> datetime64[us] (incl. object columns of
    # datetime.date). Int-vs-float stays a mismatch.
    import datetime
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif dt in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
            df[c] = df[c].astype("int64")
        elif dt == "object":
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date) \
                    and not isinstance(nn.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(sql).df()
            g, e = normalize(got), normalize(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} != {len(e)}")
                n_fail += 1
                continue
            # Driver hashes the PHYSICAL output, so a value-equal int64 vs
            # HUGEINT/float64 column still hash-mismatches. Require dtype
            # equality up to the usual duckdb->pandas mappings.
            dt_bad = [
                (c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                if str(g[c].dtype) != str(e[c].dtype)]
            if dt_bad:
                print(f"FAIL {name}: dtype mismatch {dt_bad}")
                n_fail += 1
                continue
            # value compare, exact; print first mismatch
            bad = None
            for c in g.columns:
                gc, ec = g[c], e[c]
                try:
                    eq = (gc == ec) | (gc.isna() & ec.isna())
                except Exception:
                    eq = gc.astype(str) == ec.astype(str)
                if not eq.all():
                    i = int((~eq).idxmax())
                    bad = (c, i, gc.iloc[i], ec.iloc[i])
                    break
            if bad:
                c, i, gv, ev = bad
                print(f"FAIL {name}: col {c} row {i}: spark={gv!r} oracle={ev!r}")
                print(f"  spark dtypes: {dict(g.dtypes.astype(str))}")
                print(f"  oracle dtypes: {dict(e.dtypes.astype(str))}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"ERROR {name}: {ex}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
