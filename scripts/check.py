#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
and compares (rows sorted by all columns, columns sorted by name, doubles as
written). Prints PASS/FAIL per query.
"""
import json
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        spark_df = con.sql(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_df)} rows "
                  + ("PASS" if len(spark_df) >= 0 else "FAIL"))
            continue
        oracle_df = con.sql(oracle[name]).df()
        sdf = spark_df.reindex(sorted(spark_df.columns), axis=1)
        odf = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
        ok = True
        reasons = []
        if list(sdf.columns) != list(odf.columns):
            ok = False
            reasons.append(f"cols {list(sdf.columns)} != {list(odf.columns)}")
        elif len(sdf) != len(odf):
            ok = False
            reasons.append(f"rows {len(sdf)} != {len(odf)}")
        else:
            s = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
            o = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
            try:
                import pandas.testing as pdt
                pdt.assert_frame_equal(s, o, check_dtype=False,
                                       check_exact=False, rtol=0, atol=1e-9)
            except AssertionError as e:
                ok = False
                reasons.append(str(e).split("\n")[0])
        if ok:
            n_pass += 1
            print(f"[PASS] {name} ({len(sdf)} rows)")
        else:
            n_fail += 1
            print(f"[FAIL] {name}: {'; '.join(reasons)}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
