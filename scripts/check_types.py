#!/usr/bin/env python3
"""Oracle ↔ Spark ARROW TYPE gate: catches the mismatch class the value
check cannot see.

The driver's hash compare is TYPE-sensitive while its row compare (and
check.py's atol compare) is not: a DuckDB integer `sum()` types as HUGEINT
(int128) against Spark's BIGINT, rows match, values match, the hash fails —
this exact blind spot shipped two hash failures for three rounds. Run this
after check.py; it replays every oracle query in DuckDB and diffs the arrow
schema against the Verify parquet dump.

Tolerated (the driver normalizes these): int8/16/32 vs int64, timestamp
unit/zone differences, large_string/large_list spellings. Flagged: HUGEIT/
int128 or decimal anywhere, float32 vs float64, string vs numeric, missing
or extra columns.

Usage: python3 scripts/check_types.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import re
import sys

import duckdb
import pyarrow.parquet as pq


def norm(t: str) -> str:
    # substitutions must reach INSIDE nested types (list<item: int32> vs
    # list<element: int64> is a tolerated difference too), so normalize by
    # regex over the whole rendering, not just the top-level string
    t = (t.replace("large_string", "string")
          .replace("large_list", "list"))
    t = re.sub(r"timestamp\[[^\]]*\]", "timestamp", t)
    t = re.sub(r"\buint(8|16|32)\b", "int", t)
    t = re.sub(r"\bint(8|16|32|64)\b", "int", t)
    t = re.sub(r"\b(item|element|l):", "f:", t)  # arrow child-field names
    return t


def is_flagged(oracle_t: str, spark_t: str) -> bool:
    for bad in ("int128", "decimal"):
        if bad in oracle_t or bad in spark_t:
            return True
    return norm(oracle_t) != norm(spark_t)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    flagged = 0
    for q, sql in sorted(sqls.items()):
        try:
            oracle = con.execute(sql).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            print(f"[types] {q}: ORACLE ERROR {str(e)[:140]}")
            flagged += 1
            continue
        parts = glob.glob(f"{out_dir}/{q}/part-*.parquet")
        if not parts:
            print(f"[types] {q}: no Verify dump found")
            flagged += 1
            continue
        spark = pq.read_table(parts)
        ot = {f.name: str(f.type) for f in oracle.schema}
        st = {f.name: str(f.type) for f in spark.schema}
        if set(ot) != set(st):
            print(f"[types] {q}: column sets differ "
                  f"oracle-only={sorted(set(ot) - set(st))} "
                  f"spark-only={sorted(set(st) - set(ot))}")
            flagged += 1
            continue
        for c in sorted(ot):
            if is_flagged(ot[c], st[c]):
                print(f"[types] {q}.{c}: oracle={ot[c]} spark={st[c]}")
                flagged += 1
    print(f"{len(sqls)} oracles checked, {flagged} type flags")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
