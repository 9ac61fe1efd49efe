"""Mimic the driver's correctness gate: run each __spark_entry__
query on Spark AND its oracle SQL on DuckDB at sf0.01; compare row
count, sorted column names, and an order-insensitive value multiset.

Usage: python scripts/selfcheck.py [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    # Decimal is NOT collapsed to float: the driver's value hash sees
    # Decimal('3') != 3, so selfcheck must too (round-2 lesson — the
    # events_sessionize oracle emitted a HUGEINT/decimal128 window sum
    # that selfcheck's old float collapse masked).
    if isinstance(v, decimal.Decimal):
        return "decimal:" + str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from rustac_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("selfcheck", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            # decimal outputs are banned: Spark widens decimal sums to
            # (28,6) and DuckDB to (38,6), and the driver's value hash
            # sees different representations (round-1 lesson: 5 queries
            # failed hash on exactly this). Emit strings/doubles instead.
            from pyspark.sql.types import DecimalType
            decs = [f.name for f in df.schema.fields
                    if isinstance(f.dataType, DecimalType)]
            if decs:
                print(f"FAIL  {name}: DecimalType output columns {decs} "
                      f"(driver hash will mismatch — cast to string)")
                n_fail += 1
                continue
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (no oracle) [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if not problems:
            a = multiset(rows, cols)
            b = multiset(orows, ocols)
            if a != b:
                diff_a = {k: c for k, c in a.items() if b.get(k) != c}
                diff_b = {k: c for k, c in b.items() if a.get(k) != c}
                ex_a = list(diff_a.items())[:2]
                ex_b = list(diff_b.items())[:2]
                problems.append(
                    f"values differ ({len(diff_a)}/{len(diff_b)} rows): "
                    f"spark={ex_a} oracle={ex_b}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(rows)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
