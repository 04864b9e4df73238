"""Driver-faithful canonicalization check.

The driver's correctness gate converts both the Spark result and the DuckDB
oracle result to pandas, sorts columns by name, sorts rows, then hashes the
values. That path is TYPE-SENSITIVE in ways tools/oracle_check.py (which
normalizes Decimal/float/int to comparable forms) is not:

- DuckDB returns integer SUMs as HUGEINT, which ``.df()`` widens to
  float64/object — while Spark emits int64 → hash mismatch on identical
  values.
- DECIMAL columns come back as ``decimal.Decimal`` objects whose string
  forms keep trailing zeros ("123.40" vs 123.4) → mismatch.
- list-typed cells make ``sort_values`` raise (unhashable type) → the
  driver records an errored row.

This tool replicates that sensitivity: for every query it compares pandas
dtype KIND per column and exact per-cell ``str()`` after sorting, and flags
any list/dict cell in either frame. A query that passes here should hash
green in the driver's CORRECTNESS_r{N}.json.

Usage: python tools/driver_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(df: pd.DataFrame, side: str, problems: list[str]) -> pd.DataFrame | None:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, dict, np.ndarray))).any():
            problems.append(f"{side}: column {c!r} holds list/dict cells (driver sort crashes)")
            return None
    try:
        out = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except TypeError as ex:
        problems.append(f"{side}: sort_values raised {ex!r}")
        return None
    return out


def _kind(dtype) -> str:
    # collapse width differences the hash ignores, keep kind differences it doesn't
    return np.dtype(dtype).kind if dtype != object else "O"


def check(name: str, spark_df, sql: str, con) -> bool:
    problems: list[str] = []
    sp = spark_df.toPandas()
    op = con.sql(sql).df()
    s = _canon(sp, "spark", problems)
    o = _canon(op, "oracle", problems)
    if s is not None and o is not None:
        if list(s.columns) != list(o.columns):
            problems.append(f"SCHEMA spark={list(s.columns)} oracle={list(o.columns)}")
        elif len(s) != len(o):
            problems.append(f"ROWS spark={len(s)} oracle={len(o)}")
        else:
            for c in s.columns:
                ks, ko = _kind(s[c].dtype), _kind(o[c].dtype)
                if ks != ko:
                    problems.append(
                        f"DTYPE {c!r}: spark {s[c].dtype}({ks}) vs oracle {o[c].dtype}({ko})"
                    )
            if not problems:
                for c in s.columns:
                    a = s[c].map(lambda v: "NULL" if pd.isna(v) else str(v))
                    b = o[c].map(lambda v: "NULL" if pd.isna(v) else str(v))
                    neq = a.values != b.values
                    if neq.any():
                        i = int(np.argmax(neq))
                        problems.append(
                            f"VALUE {c!r} row {i}: spark {a.iloc[i]!r} vs oracle {b.iloc[i]!r}"
                        )
                        break
    print(f"{'OK  ' if not problems else 'FAIL'} {name} ({len(sp)} rows)")
    for p in problems:
        print(f"     {p}")
    return not problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = {a for a in sys.argv[1:] if not os.path.isdir(a)}

    import __spark_entry__ as e
    from akkastreamprocessnpmpackagedependencies_spark.session import get_spark

    spark = get_spark("driver-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, orc = e.queries(), e.oracle_sql()
    ok = bad = rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in orc:
            # rows-only path: the driver still canonicalizes (sort) the
            # Spark frame, so list cells crash even without an oracle.
            problems: list[str] = []
            df = _canon(fn(spark, sf_dir).toPandas(), "spark", problems)
            print(f"{'OK  ' if not problems else 'FAIL'} {name} (rows-only, {0 if df is None else len(df)} rows)")
            for p in problems:
                print(f"     {p}")
            rows_only += 1
            bad += bool(problems)
            continue
        try:
            if check(name, fn(spark, sf_dir), orc[name], con):
                ok += 1
            else:
                bad += 1
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name} exception: {ex}")
            bad += 1
    print(f"\n{ok} ok, {bad} fail, {rows_only} rows-only")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
