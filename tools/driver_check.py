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
       python tools/driver_check.py --staleness

``--staleness`` enforces the evidence-rotation invariant: every query whose
defining module changed (committed OR uncommitted) since the latest
CORRECTNESS_r{N}.json was recorded must sit inside the driver's 50-entry
check window, or its green row is stale evidence.
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


DRIVER_WINDOW = 50  # the driver checks exactly the first 50 queries() entries


def _git_commit_ts(repo: str, path: str) -> int | None:
    import subprocess

    out = subprocess.run(
        ["git", "-C", repo, "log", "-1", "--format=%ct", "--", path],
        capture_output=True,
        text=True,
    ).stdout.strip()
    return int(out) if out else None


def _git_dirty(repo: str, path: str) -> bool:
    import subprocess

    return bool(
        subprocess.run(
            ["git", "-C", repo, "status", "--porcelain", "--", path],
            capture_output=True,
            text=True,
        ).stdout.strip()
    )


def staleness() -> None:
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recorded = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not recorded:
        print("no CORRECTNESS_r*.json yet; nothing to be stale against")
        sys.exit(0)
    base = os.path.relpath(recorded[-1], repo)
    base_ts = _git_commit_ts(repo, base)
    if base_ts is None:
        print(f"{base} not committed; cannot anchor staleness check")
        sys.exit(2)

    import __spark_entry__ as e

    names = list(e.queries().keys())
    window = set(names[:DRIVER_WINDOW])
    mod_files: dict[str, str] = {}
    for name, fn in e.queries().items():
        f = sys.modules[fn.__module__].__file__
        mod_files[name] = os.path.relpath(f, repo)
    changed_cache: dict[str, bool] = {}
    violations = []
    for name, rel in mod_files.items():
        if rel not in changed_cache:
            ts = _git_commit_ts(repo, rel)
            changed_cache[rel] = (
                ts is None or ts > base_ts or _git_dirty(repo, rel)
            )
        if changed_cache[rel] and name not in window:
            violations.append((name, rel))
    if violations:
        print(f"STALE: {len(violations)} queries changed since {base} but sit "
              f"outside the {DRIVER_WINDOW}-entry driver window:")
        for name, rel in violations:
            print(f"  {name} ({rel})")
        sys.exit(1)
    changed = sorted({r for r, c in changed_cache.items() if c})
    print(f"staleness ok: modules changed since {base} = {changed or 'none'}; "
          f"all their queries are inside the driver window")
    sys.exit(0)


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--staleness":
        staleness()
    sf_dir = "/root/testdata/sf0.01"
    if args and ("/" in args[0] or os.path.isdir(args[0])):
        if not os.path.isdir(args[0]):
            sys.exit(f"error: {args[0]!r} looks like a path but is not a directory")
        sf_dir = args[0]
        args = args[1:]
    only = set(args)

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
            # each query lands in exactly one summary bucket
            if problems:
                bad += 1
            else:
                rows_only += 1
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
