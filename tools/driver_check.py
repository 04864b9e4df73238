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
       python tools/driver_check.py --window-budget N
       python tools/driver_check.py --evidence-update N
       python tools/driver_check.py --handoff N

``--handoff N`` is the round-end gate (round-15 verdict: the driver
measured a staged branch whose window the ledger never promised): it
FAILS unless, on this exact checkout, main is the only branch and is
clean, evidence.json's round-N stamp equals the live first-50 with
current fingerprints, staleness/budget are green, and a green full
oracle pass exists for this exact source content.

``--window-budget N`` is the mechanical slot-arithmetic gate: it FAILS
when the round-N mandatory set (pinned flagship + new + fingerprint-
changed + due must_rotate promises) exceeds the 50-entry window, or when
a mandatory query sits outside the current window ordering. Run it when
PLANNING a round — before code is written — so over-subscription is
discovered while it is still cheap to defer work.

``--staleness`` enforces the evidence-rotation invariant at PER-QUERY
granularity: every query whose evidence fingerprint (its function source +
rendered oracle SQL + referenced same-module helpers) differs from the one
recorded in ``tools/evidence.json`` — i.e. the code its last green
CORRECTNESS row was computed against — must sit inside the driver's
50-entry check window, or its green row is stale evidence. Module-level
granularity (the previous rule) forced every query in a touched file into
the window and wasted ~45 slots on unchanged queries.

``--evidence-update N`` re-records the fingerprints of the current window
queries as "will receive a round-N row" — run it (and commit the result)
when the window for round N is final, since the driver computes
CORRECTNESS_r{N}.json from the round's last commit.

``--evidence-rebase`` recomputes all recorded fingerprints in place
(rounds preserved). The prerequisite green FULL local pass is
machine-checked: a zero-failure full run writes ``.last_full_pass.json``
and the rebase refuses unless that artifact postdates every
fingerprint-relevant source (see evidence_rebase docstring).

``--must-rotate N name...`` records an enforceable rotation promise:
each named query gets ``{"must_rotate": N}``; ``--evidence-update N``
REFUSES to finalize a window that omits a query whose promise is due,
and ``--staleness`` lists outstanding promises. Use it for queries
consciously displaced from the current window so the commitment survives
as machine state, not a comment.

Known granularity limit: a behavior change reachable only through dynamic
dispatch the code object never names (e.g. mutating a dict a helper
closes over) won't move the fingerprint. Helpers referenced by name are
followed transitively across the whole repo package (including
functions/ and session.py), and rendered oracles are immune (f-strings
bake helpers into the recorded string), so in practice the fingerprint
moves with the behavior.
"""

from __future__ import annotations

import json
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


def _align_date_vs_midnight_ts(s: pd.DataFrame, o: pd.DataFrame) -> None:
    """PROVEN driver tolerance, applied in place: Spark DateType comes back
    from toPandas as object cells of ``datetime.date`` (Arrow date32 →
    object) while DuckDB DATE comes back from ``.df()`` as
    datetime64[us] midnight timestamps — and the driver's hash MATCHES
    them (ground truth: ``session_overlap_pairs`` and
    ``events_retention_cohorts`` carry hash-green CORRECTNESS_r04 rows
    with exactly this dtype pair). Without this, the replica is stricter
    than the thing it replicates and cries wolf on every DATE column.
    The normalization is deliberately narrow: only a datetime64 column
    whose every non-null value sits at midnight, paired with an object
    column whose every non-null value is a ``datetime.date``, collapses
    to date objects on both sides."""
    import datetime

    for c in s.columns:
        pair = {_kind(s[c].dtype), _kind(o[c].dtype)}
        if pair != {"M", "O"}:
            continue
        ts, dt = (s[c], o[c]) if _kind(s[c].dtype) == "M" else (o[c], s[c])
        dt_vals = dt.dropna()
        if not dt_vals.map(lambda v: type(v) is datetime.date).all():
            continue
        ts_vals = ts.dropna()
        if not (ts_vals == ts_vals.dt.normalize()).all():
            continue
        s[c] = s[c].map(lambda v: v.date() if isinstance(v, pd.Timestamp) else v)
        o[c] = o[c].map(lambda v: v.date() if isinstance(v, pd.Timestamp) else v)


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
            _align_date_vs_midnight_ts(s, o)
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
EVIDENCE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence.json")


_PKG_PREFIX = "akkastreamprocessnpmpackagedependencies_spark"


def _nested_codes(code):
    """The code object plus every code object nested in its constants —
    lambdas, comprehensions and (crucially) closure functions like the
    mapInPandas bodies, whose names the OUTER co_names never mention."""
    import types

    yield code
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            yield from _nested_codes(c)


_IMPORT_RE = None  # compiled lazily (regex fallback only)


def _import_targets(src: str):
    """Dotted module targets of every import statement in ``src``, parsed
    with ``ast`` so import-shaped lines inside docstrings/strings cannot
    leak into fingerprints (round-7 ADVICE: a doc-only edit mentioning
    'import X' at line start spuriously marked queries window-mandatory).
    Relative imports keep their leading dots so the caller's
    ``resolve_name`` path is unchanged. Falls back to the old line regex
    only when the source does not parse standalone (e.g. dedented
    fragments)."""
    import ast
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        for m in _IMPORT_RE.finditer(src):
            yield m.group(1) or m.group(2)
        return
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                yield alias.name
        elif isinstance(node, ast.ImportFrom):
            yield "." * node.level + (node.module or "")


def _local_pkg_imports(src: str, module_name: str):
    """Package modules pulled in by IMPORT STATEMENTS inside ``src`` —
    the function-LOCAL ``from ..functions.png import decode_png`` pattern
    that binds a local name the getattr-on-module walk can never resolve.
    Yields resolved module objects under the repo package. (Round-6 gap,
    found empirically: hardening functions/jpeg.py moved ZERO query
    fingerprints because every codec import is local to a mapInPandas
    closure — a behavior change the staleness gate was blind to.)"""
    global _IMPORT_RE
    import importlib
    import importlib.util
    import re

    if _IMPORT_RE is None:
        _IMPORT_RE = re.compile(
            r"^\s*(?:from\s+([.\w]+)\s+import\s|import\s+([\w.]+))", re.M
        )
    pkg = module_name.rpartition(".")[0]
    for target in _import_targets(src):
        try:
            resolved = (
                importlib.util.resolve_name(target, pkg)
                if target.startswith(".")
                else target
            )
        except (ImportError, ValueError):
            continue
        if not resolved.startswith(_PKG_PREFIX):
            continue
        try:
            yield importlib.import_module(resolved)
        except ImportError:
            continue


def _fingerprint(fn, oracle: str) -> str:
    """Evidence fingerprint of one query: function source + rendered oracle
    SQL + the source/value of every repo-package helper reachable by name
    from the function's code object, followed TRANSITIVELY (visited-set
    bounded) — so editing a shared helper in functions/text.py,
    session.py, or another operator module moves the fingerprints of
    every query whose behavior it can change, not just same-module
    callers. Scalar str/int/float and list-of-str module constants are
    hashed by value. Names are collected from the function's code object
    AND every nested code object (closures), and package modules named by
    import statements INSIDE the function body are hashed whole — the
    two dynamic-dispatch gaps that previously let a function-local
    ``from ..functions.jpeg import decode_jpeg`` hide codec changes from
    the staleness gate."""
    import hashlib
    import inspect

    parts = [oracle]
    seen: set[str] = set()
    hashed_modules: set[str] = set()
    stack = [fn]
    while stack:
        f = stack.pop()
        key = f"{f.__module__}.{f.__qualname__}"
        if key in seen:
            continue
        seen.add(key)
        try:
            src = inspect.getsource(f)
        except OSError:
            src = f.__qualname__
        parts.append(src)
        mod = sys.modules.get(f.__module__)
        names = set()
        for code in _nested_codes(f.__code__):
            names.update(code.co_names)
        for nm in sorted(names):
            v = getattr(mod, nm, None)
            if isinstance(v, str):
                parts.append(f"{nm}={v}")
            elif isinstance(v, (bool, int, float)):
                parts.append(f"{nm}={v!r}")
            elif isinstance(v, (list, tuple)) and all(isinstance(x, str) for x in v):
                parts.append(f"{nm}={list(v)}")
            elif inspect.isfunction(v) and (v.__module__ or "").startswith(_PKG_PREFIX):
                stack.append(v)
            elif inspect.ismodule(v) and (v.__name__ or "").startswith(_PKG_PREFIX):
                # attribute access through a module object (e.g. npm.parse
                # _registry): hash the whole module source — coarse but
                # safe, and cheap at this repo size
                if v.__name__ not in hashed_modules:
                    hashed_modules.add(v.__name__)
                    try:
                        parts.append(inspect.getsource(v))
                    except OSError:
                        pass
        for imod in _local_pkg_imports(src, f.__module__):
            if imod.__name__ not in hashed_modules:
                hashed_modules.add(imod.__name__)
                try:
                    parts.append(inspect.getsource(imod))
                except OSError:
                    pass
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()


def _current_fingerprints():
    import __spark_entry__ as e

    qs, orc = e.queries(), e.oracle_sql()
    names = list(qs)
    return names, {n: _fingerprint(fn, orc.get(n, "")) for n, fn in qs.items()}


def _latest_green_round(name: str, before: int) -> int | None:
    """Ground truth for a query's evidence age: the highest round r <
    ``before`` whose driver CORRECTNESS_r{r}.json holds a green (or
    documented rows-only) row for ``name``. Used when a displaced
    entry's prev_round was lost (pre-field entries, --evidence-rebase)."""
    import glob
    import re

    best = None
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        r = int(m.group(1))
        if r >= before:
            continue
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        rec = rows.get(name)
        if rec is None:
            continue
        ok = rec.get("hash_match") is True or rec.get("err") == "no_oracle"
        if ok and (best is None or r > best):
            best = r
    return best


def _load_evidence() -> dict:
    import json

    if not os.path.exists(EVIDENCE_FILE):
        return {}
    with open(EVIDENCE_FILE) as f:
        return json.load(f)


def staleness() -> None:
    names, cur = _current_fingerprints()
    recorded = _load_evidence()
    window = set(names[:DRIVER_WINDOW])
    violations = []
    for name in names:
        rec = recorded.get(name)
        if (rec is None or rec["fp"] != cur[name]) and name not in window:
            violations.append((name, "new query" if rec is None else f"changed since r{rec['round']} row"))
    promised = sorted(
        n for n, rec in recorded.items()
        if not n.startswith("_") and rec.get("must_rotate") and n not in window
    )
    if promised:
        # enforceable rotation commitments (review fix: a comment promising
        # "these lead next round's rotation" had no teeth). Informational
        # here; --evidence-update N REFUSES to finalize a window that
        # breaks a due promise.
        print(
            "note: queries promised a fresh row (must_rotate) still outside "
            f"the window: {promised}"
        )
    if violations:
        print(f"STALE: {len(violations)} queries lack current-evidence rows and sit "
              f"outside the {DRIVER_WINDOW}-entry driver window:")
        for name, why in violations:
            print(f"  {name} ({why})")
        sys.exit(1)
    pending = sorted(
        n for n in names
        if n in window and (n not in recorded or recorded[n]["fp"] != cur[n])
    )
    print(f"staleness ok: queries needing a fresh row this round = "
          f"{pending or 'none'}; all are inside the driver window")
    sys.exit(0)


PINNED = ["npm_dependency_counts"]  # flagship: in-window every round


def window_budget_demand(names, cur, recorded, round_no):
    """The set of queries that MUST occupy a window slot in ``round_no``,
    in registry order: the pinned flagship, every query whose fingerprint
    differs from its recorded evidence row (changed), every query with no
    evidence row at all (new), and every due must_rotate promise. Pure
    function so the over-budget refusal is unit-testable without Spark."""
    window = set(names[:DRIVER_WINDOW])
    demand = []
    for n in names:
        rec = recorded.get(n)
        due = (
            rec is not None
            and rec.get("must_rotate") is not None
            and rec["must_rotate"] <= round_no
        )
        if (
            n in PINNED
            or rec is None
            or rec.get("fp") != cur[n]
            or due
        ):
            demand.append(n)
    over = len(demand) - DRIVER_WINDOW
    outside = [n for n in demand if n not in window]
    return demand, over, outside


def window_budget(round_no: int) -> None:
    """Mechanical slot-arithmetic gate (round-5/6 verdict carry-item):
    FAIL before any code lands when pinned + new + fingerprint-changed +
    due-rotations exceed the driver's 50-entry window, or when a demanded
    query sits outside the current window ordering. Run it when planning
    a round (before writing operators) and again before finalizing."""
    names, cur = _current_fingerprints()
    recorded = _load_evidence()
    demand, over, outside = window_budget_demand(names, cur, recorded, round_no)
    print(
        f"window budget r{round_no}: demand {len(demand)} of "
        f"{DRIVER_WINDOW} slots ({DRIVER_WINDOW - len(demand)} free for "
        f"aged-evidence rotation)"
    )
    if over > 0:
        sys.exit(
            f"OVER BUDGET by {over}: {len(demand)} mandatory slots > "
            f"{DRIVER_WINDOW}-entry window. Mandatory set: {demand}. "
            "Defer new registrations or re-promise rotations "
            "(--must-rotate N+1) before writing more code."
        )
    if outside:
        sys.exit(
            f"WINDOW ORDER BROKEN: these mandatory queries sit outside "
            f"the first {DRIVER_WINDOW} entries: {outside}. Reorder "
            "_PRIORITY in __spark_entry__.py."
        )
    print("window budget ok: every mandatory query holds a window slot")


PASS_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".last_full_pass.json")


def _fingerprint_sources() -> list[str]:
    """Every file whose edit can move a query fingerprint."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = [os.path.join(root, "__spark_entry__.py")]
    for dirpath, _, files in os.walk(os.path.join(root, _PKG_PREFIX)):
        out.extend(os.path.join(dirpath, f) for f in files if f.endswith(".py"))
    return out


def _source_digests() -> dict[str, str]:
    """Content sha256 per fingerprint-relevant source, keyed by relpath.
    Recorded with the green-pass stamp and re-checked at rebase time:
    mtime comparison alone could be stale-laundered by a git checkout
    (which rewrites mtimes wholesale) — content can't (round-4 verdict
    "What's wrong" #5)."""
    import hashlib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {}
    for p in _fingerprint_sources():
        with open(p, "rb") as f:
            out[os.path.relpath(p, root)] = hashlib.sha256(f.read()).hexdigest()
    return out


def evidence_rebase() -> None:
    """Recompute every RECORDED fingerprint with the current algorithm and
    code, keeping each query's recorded round. The prerequisite — a green
    FULL local oracle pass on the exact current tree, which is the
    evidence that current code still matches every old green row — is
    MACHINE-CHECKED (review fix: it used to be an unrecorded manual step,
    so an accidental rebase silently laundered stale evidence): a full
    `driver_check.py <sf_dir>` run with zero failures writes
    ``.last_full_pass.json``; this command refuses unless that artifact
    exists AND is newer than every fingerprint-relevant source file. The
    pass metadata (timestamp, sf_dir) is stamped into evidence.json's
    ``_rebase`` key for the audit trail. Needed when the fingerprint
    algorithm changes, or when a broad shared-helper edit flags more
    queries than the driver window can hold."""
    import json
    import time

    if not os.path.exists(PASS_FILE):
        sys.exit(
            "REFUSED: no recorded green full pass. Run "
            "`python tools/driver_check.py <sf_dir>` (all queries, zero "
            "failures) first — that run writes .last_full_pass.json."
        )
    with open(PASS_FILE) as f:
        rec_pass = json.load(f)
    newer = [
        p for p in _fingerprint_sources() if os.path.getmtime(p) > rec_pass["ts"]
    ]
    if newer:
        sys.exit(
            "REFUSED: sources changed after the recorded green pass "
            f"({time.strftime('%Y-%m-%d %H:%M:%S', time.gmtime(rec_pass['ts']))}Z):\n  "
            + "\n  ".join(os.path.relpath(p) for p in newer)
            + "\nRe-run the full oracle pass, then rebase."
        )
    # Content check — the airtight half (a git checkout rewrites mtimes,
    # so the mtime gate above can be laundered; content digests cannot).
    # A pass recorded before digests existed is insufficient evidence.
    if "src" not in rec_pass:
        sys.exit(
            "REFUSED: recorded pass predates content-digest stamping. "
            "Re-run `python tools/driver_check.py <sf_dir>` to record a "
            "pass with source digests, then rebase."
        )
    cur_src = _source_digests()
    changed = sorted(
        {k for k in cur_src if cur_src[k] != rec_pass["src"].get(k)}
        | (set(rec_pass["src"]) - set(cur_src))
    )
    if changed:
        sys.exit(
            "REFUSED: source CONTENT differs from the recorded green pass "
            "(mtimes agree, so this looks like a checkout/revert):\n  "
            + "\n  ".join(changed)
            + "\nRe-run the full oracle pass, then rebase."
        )
    names, cur = _current_fingerprints()
    recorded = _load_evidence()
    n = 0
    for name in list(recorded):
        if name in cur and recorded[name]["fp"] != cur[name]:
            recorded[name]["fp"] = cur[name]
            n += 1
    recorded["_rebase"] = {
        "fp": "meta",
        "round": recorded.get("_rebase", {}).get("round", 0),
        "pass_ts": rec_pass["ts"],
        "pass_sf_dir": rec_pass["sf_dir"],
        "pass_n_ok": rec_pass["n_ok"],
    }
    with open(EVIDENCE_FILE, "w") as f:
        json.dump(recorded, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"evidence.json: rebased {n} fingerprints (rounds preserved), "
        f"backed by full pass of {rec_pass['n_ok']} ok at {rec_pass['sf_dir']}"
    )


def evidence_update(round_no: int) -> None:
    import json

    names, cur = _current_fingerprints()
    recorded = _load_evidence()
    window = set(names[:DRIVER_WINDOW])
    broken = sorted(
        n for n, rec in recorded.items()
        if not n.startswith("_")
        and rec.get("must_rotate") is not None
        and rec["must_rotate"] <= round_no
        and n not in window
    )
    if broken:
        sys.exit(
            f"REFUSED: these queries were promised a fresh row by round "
            f"{round_no} (must_rotate marker) but sit outside the window: "
            f"{broken}. Rotate them in, or consciously bump the marker."
        )
    # If the window shifted between two --evidence-update N runs (new
    # queries inserted mid-round), entries stamped round N earlier but now
    # displaced will NOT receive an N row from the driver — revert them to
    # the round AND the fingerprint of their true latest row (kept in
    # prev_round/prev_fp) so the stamp never overstates evidence
    # freshness. Restoring only the round while keeping the stamped
    # (current-code) fp would launder staleness: a query whose code
    # changed since its last driver row would show fp == current and
    # --staleness would never demand a window slot for it.
    reverted, forgotten = [], []
    for name, rec in list(recorded.items()):
        if (not name.startswith("_") and name not in window
                and rec.get("round") == round_no):
            if "prev_round" in rec and "prev_fp" in rec:
                rec["round"] = rec.pop("prev_round")
                rec["fp"] = rec.pop("prev_fp")
                reverted.append(name)
                continue
            rec.pop("prev_round", None)  # pairless half (pre-prev_fp stamp)
            # No (prev_round, prev_fp) pair recorded (entry predates the
            # fields, or was rewritten by --evidence-rebase): fall back to
            # the GROUND TRUTH for the round — the latest
            # CORRECTNESS_r*.json that actually holds a green row for this
            # query — but the fingerprint that row was computed against is
            # unrecoverable, so the fp becomes an explicit never-matching
            # sentinel: --staleness then demands a window slot, which is
            # the honest outcome for evidence we cannot vouch for. A
            # brand-new query stamped this round then displaced before the
            # driver ran has no green row at all; its entry is deleted and
            # it counts as new again.
            true_round = _latest_green_round(name, before=round_no)
            if true_round is not None:
                rec["round"] = true_round
                rec["fp"] = f"displaced:unverified-r{round_no}"
                reverted.append(name)
            else:
                del recorded[name]
                forgotten.append(name)
    if reverted:
        print(f"note: reverted displaced round-{round_no} stamps to their "
              f"true latest round: {sorted(reverted)}")
    if forgotten:
        print(f"note: dropped displaced never-verified round-{round_no} "
              f"stamps entirely (query is new again): {sorted(forgotten)}")
    for name in names[:DRIVER_WINDOW]:
        old = recorded.get(name, {})
        prev = old.get("round")
        entry = {"fp": cur[name], "round": round_no}
        if prev is not None and prev != round_no:
            # keep BOTH halves of the true-latest-row identity so a later
            # displacement can restore them together (round alone would
            # leave the stamped current-code fp attached to an old row)
            entry["prev_round"] = prev
            entry["prev_fp"] = old["fp"]
        elif prev == round_no and "prev_round" in old:
            entry["prev_round"] = old["prev_round"]
            if "prev_fp" in old:
                entry["prev_fp"] = old["prev_fp"]
        # must_rotate markers are consciously dropped for window entries:
        # the fresh round-N row fulfills (or supersedes) the promise.
        recorded[name] = entry
    # "_"-prefixed keys are audit metadata (e.g. _rebase), not queries
    dropped = [n for n in recorded if n not in names and not n.startswith("_")]
    for n in dropped:
        del recorded[n]
    with open(EVIDENCE_FILE, "w") as f:
        json.dump(recorded, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"evidence.json: window of {DRIVER_WINDOW} recorded as round {round_no}"
          + (f"; dropped unregistered {dropped}" if dropped else ""))


def must_rotate(round_no: int, names: list[str]) -> None:
    import json

    recorded = _load_evidence()
    unknown = [n for n in names if n not in recorded]
    if unknown:
        sys.exit(f"REFUSED: no evidence rows for {unknown}")
    for n in names:
        recorded[n]["must_rotate"] = round_no
    with open(EVIDENCE_FILE, "w") as f:
        json.dump(recorded, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"evidence.json: {len(names)} queries promised a fresh row by round {round_no}")


def handoff_checks(round_no: int) -> list[str]:
    """Pure core of --handoff: every machine-checkable invariant the
    round-end handoff must satisfy ON THE EXACT CHECKOUT the driver will
    measure. Returns a list of failures (empty = green). Split from the
    CLI wrapper so tests can exercise it without exiting."""
    import subprocess

    failures: list[str] = []
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _git(*argv: str) -> str:
        return subprocess.run(
            ["git", "-C", root, *argv], capture_output=True, text=True, check=True
        ).stdout.strip()

    # 1. The measured branch is the ONLY branch, and it is main, clean.
    #    (Round-15 failure mode: r16-staging left checked out at round end,
    #    so the driver measured a window the ledger never promised.)
    branch = _git("branch", "--show-current")
    if branch != "main":
        failures.append(f"checked-out branch is {branch!r}, not 'main'")
    others = [
        b.lstrip("* ").strip()
        for b in _git("branch", "--list").splitlines()
        if b.lstrip("* ").strip() != "main"
    ]
    if others:
        failures.append(
            f"staged branches still exist: {others} — merge or delete them; "
            "nothing may be staged on a branch at round end"
        )
    dirty = _git("status", "--porcelain")
    if dirty:
        failures.append(f"worktree not clean:\n{dirty}")

    # 2. The ledger's promise for this round is EXACTLY the registry's
    #    first-50 on this checkout — what --evidence-update stamped must be
    #    what the driver will measure here.
    names, cur = _current_fingerprints()
    recorded = _load_evidence()
    stamped = {
        n for n, rec in recorded.items()
        if not n.startswith("_") and rec.get("round") == round_no
    }
    window = set(names[:DRIVER_WINDOW])
    if stamped != window:
        failures.append(
            f"evidence.json round-{round_no} stamp != live first-{DRIVER_WINDOW}: "
            f"stamped-not-in-window={sorted(stamped - window)}, "
            f"in-window-unstamped={sorted(window - stamped)} "
            f"(re-run --evidence-update {round_no} after any window edit)"
        )
    # ...and the stamped fingerprints are the CURRENT code's fingerprints.
    moved = sorted(
        n for n in (stamped & window)
        if recorded[n]["fp"] != cur[n]
    )
    if moved:
        failures.append(
            f"fingerprints moved since the round-{round_no} stamp: {moved} "
            f"(code changed after --evidence-update {round_no}; re-stamp)"
        )

    # 3. Staleness + slot budget, same predicates as the standalone gates.
    stale = [
        n for n in names
        if (recorded.get(n) is None or recorded[n]["fp"] != cur[n])
        and n not in window
    ]
    if stale:
        failures.append(f"stale evidence outside the window: {stale}")
    demand, over, outside = window_budget_demand(names, cur, recorded, round_no)
    if over > 0:
        failures.append(f"window over budget by {over}: mandatory {demand}")
    if outside:
        failures.append(f"mandatory queries outside the window: {outside}")

    # 4. A green FULL oracle pass exists for this exact source content.
    if not os.path.exists(PASS_FILE):
        failures.append(
            "no recorded green full pass (.last_full_pass.json missing) — "
            "run `python tools/driver_check.py <sf_dir>` with zero failures"
        )
    else:
        with open(PASS_FILE) as f:
            rec_pass = json.load(f)
        if "src" not in rec_pass:
            failures.append("recorded full pass predates content digests — re-run it")
        else:
            cur_src = _source_digests()
            changed = sorted(
                {k for k in cur_src if cur_src[k] != rec_pass["src"].get(k)}
                | (set(rec_pass["src"]) - set(cur_src))
            )
            if changed:
                failures.append(
                    "sources changed since the last green full pass: "
                    f"{changed} — re-run the full oracle pass"
                )
    return failures


def handoff(round_no: int) -> None:
    """Round-end gate (round-15 verdict item 2): refuse the handoff unless
    every invariant in handoff_checks() holds on this exact checkout."""
    failures = handoff_checks(round_no)
    if failures:
        print(f"HANDOFF r{round_no}: NOT READY — {len(failures)} failure(s):")
        for msg in failures:
            print(f"  - {msg}")
        sys.exit(1)
    print(
        f"handoff r{round_no} ok: main-only clean checkout, ledger promise == "
        f"live window, fingerprints current, budget green, full pass green"
    )
    sys.exit(0)


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--handoff":
        handoff(int(args[1]))
    if args and args[0] == "--staleness":
        staleness()
    if args and args[0] == "--evidence-update":
        evidence_update(int(args[1]))
        return
    if args and args[0] == "--evidence-rebase":
        evidence_rebase()
        return
    if args and args[0] == "--must-rotate":
        must_rotate(int(args[1]), args[2:])
        return
    if args and args[0] == "--window-budget":
        window_budget(int(args[1]))
        return
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
    if not only and not bad:
        # record the green FULL pass — the machine-checked prerequisite
        # --evidence-rebase demands (see its docstring)
        import json as _json
        import time as _time

        with open(PASS_FILE, "w") as f:
            _json.dump(
                {"ts": _time.time(), "sf_dir": sf_dir, "n_ok": ok,
                 "n_rows_only": rows_only, "src": _source_digests()},
                f,
            )
        print(f"recorded green full pass -> {os.path.relpath(PASS_FILE)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
