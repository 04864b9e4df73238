"""Hermetic, deterministic NPM registry fixtures.

The reference validates against the LIVE registry
(reference: src/main/scala/NpmPackage.scala:8), so its output drifts and a
failed fetch silently loses data. These frozen documents (FIXTURES.md F1/F2)
make the flagship pipeline deterministic and network-free. Every edge case
pins a reference behavior:

- version with both dep objects            -> counts > 0 (happy path)
- version missing ``dependencies``         -> runtime 0   (Version.scala:10-12 swallow)
- version missing ``devDependencies``      -> dev 0       (Version.scala:18-20 swallow)
- version with empty ``{}`` objects        -> counts 0
- doc with no ``versions`` key             -> no rows     (NpmPackage.scala:17-19 swallow)
- doc whose ``versions`` is not an object  -> no rows
- non-200 status                           -> no rows     (NpmPackage.scala:9)
- many-version doc (>=10)                  -> flatten fan-out (Main.scala:37-38)
- same semver string in two packages       -> grouping on (package, version)
- malformed JSON doc                       -> no rows (PERMISSIVE parse -> nulls)

``expected_counts()`` is an INDEPENDENT plain-Python implementation of the
query (json + dict, no Spark) — the golden oracle for tests and for the
driver's DuckDB comparison via the materialized parquet.
"""

from __future__ import annotations

import json
import os
from typing import Any

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def _doc(name: str, versions: dict[str, dict[str, Any]] | Any) -> str:
    body: dict[str, Any] = {"name": name}
    if versions is not None:
        body["versions"] = versions
    return json.dumps(body, sort_keys=True)


def _ver(deps: dict[str, str] | None = None, dev: dict[str, str] | None = None, name: str = "") -> dict[str, Any]:
    v: dict[str, Any] = {"name": name}
    if deps is not None:
        v["dependencies"] = deps
    if dev is not None:
        v["devDependencies"] = dev
    return v


def registry_docs() -> list[tuple[str, int, str]]:
    """(name, status_code, doc_json) rows — FIXTURES.md F2."""
    rows: list[tuple[str, int, str]] = []

    # happy path, two versions, both dep kinds
    rows.append(
        (
            "alpha",
            200,
            _doc(
                "alpha",
                {
                    "1.0.0": _ver({"lodash": "^4.0.0", "minimist": "~1.2.0"}, {"mocha": "^8.0.0"}, "alpha"),
                    "1.1.0": _ver(
                        {"lodash": "^4.0.0", "minimist": "~1.2.0", "chalk": "^2.0.0"},
                        {"mocha": "^8.0.0", "chai": "^4.0.0"},
                        "alpha",
                    ),
                },
            ),
        )
    )
    # missing dependencies key -> runtime 0
    rows.append(("beta", 200, _doc("beta", {"0.1.0": _ver(None, {"jest": "^27.0.0"}, "beta")})))
    # missing devDependencies key -> dev 0
    rows.append(("gamma", 200, _doc("gamma", {"2.0.0": _ver({"react": "^17.0.0"}, None, "gamma")})))
    # empty {} objects -> both 0
    rows.append(("delta", 200, _doc("delta", {"3.3.3": _ver({}, {}, "delta")})))
    # no versions key at all -> package contributes no rows
    rows.append(("epsilon", 200, _doc("epsilon", None)))
    # versions present but not an object -> no rows (PERMISSIVE null)
    rows.append(("zeta", 200, json.dumps({"name": "zeta", "versions": "not-an-object"})))
    # non-200 -> dropped before parse
    rows.append(("eta", 404, _doc("eta", {"9.9.9": _ver({"x": "1"}, {"y": "2"}, "eta")})))
    # mixed case + hyphen names (real input has Base64, ab-testing)
    rows.append(("Base64", 200, _doc("Base64", {"1.0.0": _ver({"buffer": "*"}, None, "Base64")})))
    rows.append(
        (
            "ab-testing",
            200,
            _doc("ab-testing", {"1.0.0": _ver({"uuid": "^8.0.0"}, {"tap": "^15.0.0"}, "ab-testing")}),
        )
    )
    # many versions (fan-out) — deterministic: version i has i runtime deps, i % 3 dev deps
    many = {
        f"0.{i}.0": _ver(
            {f"dep{j}": "^1.0.0" for j in range(i)},
            {f"devdep{j}": "^1.0.0" for j in range(i % 3)},
            "theta",
        )
        for i in range(12)
    }
    rows.append(("theta", 200, _doc("theta", many)))
    # shared semver string with alpha (1.0.0) -> grouping must key on (pkg, ver)
    rows.append(("iota", 200, _doc("iota", {"1.0.0": _ver({"a": "1", "b": "2", "c": "3"}, {"d": "4"}, "iota")})))
    # malformed JSON body
    rows.append(("kappa", 200, '{"name": "kappa", "versions": {'))
    return rows


def package_names() -> list[str]:
    """F1: the input list. Includes one name with no registry doc at all
    (lost join -> no rows) to pin left-join-then-drop semantics."""
    return [name for name, _, _ in registry_docs()] + ["no-such-package"]


def expected_counts() -> list[tuple[str, str, int, int]]:
    """Golden output computed independently with plain Python json —
    one row per (package, version): (package, version, runtime, dev)."""
    out: dict[tuple[str, str], tuple[int, int]] = {}
    status = {name: code for name, code, _ in registry_docs()}
    for name, code, doc in registry_docs():
        if code != 200:
            continue
        try:
            parsed = json.loads(doc)
        except json.JSONDecodeError:
            continue
        versions = parsed.get("versions")
        if not isinstance(versions, dict):
            continue
        for ver, vdoc in versions.items():
            deps = vdoc.get("dependencies")
            dev = vdoc.get("devDependencies")
            n_deps = len(deps) if isinstance(deps, dict) else 0
            n_dev = len(dev) if isinstance(dev, dict) else 0
            # map upsert = last-writer-wins (AccumulatedDependencyCount.scala:8-12)
            out[(name, ver)] = (n_deps, n_dev)
    assert status  # fixtures non-empty
    return sorted((p, v, r, d) for (p, v), (r, d) in out.items())


def materialize(out_dir: str = FIXTURES_DIR) -> None:
    """Write the fixture tables as parquet (committed once; DuckDB oracle
    reads them with read_parquet)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs = registry_docs()
    pq.write_table(
        pa.table(
            {
                "name": [r[0] for r in docs],
                "status_code": pa.array([r[1] for r in docs], pa.int32()),
                "doc": [r[2] for r in docs],
            }
        ),
        os.path.join(out_dir, "npm_registry_docs.parquet"),
    )
    pq.write_table(
        pa.table({"name": package_names()}),
        os.path.join(out_dir, "npm_packages.parquet"),
    )
    golden = expected_counts()
    pq.write_table(
        pa.table(
            {
                "package": [g[0] for g in golden],
                "version": [g[1] for g in golden],
                "dependencies": pa.array([g[2] for g in golden], pa.int64()),
                "devDependencies": pa.array([g[3] for g in golden], pa.int64()),
            }
        ),
        os.path.join(out_dir, "npm_expected_counts.parquet"),
    )


if __name__ == "__main__":
    materialize()
    print(f"wrote fixtures to {FIXTURES_DIR}")
