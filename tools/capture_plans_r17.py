"""Capture `.explain("formatted")` output for named queries into
plans/r17/<query>_<stage>.txt — the before/after plan evidence for the
round-16 optimization pass.

Usage: python tools/capture_plans_r17.py <before|after> <query> [query ...]
       python tools/capture_plans_r17.py <before|after> --all-headline

Plans are captured at the BENCH scale factor (sf0.1 by default, override
with SPARK_GRAFT_SF_DIR) so the shapes match what bench.py times.
CHECKPOINT_ENABLED is flipped off (the dump_plans.py convention) so
localCheckpoint lineage truncation doesn't hide the real plan under a
"Scan ExistingRDD".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")


def main() -> None:
    stage = sys.argv[1]
    assert stage in ("before", "after"), stage
    names = sys.argv[2:]

    from akkastreamprocessnpmpackagedependencies_spark import session as sess

    sess.CHECKPOINT_ENABLED = False  # keep full lineage visible in explain

    import __spark_entry__ as entrymod
    from akkastreamprocessnpmpackagedependencies_spark.session import get_spark

    if names == ["--all-headline"]:
        import bench

        names = list(bench.HEADLINE)

    spark = get_spark("capture_plans_r17")
    qs = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    import contextlib
    import io

    for name in names:
        path = os.path.join(OUT_DIR, f"{name}_{stage}.txt")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, SF_DIR).explain("formatted")
        plan = buf.getvalue()
        with open(path, "w") as fh:
            fh.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
