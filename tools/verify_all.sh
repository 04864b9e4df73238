#!/usr/bin/env bash
# Full verification: driver simulation on a vanilla session (every query),
# DuckDB oracle parity at sf0.01, and the bench JSON line.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/3 driver simulation (vanilla session, all queries) =="
python - <<'EOF'
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
print("entry rows:", len(e.entry(spark).collect()))
qs = e.queries()
bad = []
for name, fn in sorted(qs.items()):
    try:
        fn(spark, "/root/testdata/sf0.01").count()
    except Exception as ex:
        bad.append((name, str(ex)[:200]))
print(f"{len(qs)} queries ran; failures: {bad if bad else 'none'}")
assert not bad
EOF

echo "== 2/3 oracle parity (sf0.01) =="
python tools/oracle_check.py /root/testdata/sf0.01 | tail -1

echo "== 3/3 bench =="
python bench.py 2>/dev/null | tail -1 | python -c "import json,sys; d=json.load(sys.stdin); print('bench ok:', d['value'], d['unit'], len(d['queries']), 'queries')"
