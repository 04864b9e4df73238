"""Reusable Column-expression helpers (vector math, shingling, hashing).

Everything here is built from JVM-side ``pyspark.sql.functions`` — no
Python row path — so the hot loops stay inside whole-stage codegen.
"""
