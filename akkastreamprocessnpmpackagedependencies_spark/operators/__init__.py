"""Operator library. Every operator is a ``DataFrame -> DataFrame``
function — the idiomatic Spark replacement for the reference's GraphDSL
partial graphs (reference: src/main/scala/Main.scala:40-80): composition is
plain function composition over lazy DataFrames, and Catalyst fuses the
result into whole-stage-codegen'd physical stages.
"""
