"""Scalar/expression-level building blocks (all JVM-side built-ins)."""
