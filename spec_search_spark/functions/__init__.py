"""Scalar/composite column functions (all JVM-side built-ins unless noted)."""
