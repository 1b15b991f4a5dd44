"""Reusable column-expression library (all JVM-side, codegen-friendly)."""
