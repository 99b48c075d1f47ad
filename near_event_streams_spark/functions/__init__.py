"""Reusable column-expression helpers (all JVM-side, codegen-friendly)."""
