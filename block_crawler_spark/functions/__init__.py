"""Column-level function library (all JVM-side unless noted)."""
