"""Column-level function library (JVM-side expressions preferred)."""
