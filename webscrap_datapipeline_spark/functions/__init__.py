"""Column-expression library: reference scalar functions (§2.7) plus the
text / vector analysis surface for the LLM-data-pipeline extension.
Everything here returns Spark Column expressions (JVM-side, codegen-able)
— no Python UDFs in the hot path."""
