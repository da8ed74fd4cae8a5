"""File-format sources/sinks and the pipeline state store — the Spark
re-expression of the reference's I/O surface (SURVEY.md §2.1)."""
