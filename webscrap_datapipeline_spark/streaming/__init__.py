"""Structured Streaming formulations of the reference's incremental
semantics (SURVEY.md §2.8): the hourly batch job is micro-batch
streaming in disguise — these modules make it actual streaming."""
