"""Composite relational operators the base DataFrame API lacks as
single calls — each built as a composition of built-in ops (never a
driver-side loop), so Catalyst still optimizes through them."""
