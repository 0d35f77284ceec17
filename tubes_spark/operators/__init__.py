"""Operator library: the reference's fold/route surface generalized to
grouped aggregation, windows, joins, dedup, similarity search, and text
analysis (SURVEY.md §2.8 / §7.2 M4 — the north-star extensions)."""
