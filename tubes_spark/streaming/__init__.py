"""Structured Streaming layer: the reference's Pump side.

The reference's ``Pump`` (Tubes/Core.hs:167-194) — the machine that
drives a Tube and holds resumable fold state — maps to Spark's
micro-batch driver + checkpointed state store (SURVEY.md §1.1, §3.2).
"""
