"""Physical-plan introspection: the scale contract, checkable.

The engine's promises — pushdown reached the scan, the dim join
broadcast, the agg partial-aggregated before its shuffle, exactly one
Exchange — are facts about the *physical plan*, so they are exposed as
first-class assertions here (used by tests/test_plans.py and available
to users tuning their own pipelines).  The reference has no analog: its
"plan" is a fused closure (Tubes/Core.hs:140-150); Catalyst's explain
output is our window into what fusion actually produced.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def n_nodes(plan: str, name: str) -> int:
    """Count physical nodes by their detail header ``(i) Name`` —
    formatted explain prints every node twice (tree + detail block)."""
    return len(re.findall(rf"\(\d+\) {name}\b", plan))


def scan_columns(plan: str) -> list[str]:
    """Columns the parquet scan actually reads (column pruning check)."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]


def pushed_filters(plan: str) -> str:
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    return m.group(1) if m else ""


def assert_broadcasts(df: DataFrame, at_least: int = 1) -> None:
    p = plan_of(df)
    got = n_nodes(p, "BroadcastHashJoin")
    assert got >= at_least, f"expected >= {at_least} broadcast joins, saw {got}:\n{p}"


def assert_single_shuffle(df: DataFrame) -> None:
    p = plan_of(df)
    got = n_nodes(p, "Exchange")
    assert got <= 1, f"expected <= 1 Exchange, saw {got}:\n{p}"


def assert_partial_agg(df: DataFrame) -> None:
    """Map-side combine before the shuffle: >= 2 HashAggregate nodes."""
    p = plan_of(df)
    got = n_nodes(p, "HashAggregate") + n_nodes(p, "ObjectHashAggregate")
    assert got >= 2, f"expected partial+final aggregates, saw {got}:\n{p}"


def codegen_subtrees(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the *executed* plan (AQE
    reveals them only after execution)."""
    p = plan_of(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", p)
    return int(m.group(1)) if m else 0


def observed(df: DataFrame, name: str, *metrics):
    """Attach free pipeline telemetry to a plan: ``Observation`` metrics
    are accumulated BY THE TASKS that already process each row — row
    counts, null counts, sums for data-quality gates — with zero extra
    scans or actions (a naive ``df.count(); df.filter(...).count()``
    quality check reads the data once per metric; at 100 TB that is the
    difference between free and doubling the job).

    Returns (df, observation); run any action on the returned df, then
    ``observation.get`` yields the metrics dict."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
