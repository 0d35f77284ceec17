"""Resumable folds — ``lfold`` (Tubes/Util.hs:174-181) on Spark state.

The reference's doc example (Tubes/Util.hs:158-172) folds 1..10 -> 55,
then *resumes the same pump* with 11..20 -> 210.  In Spark the pump
state is the streaming state store: a keyed accumulator updated per
micro-batch via ``applyInPandasWithState``, persisted in the checkpoint
so a restarted query resumes exactly where it stopped.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def running_fold(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    step: Callable[[float, float], float] = lambda acc, v: acc + v,
    init: float = 0.0,
    output_schema: str = "key string, acc double, n bigint",
) -> DataFrame:
    """Keyed resumable fold over an unbounded stream.

    Each key owns an ``(acc, n)`` state cell; every micro-batch applies
    ``step`` over the batch's values and writes the new accumulator.
    With a checkpoint location, stop/restart resumes from the stored
    state — the reference's ``duplicate summer`` resumption
    (Tubes/Util.hs:167)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            acc, n = state.get
        else:
            acc, n = init, 0
        for pdf in pdfs:
            for v in pdf[value_col]:
                acc = step(acc, float(v))
                n += 1
        state.update((acc, n))
        yield pd.DataFrame({"key": [str(key[0]) if key else ""], "acc": [acc], "n": [n]})

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType="acc double, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_resumable_fold(
    values: Iterable[float],
    step: Callable[[float, float], float],
    init: float,
) -> tuple[float, Callable]:
    """Driver-side lfold mirror for parity tests: returns (result,
    resume) where resume(more) continues from the accumulated state —
    the literal shape of the reference's pump resumption."""
    acc = init
    for v in values:
        acc = step(acc, v)

    def resume(more: Iterable[float]):
        return batch_resumable_fold(more, step, acc)

    return acc, resume
