"""Pipe — the reference's ``Channel`` / series-composition algebra.

Reference semantics re-expressed:

* ``Channel m a b`` (Tubes/Channel.hs:82-84) — an ``a -> b`` stream
  transformer.  Here: a wrapped ``Callable[[DataFrame], DataFrame]``.
* ``(><)`` series composition (Tubes/Core.hs:140-150) — here ``>>``
  (function composition; Catalyst fuses the stages into one plan, the
  same way the reference's RULES fuse ``map f >< map g``).
* ``cat`` identity (Tubes/Util.hs:66-69) — ``Pipe()``.
* ``Arrow.arr`` (Tubes/Channel.hs:120) — :func:`pmap` on Column exprs.
* ``Profunctor lmap/rmap`` (Tubes/Channel.hs:86-88) — pre/post ``>>``.
* ``runTube`` (Tubes/Core.hs:255-262) — :func:`run_tube`: dispatch to a
  batch action or ``writeStream`` depending on ``df.isStreaming``.

No custom IR and no interpreter: a Pipe *is* the logical plan builder,
so predicate pushdown / column pruning / whole-stage codegen apply to
every composed pipeline with zero extra machinery.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Pipe:
    """A composable ``DataFrame -> DataFrame`` stage.

    ``Pipe(f) >> Pipe(g)`` applies ``f`` then ``g`` — the reference's
    ``f >< g`` (Tubes/Core.hs:136-138: ``each [1..10] >< map (*2) ><
    pour display``).
    """

    __slots__ = ("fn",)

    def __init__(self, fn: Callable[[DataFrame], DataFrame] | None = None):
        self.fn = fn if fn is not None else (lambda df: df)

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)

    def __rshift__(self, other: "Pipe | Callable[[DataFrame], DataFrame]") -> "Pipe":
        nxt = other if callable(other) else other
        return Pipe(lambda df: nxt(self.fn(df)))

    def __rrshift__(self, df: DataFrame) -> DataFrame:
        # ``df >> pipe`` sugar: feed a DataFrame through the pipe.
        return self.fn(df)

    # Profunctor (Tubes/Channel.hs:86-88)
    def lmap(self, f: Callable[[DataFrame], DataFrame]) -> "Pipe":
        return Pipe(lambda df: self.fn(f(df)))

    def rmap(self, f: Callable[[DataFrame], DataFrame]) -> "Pipe":
        return Pipe(lambda df: f(self.fn(df)))


#: identity stage — ``cat`` (Tubes/Util.hs:66-69).  ``cat >> p == p``.
cat = Pipe()


def pmap(*cols: Column | str, **named: Column) -> Pipe:
    """Per-element transform — ``map`` (Tubes/Util.hs:83-84) /
    ``Arrow.arr`` (Tubes/Channel.hs:120).

    Column-expression based so it stays inside whole-stage codegen.
    ``pmap(expr.alias('x'))`` selects; ``pmap(x=expr)`` adds/replaces.
    """
    if named and cols:
        raise ValueError("use either positional select exprs or named withColumns, not both")
    if named:
        return Pipe(lambda df: df.withColumns(dict(named)))
    return Pipe(lambda df: df.select(*cols))


def pfilter(pred: Column | str) -> Pipe:
    """``filter`` (Tubes/Util.hs:100-101) — pushed down to the scan by
    Catalyst when possible."""
    return Pipe(lambda df: df.filter(pred))


def pflatmap(out_col: Column, alias: str) -> Pipe:
    """``for``/monadic bind — flatMap over yields (Tubes/Util.hs:46-57,
    Tubes/Source.hs:94-97).  ``out_col`` must be an array expression;
    each element becomes one output row (``explode``)."""
    return Pipe(lambda df: df.select(F.explode(out_col).alias(alias)))


def stop() -> Pipe:
    """Discard all output — ``stop`` (Tubes/Util.hs:62-63)."""
    return Pipe(lambda df: df.limit(0))


def run_tube(df: DataFrame, sink: "Callable[[DataFrame], object] | None" = None):
    """``runTube`` (Tubes/Core.hs:255-262): execute a closed pipeline.

    Batch input -> run the sink action (default: count).  Streaming
    input -> the sink must start the query (returns StreamingQuery).
    """
    if sink is not None:
        return sink(df)
    if df.isStreaming:
        return df.writeStream.format("noop").start()
    return df.count()
