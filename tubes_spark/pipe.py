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


# ---------------------------------------------------------------------------
# Arrow / ArrowChoice surface (Tubes/Channel.hs:97-159)
# ---------------------------------------------------------------------------

def _shared(df: DataFrame, cache: bool) -> DataFrame:
    """Input sharing for multi-branch combinators.

    Default (``cache=False``): return the plan as-is — each branch
    re-derives from source with its own pushed-down filters.  Two parquet
    scans with disjoint pushed predicates beat materializing the full
    input at 100 TB, and it keeps the combinator streaming-compatible
    (``persist`` throws on streaming DataFrames).

    DETERMINISM REQUIREMENT of the default: because each branch
    re-evaluates the plan independently, an upstream stage containing
    nondeterministic expressions (``rand``, sampling, first-in-group
    without a total order) can produce DIFFERENT rows per branch —
    fanout's self-join and pchoice's filter/union would then see
    inconsistent inputs.  Pass ``cache=True`` for such upstreams; the
    checkpoint pins one materialization for all branches.

    ``cache=True``: lazy ``localCheckpoint`` — materialized once at the
    first action, shared by all branches, and (unlike ``DataFrame
    .persist``, whose CacheManager entry lives until an explicit
    unpersist) released by the ContextCleaner when the RDD is GC'd, so
    repeated invocations don't accumulate cached partitions.  Use when
    the upstream pipeline is expensive relative to its output size."""
    if cache and not df.isStreaming:
        return df.localCheckpoint(eager=False)
    return df


def fanout(p1: Pipe, p2: Pipe, key: str, cache: bool = False) -> Pipe:
    """``Applicative <*>`` / ``&&&`` (Tubes/Channel.hs:97-99): run two
    stages on the SAME input element, combine their outputs.

    Relational form: both stages must preserve ``key``; outputs are
    equi-joined on it.  When both stages are pure column projections
    prefer a single ``select(f(x), g(x))`` — this combinator exists for
    stages with internal aggregation/state that can't share one select."""
    def run(df: DataFrame) -> DataFrame:
        df = _shared(df, cache)
        a, b = p1(df), p2(df)
        dup = [c for c in b.columns if c in a.columns and c != key]
        return a.join(b.drop(*dup), on=key)
    return Pipe(run)


def pfirst(stage: Pipe, key: str, comp: "list[str]") -> Pipe:
    """``Arrow.first`` (Tubes/Channel.hs:122-132): apply a stage to one
    component of each element, pass the rest through unchanged.

    The element is a row; ``comp`` names the component columns the stage
    consumes/replaces; everything else rides along via an equi-join on
    ``key`` (one shuffle, or zero if both sides are co-partitioned)."""
    def run(df: DataFrame) -> DataFrame:
        rest = df.drop(*comp)
        transformed = stage(df.select(key, *comp))
        return rest.join(transformed, on=key)
    return Pipe(run)


def psecond(stage: Pipe, key: str, comp: "list[str]") -> Pipe:
    """``Arrow.second`` — mirror of :func:`pfirst` (same relational form;
    the pair components are columns, so first/second differ only in
    which names you pass)."""
    return pfirst(stage, key, comp)


def pchoice(pred: Column, on_true: Pipe, on_false: Pipe, cache: bool = False) -> Pipe:
    """``ArrowChoice +++`` (Tubes/Channel.hs:134-159): route each element
    through one of two stages — with INDEPENDENT state per branch — then
    merge.  Split-filter / transform / union-back; each branch sees only
    its own rows, so branch-internal aggregations/windows are isolated
    exactly like the reference's per-branch tube state.

    Rows where ``pred`` is NULL take the false branch (``~pred`` is made
    null-safe), so no element is silently dropped."""
    def run(df: DataFrame) -> DataFrame:
        df = _shared(df, cache)
        t = on_true(df.filter(pred))
        f = on_false(df.filter(F.coalesce(~pred, F.lit(True))))
        return t.unionByName(f, allowMissingColumns=True)
    return Pipe(run)


def pleft(stage: Pipe, pred: Column) -> Pipe:
    """``ArrowChoice.left``: transform only the rows matching ``pred``
    (the Left branch); the rest pass through unchanged."""
    return pchoice(pred, stage, cat)


def pright(stage: Pipe, pred: Column) -> Pipe:
    """``ArrowChoice.right``: transform only the non-matching rows."""
    return pchoice(pred, cat, stage)


def pswitch(col: Column, cases: "dict[object, Pipe]", default: Pipe | None = None,
            cache: bool = False) -> Pipe:
    """Channel ``Monad.>>=`` (Tubes/Channel.hs:102-117), relational
    subset: per-element choice among a FINITE set of stages keyed by a
    column value.  Each case stage runs over its own row subset with
    independent state; results union back.

    The reference's fully-dynamic form (a brand-new channel constructed
    from every element) has no distributed equivalent — that residue is
    an explicit UDF escape hatch, by design (SURVEY.md §7.4 item 3).

    Matching is null-safe (``eqNullSafe``): a ``None`` case key matches
    NULL column values, and unmatched NULLs reach ``default`` instead of
    vanishing into a three-valued ``~matched`` filter."""
    def run(df: DataFrame) -> DataFrame:
        df = _shared(df, cache)
        out = None
        matched = None
        for v, stage in cases.items():
            hit = col.eqNullSafe(F.lit(v))
            part = stage(df.filter(hit))
            out = part if out is None else out.unionByName(part, allowMissingColumns=True)
            matched = hit if matched is None else (matched | hit)
        rest = df.filter(~matched) if matched is not None else df
        if default is not None:
            rest = default(rest)
            out = rest if out is None else out.unionByName(rest, allowMissingColumns=True)
        return out if out is not None else df.limit(0)
    return Pipe(run)


def pmapm(fn, schema: str) -> Pipe:
    """``mapM`` (Tubes/Util.hs:147-150): effectful per-element transform.
    Arrow-batched ``mapInPandas`` — the sanctioned Python escape hatch
    (never row-at-a-time UDFs)."""
    return Pipe(lambda df: df.mapInPandas(fn, schema=schema))


def pdynamic(make_channel, schema: str) -> Pipe:
    """Fully-dynamic ``Channel.Monad`` (Tubes/Channel.hs:102-117): a
    brand-new channel is constructed FROM each element's value and run
    over that element — the reference's ``m >>= f`` where ``f`` returns
    a different tube per input.

    This is the documented UDF escape hatch for the residue that
    :func:`pswitch` (finite, relational) cannot express: ``make_channel``
    receives one element as a dict and returns an iterable of output
    dicts — its per-element channel's yields (0 yields = that channel
    halts without output; N yields = N rows).  Runs as Arrow-batched
    ``mapInPandas`` with a per-row Python loop inside the batch — the
    slow path by contract (SURVEY.md §7.4 item 3): per-row arbitrary
    Python cannot be whole-stage codegen'd on ANY engine, distributed or
    not.  Everything that can stay relational should use pswitch /
    pchoice; this exists so nothing the reference accepts is
    inexpressible here."""
    import pandas as pd

    cols = [c.strip().rsplit(" ", 1)[0] for c in schema.split(",")]

    def apply(batches):
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                out.extend(make_channel(row))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
                {c: [] for c in cols}
            )

    return Pipe(lambda df: df.mapInPandas(apply, schema=schema))
