"""Source — the reference's yield-only stream + its full algebra.

``Source m a`` (Tubes/Source.hs:79-81) is an exhaustible, *ordered*
stream.  Spark DataFrames are unordered multisets, so ordering is made
explicit: every :class:`Source` carries a ``__seq__`` long column (the
element position).  This is the single biggest semantic translation in
the port (SURVEY.md §1.2) — order-sensitive operators (``take`` /
``drop`` / ``takeWhile`` / ``merge`` interleave / ``<|>`` concat) are
defined w.r.t. ``__seq__``.

Scale note: ``__seq__`` is only *materialized* by a global sort for the
operators whose semantics genuinely need total order (take/drop/
takeWhile — inherently sequential in the reference too).  Everything
else (map/filter/fold/concat) keeps the column symbolic and never
shuffles for it.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEQ = "__seq__"
SRC = "__src__"

#: conservative headroom bound for packed (outer, inner) seq encodings
_SEQ_MAX = 1 << 62


def _packed_seq(outer: Column, inner: Column, stride: Column) -> Column:
    """Encode an (outer, inner) order pair as one sortable long:
    ``outer * stride + inner`` with ``0 <= inner < stride``.

    ``stride`` is computed from the data (max inner cardinality), not a
    fixed 2^20, so large inner fan-outs can't collide; and instead of
    silently wrapping on overflow (hash-derived outer seqs can sit near
    ±2^63), the expression raises via ``assert_true`` — re-rank the
    outer stream (``Source.from_df``) if that trips.  The inner bound is
    asserted too: if a nondeterministic upstream makes the stride scan
    and the explode scan disagree, the packing raises instead of
    silently corrupting order."""
    bound = F.lit(_SEQ_MAX) / stride
    ok = ((outer.cast("double") >= -bound) & (outer.cast("double") <= bound)
          & (inner >= 0) & (inner < stride))
    return F.when(F.assert_true(ok, F.lit("__seq__ packing overflow: re-rank the outer "
                                          "source (Source.from_df) before flat_map/ap")).isNull(),
                  outer * stride + inner)


class Source:
    """An ordered stream of rows: a DataFrame + a ``__seq__`` position.

    Construction: :meth:`from_df` (order given by columns) or
    :meth:`each` (order given by input sequence).
    """

    __slots__ = ("df", "dense")

    def __init__(self, df: DataFrame, dense: bool = False):
        if SEQ not in df.columns:
            raise ValueError("Source requires a __seq__ column; use Source.from_df / Source.each")
        self.df = df
        #: ``__seq__`` is known to be exactly 0..n-1 (each / from_df /
        #: order-preserving ops on dense inputs).  Lets merge skip its
        #: re-rank window — dense seqs are already positions.
        self.dense = dense

    # ------------------------------------------------------------------ ctors

    @staticmethod
    def from_df(df: DataFrame, order_by: Sequence[str | Column]) -> "Source":
        """Wrap a DataFrame; element order = lexicographic ``order_by``.

        Uses a rank-style dense global sequence via ``row_number`` over a
        single window — acceptable for the order-sensitive subset only.
        For big data prefer :meth:`from_df_keyed` (no global window).
        """
        w = Window.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_by])
        return Source(df.withColumn(SEQ, F.row_number().over(w).cast("long") - 1), dense=True)

    @staticmethod
    def from_df_keyed(df: DataFrame, seq_col: str | Column) -> "Source":
        """Wrap a DataFrame whose order is an existing monotone column
        (e.g. ``event_id``) — no shuffle, no window; the scalable path."""
        c = F.col(seq_col) if isinstance(seq_col, str) else seq_col
        return Source(df.withColumn(SEQ, c.cast("long")))

    @staticmethod
    def each(spark: SparkSession, values: Iterable, column: str = "value") -> "Source":
        """``each`` (Tubes/Util.hs:76-77): source from any container,
        order = container order.  An empty container yields an empty
        bigint-payload source (nothing to infer a type from)."""
        rows = [(i, v) for i, v in enumerate(values)]
        if not rows:
            return Source.empty(spark, f"{column} bigint")
        df = spark.createDataFrame(rows, schema=(SEQ, column))
        return Source(df.withColumn(SEQ, F.col(SEQ).cast("long")), dense=True)

    @staticmethod
    def every(spark: SparkSession, values: Iterable, column: str = "value") -> "Source":
        """``every`` (Tubes/Util.hs:79-80): ``each`` then a terminal
        NULL end-of-stream marker row (Maybe as nullable column)."""
        vals = list(values)
        rows = [(i, v) for i, v in enumerate(vals)] + [(len(vals), None)]
        df = spark.createDataFrame(rows, schema=(SEQ, column))
        return Source(df.withColumn(SEQ, F.col(SEQ).cast("long")), dense=True)

    @staticmethod
    def pure(spark: SparkSession, value, column: str = "value") -> "Source":
        """``Applicative.pure`` (Tubes/Source.hs:87): one-element source."""
        return Source.each(spark, [value], column)

    @staticmethod
    def empty(spark: SparkSession, schema: str = "value string") -> "Source":
        """``Alternative.empty`` (Tubes/Source.hs:100)."""
        df = spark.createDataFrame([], schema=f"{SEQ} long, {schema}")
        return Source(df, dense=True)

    # ------------------------------------------------------------------ views

    @property
    def data(self) -> DataFrame:
        """The payload without the ordering column."""
        return self.df.drop(SEQ, SRC)

    def ordered(self) -> DataFrame:
        """Materialize reference order (final output only — global sort)."""
        return self.df.orderBy(SEQ).drop(SEQ, SRC)

    # ------------------------------------------------------------- functor etc.

    def map(self, *cols: Column, keep_seq: bool = True) -> "Source":
        """``fmap`` (Tubes/Source.hs:83-84) / ``map`` (Tubes/Util.hs:83-84)."""
        sel = [F.col(SEQ), *cols] if keep_seq else list(cols)
        return Source(self.df.select(*sel), dense=self.dense)

    def with_columns(self, **named: Column) -> "Source":
        return Source(self.df.withColumns(dict(named)), dense=self.dense)

    def filter(self, pred: Column) -> "Source":
        """``filter`` (Tubes/Util.hs:100-101).  Position labels of the
        survivors are preserved (reference: remaining elements keep
        their relative order)."""
        return Source(self.df.filter(pred))

    def flat_map(self, arr: Column, alias: str) -> "Source":
        """Monadic bind (Tubes/Source.hs:94-97): each element expands to
        the elements of ``arr`` (array expr); inner order after outer —
        encoded as an (outer_seq, inner_pos) pair packed into one long.

        The packing stride is the observed max inner size (one scalar
        aggregate, broadcast back into the plan — no sort, no collect),
        so million-element arrays can't collide the way a fixed 2^20
        stride would; outer overflow raises instead of corrupting order
        (see :func:`_packed_seq`).  The stride is derived from the SAME
        exploded frame that feeds the output (max inner position + 1),
        so both scans share one evaluation of ``arr`` — and the packing
        asserts ``inner < stride`` so a nondeterministic upstream fails
        loudly instead of silently reordering."""
        exploded = self.df.select(
            F.col(SEQ).alias("__outer__"), F.posexplode(arr).alias("__inner__", alias)
        )
        stride = exploded.agg(
            F.greatest(F.coalesce(F.max("__inner__") + 1, F.lit(1)), F.lit(1))
            .cast("long").alias("__stride__")
        )
        out = exploded.join(F.broadcast(stride), how="cross").select(
            _packed_seq(F.col("__outer__"), F.col("__inner__").cast("long"),
                        F.col("__stride__")).alias(SEQ),
            F.col(alias),
        )
        return Source(out)

    # --------------------------------------------------------------- monoid

    def concat(self, other: "Source") -> "Source":
        """``<|>`` / ``mappend`` / ``mplus`` (Tubes/Source.hs:99-126):
        ordered concatenation — drain self fully, then other.

        Implemented without a wide shuffle: the right stream's seq is
        offset past the left's max seq — one scalar aggregate of the
        left side, broadcast back as a column (exact under arbitrary
        nesting: (a|b)|c keeps every block disjoint, unlike any fixed
        stride)."""
        off = self.df.agg(
            F.coalesce(F.max(F.col(SEQ)) + 1, F.lit(0)).alias("__off__")
        )
        right = (
            other.df.join(F.broadcast(off), how="cross")
            .withColumn(SEQ, F.col(SEQ) + F.col("__off__"))
            .drop("__off__")
        )
        return Source(self.df.unionByName(right, allowMissingColumns=False),
                      dense=self.dense and other.dense)

    def __or__(self, other: "Source") -> "Source":
        return self.concat(other)

    def merge(self, other: "Source") -> "Source":
        """``merge`` (Tubes/Source.hs:180-193): synchronous round-robin
        interleave, continuing with the survivor when one side is
        exhausted (doc: A1 B1 A2 B2 A3 B3 B4, Tubes/Source.hs:50-72).

        Interleave order = sort by (element_rank, source_id): rank i of
        stream A precedes rank i of stream B precedes rank i+1.  A side
        whose seq is not known-dense is re-ranked first (``row_number``
        over its seq) so the round-robin holds for filtered / keyed /
        hash-seq sources too — raw seqs are positions only for dense
        ``each``-style sources, and ``seq * 2`` can overflow on
        hash-derived seqs.  Dense sides (``Source.dense``) skip the
        re-rank entirely: their seqs ARE ranks, so the encoding is
        shuffle-free — no single-partition window funnel.  Re-ranking a
        non-dense side is a total-order window: same cost class as
        take/drop, inherent to the reference's synchronous interleave.
        As a multiset the result equals ``union`` (use that when order
        is irrelevant).  Streaming form: plain ``union`` (arrival
        order) — documented divergence (SURVEY.md §7.4)."""
        w = Window.orderBy(SEQ)
        rank = (F.row_number().over(w).cast("long") - 1).alias(SEQ)
        ldf = self.df if self.dense else self.df.withColumn(SEQ, rank)
        rdf = other.df if other.dense else other.df.withColumn(SEQ, rank)
        left = ldf.withColumn(SRC, F.lit(0))
        right = rdf.withColumn(SRC, F.lit(1))
        u = left.unionByName(right)
        out = u.select(
            (F.col(SEQ) * 2 + F.col(SRC)).alias(SEQ),
            *[c for c in u.columns if c not in (SEQ, SRC)],
        )
        return Source(out)

    # ------------------------------------------------------------ applicative

    def ap(self, other: "Source", combine: Callable[[Column, Column], Column], alias: str = "value") -> "Source":
        """``Applicative.<*>`` (Tubes/Source.hs:89-92): cartesian product
        then combine — nested-for-loop order (self outer, other inner).

        Spark: crossJoin.  At scale the smaller side should be broadcast;
        Spark's AQE/planner picks broadcast-nested-loop automatically for
        small inputs."""
        lc = [c for c in self.df.columns if c != SEQ]
        rc = [c for c in other.df.columns if c != SEQ]
        if len(lc) != 1 or len(rc) != 1:
            raise ValueError("ap expects single-payload sources")
        l = self.df.select(F.col(SEQ).alias("__ls__"), F.col(lc[0]).alias("__lv__"))
        # Inner (right) side: re-rank to a dense 0..n-1 so the packed seq
        # uses stride = count(right) exactly — no fixed-width 2^20 stride
        # to collide or overflow.  The right side of a cartesian must be
        # small anyway, so its total-order window is cheap; the big outer
        # side is NOT sorted (overflow raises instead, see _packed_seq).
        wr = Window.orderBy("__rs__")
        r = other.df.select(F.col(SEQ).alias("__rs__"), F.col(rc[0]).alias("__rv__"))
        r = r.withColumn("__rr__", F.row_number().over(wr).cast("long") - 1).drop("__rs__")
        stride = other.df.agg(
            F.greatest(F.count(F.lit(1)), F.lit(1)).cast("long").alias("__stride__")
        )
        x = l.crossJoin(r).join(F.broadcast(stride), how="cross")
        out = x.select(
            _packed_seq(F.col("__ls__"), F.col("__rr__"), F.col("__stride__")).alias(SEQ),
            combine(F.col("__lv__"), F.col("__rv__")).alias(alias),
        )
        return Source(out)

    # Numeric instances (Tubes/Source.hs:128-162): arithmetic lifted over
    # sources — binary ops via liftA2 (cartesian), unary via fmap.
    def __add__(self, other): return self.ap(other, lambda a, b: a + b)
    def __sub__(self, other): return self.ap(other, lambda a, b: a - b)
    def __mul__(self, other): return self.ap(other, lambda a, b: a * b)
    def __truediv__(self, other): return self.ap(other, lambda a, b: a / b)
    def __pow__(self, other): return self.ap(other, lambda a, b: F.pow(a, b))

    def lift1(self, fn: Callable[[Column], Column]) -> "Source":
        """Unary Floating/Num method (fmap over the single payload column):
        ``src.lift1(F.sqrt)``, ``src.lift1(lambda c: -c)`` …  Covers the
        reference's sqrt/exp/log/trig/abs/signum/negate/recip instances
        (Tubes/Source.hs:128-162) without 20 near-identical methods."""
        cols = [c for c in self.df.columns if c != SEQ]
        if len(cols) != 1:
            raise ValueError("lift1 expects a single-payload source")
        return Source(self.df.select(F.col(SEQ), fn(F.col(cols[0])).alias(cols[0])),
                      dense=self.dense)

    def sqrt(self): return self.lift1(F.sqrt)
    def exp(self): return self.lift1(F.exp)
    def log(self): return self.lift1(F.log)
    def sin(self): return self.lift1(F.sin)
    def cos(self): return self.lift1(F.cos)
    def tan(self): return self.lift1(F.tan)
    def abs(self): return self.lift1(F.abs)
    def signum(self): return self.lift1(F.signum)
    def __neg__(self): return self.lift1(lambda c: -c)
    def recip(self): return self.lift1(lambda c: F.lit(1.0) / c)
    # full named Floating surface (Tubes/Source.hs:143-162) — every
    # instance method the reference enumerates, so users never need to
    # reach for lift1(F.*) themselves:
    def asin(self): return self.lift1(F.asin)
    def acos(self): return self.lift1(F.acos)
    def atan(self): return self.lift1(F.atan)
    def sinh(self): return self.lift1(F.sinh)
    def cosh(self): return self.lift1(F.cosh)
    def tanh(self): return self.lift1(F.tanh)
    def asinh(self): return self.lift1(F.asinh)
    def acosh(self): return self.lift1(F.acosh)
    def atanh(self): return self.lift1(F.atanh)
    def log_base(self, base: float) -> "Source":
        """``logBase b`` — note the reference's argument order (base first)."""
        return self.lift1(lambda c: F.log(float(base), c))

    @staticmethod
    def pi(spark: SparkSession, column: str = "value") -> "Source":
        """``pi`` (Floating's nullary member): one-element source of π."""
        import math
        return Source.pure(spark, math.pi, column)

    # ----------------------------------------------------------- order-sensitive

    def take(self, n: int) -> "Source":
        """``take`` (Tubes/Util.hs:116-120): first n elements, then stop.
        Physical plan: TakeOrderedAndProject (no full sort at scale)."""
        return Source(self.df.orderBy(SEQ).limit(n), dense=self.dense)

    def drop(self, n: int) -> "Source":
        """``drop`` (Tubes/Util.hs:94-96): discard the first n.

        Scalable form: rank the seq column and filter — implemented as an
        anti-semi against the top-n (cheap: top-n is tiny)."""
        top = self.df.select(F.col(SEQ)).orderBy(SEQ).limit(n).agg(F.max(SEQ).alias("__cut__"))
        return Source(
            self.df.join(F.broadcast(top), how="cross").filter(
                F.col("__cut__").isNull() | (F.col(SEQ) > F.col("__cut__"))
            ).drop("__cut__")
        )

    def take_while(self, pred: Column) -> "Source":
        """``takeWhile`` (Tubes/Util.hs:104-113): pass until the first
        violation, then terminate the whole stream.

        Distributed form: one cheap scalar aggregate (min seq where
        ``!pred``) broadcast back as a filter bound — two scans, zero
        wide shuffles; survives any scale."""
        cut = self.df.filter(~pred).agg(F.min(SEQ).alias("__cut__"))
        return Source(
            self.df.join(F.broadcast(cut), how="cross")
            .filter(F.col("__cut__").isNull() | (F.col(SEQ) < F.col("__cut__")))
            .drop("__cut__"),
            dense=self.dense,  # a prefix of a dense 0..n-1 seq stays dense
        )

    def drop_while(self, pred: Column) -> "Source":
        cut = self.df.filter(~pred).agg(F.min(SEQ).alias("__cut__"))
        return Source(
            self.df.join(F.broadcast(cut), how="cross")
            .filter(F.col("__cut__").isNotNull() & (F.col(SEQ) >= F.col("__cut__")))
            .drop("__cut__")
        )

    # ----------------------------------------------------------------- folds

    def reduce(self, agg: Column):
        """``reduce`` (Tubes/Source.hs:167-174): strict fold of the
        source -> driver value.  Spark: hash aggregate (partial per
        partition + final), constant space like the reference's lfold."""
        return self.df.agg(agg.alias("result")).collect()[0]["result"]

    def reduce_df(self, *aggs: Column) -> DataFrame:
        return self.df.agg(*aggs)

    def running(self, **named: Column) -> "Source":
        """Running/stateful channel (Tubes/Channel.hs:46-76: running sum /
        average) — batch form: prefix-window aggregates over ``__seq__``.
        Pass unaliased aggregate columns as kwargs: ``running(s=F.sum(..))``.

        Note: a single unbounded ordered window is inherently sequential;
        at scale prefer keyed running states (see operators.fold.running_by)."""
        w = Window.orderBy(SEQ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return Source(self.df.withColumns({name: c.over(w) for name, c in named.items()}))
