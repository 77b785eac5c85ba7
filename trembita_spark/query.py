"""Aggregation query builder — the trembita-QL analogue.

Reference (kernel/src/main/scala/trembita/ql/, unverified — QueryBuilder,
AggDecl/AggRes, GroupingCriteria, AggFunc, QueryResult):

.. code-block:: scala

    pipeline.query(_
      .where(_.amount > 20)
      .groupBy(expr[T](_.country) as "country", expr[T](_.city) as "city")
      .aggregate(expr[T](_.amount).sum as "total",
                 expr[T](_.amount).avg as "avg",
                 col[T].count        as "cnt")
      .having(agg[Long]("cnt")(_ > 10)))

Its ``AggFunc`` is a commutative-monoid fold (empty/add/combine/extract) —
exactly Spark's partial+final aggregation contract, so every aggregate maps
to a built-in Catalyst aggregate (HashAggregate partial/final, codegen,
spill) with zero custom machinery. The ``QueryResult`` nested grouping tree
with per-level totals maps to ``rollup`` + ``grouping_id()`` (or ``cube`` /
GROUPING SETS).

This builder validates eagerly (unknown columns / having on undeclared
aggregate names raise at build time — the moral equivalent of the
reference's compile-time typecheck) and emits exactly::

    df.filter(where).groupBy|rollup|cube(keys).agg(...).filter(having).orderBy(...)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trembita_spark.errors import QueryBuildError, SchemaError


class agg:
    """Named aggregate declarations — the ``AggFunc`` vocabulary.

    Each returns a named Column aggregate. All are commutative-monoid-shaped
    (partial-aggregation-friendly); composites (rms) are expression
    compositions so codegen and partial agg keep working.
    Reference instances: ql/AggFunc.scala (sum, count, avg, max, min,
    product, arr, stringagg via String sum, stdev, rms, random — unverified).
    """

    @staticmethod
    def sum(col: Column | str, name: str) -> Column:
        return F.sum(col).alias(name)

    @staticmethod
    def count(name: str) -> Column:
        return F.count(F.lit(1)).alias(name)

    @staticmethod
    def count_col(col: Column | str, name: str) -> Column:
        return F.count(col).alias(name)

    @staticmethod
    def avg(col: Column | str, name: str) -> Column:
        return F.avg(col).alias(name)

    @staticmethod
    def min(col: Column | str, name: str) -> Column:
        return F.min(col).alias(name)

    @staticmethod
    def max(col: Column | str, name: str) -> Column:
        return F.max(col).alias(name)

    @staticmethod
    def product(col: Column | str, name: str) -> Column:
        return F.product(col).alias(name)

    @staticmethod
    def arr(col: Column | str, name: str, sort: bool = True) -> Column:
        """``.arr`` — collect group values. Sorted by default so results are
        deterministic/order-insensitive-checkable. UNBOUNDED per group —
        document a bound before using at 100 TB."""
        c = F.collect_list(col)
        return (F.array_sort(c) if sort else c).alias(name)

    @staticmethod
    def arr_str(col: Column | str, name: str, sep: str = "|") -> Column:
        """``.arr`` serialized to a sorted joined string — the
        driver-canon-safe form (harnesses that lexsort/hash result cells
        cannot handle array-typed columns; round-1 incident). Prefer this
        in contract/exchange surfaces; :meth:`arr` for in-engine use."""
        return F.array_join(F.array_sort(F.collect_list(col)), sep).alias(name)

    @staticmethod
    def string_agg(col: Column | str, name: str, sep: str = ",") -> Column:
        """String-monoid sum: deterministic (sorted) concatenation."""
        return F.array_join(F.array_sort(F.collect_list(col)), sep).alias(name)

    @staticmethod
    def stdev(col: Column | str, name: str) -> Column:
        return F.stddev_samp(col).alias(name)

    @staticmethod
    def rms(col: Column | str, name: str) -> Column:
        """Root-mean-square as an expression composition (stays codegen'd)."""
        c = F.col(col) if isinstance(col, str) else col
        return F.sqrt(F.avg(c * c)).alias(name)

    @staticmethod
    def random(col: Column | str, name: str) -> Column:
        """``.random`` — arbitrary group element (nondeterministic)."""
        return F.any_value(col).alias(name)

    @staticmethod
    def count_distinct(col: Column | str, name: str) -> Column:
        return F.countDistinct(col).alias(name)

    @staticmethod
    def approx_count_distinct(col: Column | str, name: str, rsd: float = 0.05) -> Column:
        """HLL sketch — the 100 TB default for distinct counts."""
        return F.approx_count_distinct(col, rsd).alias(name)


class Query:
    """Fluent aggregation query over a DataFrame (or Pipeline.df)."""

    def __init__(self, df: DataFrame):
        self._df = df
        self._where: list[Column] = []
        self._keys: list[tuple[str, Column]] = []
        self._aggs: list[tuple[str, Column]] = []
        self._having: list[Column] = []
        self._order: list[Column] = []
        self._mode: str = "groupBy"  # groupBy | rollup | cube
        self._with_grouping_id: str | None = None
        self._qualify: list[Column] = []
        self._qualify_rank: list[tuple[str, list, list, int]] = []

    def where(self, cond: Column) -> "Query":
        self._where.append(cond)
        return self

    def group_by(self, **named_exprs: Column | str) -> "Query":
        """Grouping criteria: ``name=expr`` pairs (``expr as "name"``)."""
        for name, expr in named_exprs.items():
            if isinstance(expr, str):
                if expr not in self._df.columns:
                    raise SchemaError(
                        f"group_by: unknown column {expr!r}; have {self._df.columns}"
                    )
                expr = F.col(expr)
            self._keys.append((name, expr.alias(name)))
        return self

    def rollup(self, **named_exprs: Column | str) -> "Query":
        """Hierarchical grouping with per-level totals — the
        ``QueryResult`` nested-tree analogue. Adds nothing at execution
        beyond Catalyst's Expand; totals appear as rows with
        ``grouping_id`` > 0 instead of a driver-side tree."""
        self._mode = "rollup"
        return self.group_by(**named_exprs)

    def cube(self, **named_exprs: Column | str) -> "Query":
        self._mode = "cube"
        return self.group_by(**named_exprs)

    def with_grouping_id(self, name: str = "gid") -> "Query":
        self._with_grouping_id = name
        return self

    def aggregate(self, **named_aggs: Column) -> "Query":
        """Named aggregates: ``name=expr`` pairs (``expr.sum as "name"``).
        Use the :class:`agg` helpers (which pre-alias) positionally via
        :meth:`aggregate_cols`, or pass raw aggregate Columns here and the
        kwarg name becomes the output name."""
        for name, a in named_aggs.items():
            self._aggs.append((name, a.alias(name)))
        return self

    def aggregate_cols(self, *aliased: Column) -> "Query":
        """Accept pre-aliased aggregate Columns (from :class:`agg` helpers).
        The declared name is recovered from the plan when built."""
        for a in aliased:
            self._aggs.append((_alias_of(a), a))
        return self

    def having(self, cond: Column) -> "Query":
        """Post-aggregation filter. Must reference declared agg/key names —
        checked when the plan is built."""
        self._having.append(cond)
        return self

    def qualify(self, cond: Column) -> "Query":
        """Filter on a WINDOW-function predicate (Snowflake/DuckDB
        QUALIFY): applied after grouping/having, so the condition may
        rank the aggregated rows themselves — ``qualify(F.row_number()
        .over(w) <= 2)`` keeps the top 2 per window partition. Plain
        WHERE cannot reference window functions; without this clause the
        pattern needs a manual withColumn + filter + drop."""
        self._qualify.append(cond)
        return self

    def qualify_rank(
        self,
        order_by: "list[Column]",
        k: int,
        partition_by: "tuple[Column | str, ...] | list" = (),
        fn: str = "row_number",
    ) -> "Query":
        """The dominant QUALIFY shape — ``rank-like() OVER w <= k`` —
        compiled to the scale-correct plan for each case:

        - ``partition_by`` given: the rank VALUE becomes a throwaway
          column and the filter stays a literal ``col <= k`` comparison
          directly over the Window node, so Catalyst's WindowGroupLimit
          rewrite fires (each partition pre-prunes to k rows before the
          final window). The generic :meth:`qualify` boolean-column path
          cannot trigger that rewrite.
        - no ``partition_by`` and ``fn == "row_number"``: a global
          row_number window would funnel ALL rows through one partition;
          instead this compiles to ``orderBy(...).limit(k)``, which
          Spark plans as TakeOrderedAndProject — per-partition top-k
          then a k-row merge, no global sort, no global window. (rank/
          dense_rank keep ties, so they stay on the window path.)
        """
        if fn not in ("row_number", "rank", "dense_rank"):
            raise QueryBuildError(f"qualify_rank: unsupported rank fn {fn!r}")
        self._qualify_rank.append((fn, list(order_by), list(partition_by), int(k)))
        return self

    def order_by(self, *cols: Column | str) -> "Query":
        self._order.extend(F.col(c) if isinstance(c, str) else c for c in cols)
        return self

    # -- build ----------------------------------------------------------------

    def to_df(self) -> DataFrame:
        if not self._aggs:
            raise QueryBuildError("aggregate(...) is required")
        df = self._df
        for cond in self._where:
            df = df.filter(cond)
        key_cols = [c for _, c in self._keys]
        if self._mode == "rollup":
            grouped = df.rollup(*key_cols)
        elif self._mode == "cube":
            grouped = df.cube(*key_cols)
        else:
            grouped = df.groupBy(*key_cols) if key_cols else df.groupBy()
        agg_cols = [c for _, c in self._aggs]
        if self._with_grouping_id:
            agg_cols = [
                F.grouping_id().cast("int").alias(self._with_grouping_id)
            ] + agg_cols
        out = grouped.agg(*agg_cols)
        for cond in self._having:
            try:
                # An unknown key/aggregate name must raise HERE, at build
                # time — the reference's compile-time `having` check.
                # Classic Spark analyzes filter() eagerly; Spark Connect is
                # lazy, so touching .schema forces analysis on both.
                filtered = out.filter(cond)
                _ = filtered.schema
                out = filtered
            except QueryBuildError:
                raise
            except Exception as e:  # AnalysisException
                declared = {n for n, _ in self._keys} | {n for n, _ in self._aggs}
                raise QueryBuildError(
                    f"having must reference declared keys/aggregates "
                    f"{sorted(declared)}: {e}"
                ) from e
        for i, cond in enumerate(self._qualify):
            # materialize the window predicate as a throwaway column:
            # Spark's filter() rejects window expressions directly.
            tmp = f"__qualify_{i}"
            out = out.withColumn(tmp, cond).filter(F.col(tmp)).drop(tmp)
        for i, (fn, order_by, partition_by, k) in enumerate(self._qualify_rank):
            if not partition_by and fn == "row_number":
                # global top-k → TakeOrderedAndProject (no global window)
                out = out.orderBy(*order_by).limit(k)
                continue
            # rank VALUE as the throwaway column so the filter is a
            # literal comparison over the Window — Catalyst pushes it
            # through the Project and inserts WindowGroupLimit.
            from pyspark.sql.window import Window as _W

            w = (
                _W.partitionBy(*partition_by).orderBy(*order_by)
                if partition_by
                else _W.orderBy(*order_by)
            )
            tmp = f"__qualify_rank_{i}"
            rank = getattr(F, fn)().over(w)
            out = out.withColumn(tmp, rank).filter(F.col(tmp) <= k).drop(tmp)
        if self._order:
            out = out.orderBy(*self._order)
        return out

    def run(self) -> list:
        return self.to_df().collect()


def _alias_of(c: Column) -> str:
    """Recover the alias of a pre-aliased Column (best effort, classic mode)."""
    s = str(c)
    # str(Column) is "Column<'expr AS name'>" — unwrap BEFORE splitting,
    # or the recovered alias keeps a trailing "'>".
    if s.startswith("Column<'") and s.endswith("'>"):
        s = s[len("Column<'") : -2]
    if " AS " in s:
        return s.rsplit(" AS ", 1)[-1].strip("'`\"")
    raise QueryBuildError(f"aggregate column must be aliased: {s}")
