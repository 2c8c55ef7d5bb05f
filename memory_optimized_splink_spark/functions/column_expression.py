"""ColumnExpression: the reference's delayed column-transform chain
(/root/reference/splink/internals/column_expression.py:23-365) re-expressed
as a thin builder over pyspark Columns. Each transform maps 1:1 onto a
native function (dialects.py:352-385):

    ColumnExpression("email").lower().regex_extract(r"@(.+)$", 1)
        -> F.regexp_extract(F.lower(F.col("email")), r"@(.+)$", 1)

Each transform also records its Spark SQL text, so an expression can be
rendered into level SQL (`sql_expression("email_l")`) — that is how the
comparison/level libraries accept a ColumnExpression where the reference
does (creator classes render the expression into each level's SQL,
column_expression.py:110-113)."""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from collections.abc import Callable

from pyspark.sql import Column, functions as F


def _sq(s: str) -> str:
    """Single-quote a SQL string literal. Spark's parser unescapes string
    literals (escapedStringLiterals=false by default), so backslashes —
    ubiquitous in regex patterns like \\d and \\w — must be doubled or the
    rendered SQL silently corrupts the pattern."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


@dataclass(frozen=True)
class _Op:
    name: str
    fn: Callable[[Column], Column]
    sql: Callable[[str], str]


@dataclass(frozen=True)
class ColumnExpression:
    name: str
    _ops: tuple[_Op, ...] = field(default=())

    @staticmethod
    def instantiate_if_str(col) -> "ColumnExpression":
        """Reference column_expression.py:59-65."""
        return ColumnExpression(col) if isinstance(col, str) else col

    def _chain(self, name: str, fn: Callable[[Column], Column],
               sql: Callable[[str], str]) -> "ColumnExpression":
        return replace(self, _ops=self._ops + (_Op(name, fn, sql),))

    def lower(self) -> "ColumnExpression":
        return self._chain("lower", F.lower, lambda s: f"lower({s})")

    def substr(self, start: int, length: int) -> "ColumnExpression":
        return self._chain(
            "substr", lambda c: F.substring(c, start, length),
            lambda s: f"substring({s}, {int(start)}, {int(length)})")

    def cast_to_string(self) -> "ColumnExpression":
        return self._chain("cast_to_string", lambda c: c.cast("string"),
                           lambda s: f"CAST({s} AS STRING)")

    def regex_extract(self, pattern: str, capture_group: int = 0
                      ) -> "ColumnExpression":
        return self._chain(
            "regex_extract",
            lambda c: F.regexp_extract(c, pattern, capture_group),
            lambda s: (f"regexp_extract({s}, {_sq(pattern)}, "
                       f"{int(capture_group)})"))

    def try_parse_date(self, fmt: str | None = None) -> "ColumnExpression":
        return self._chain(
            "try_parse_date",
            lambda c: F.to_date(c, fmt) if fmt else F.to_date(c),
            lambda s: (f"to_date({s}, {_sq(fmt)})" if fmt
                       else f"to_date({s})"))

    def try_parse_timestamp(self, fmt: str | None = None
                            ) -> "ColumnExpression":
        return self._chain(
            "try_parse_timestamp",
            lambda c: F.to_timestamp(c, fmt) if fmt else F.to_timestamp(c),
            lambda s: (f"to_timestamp({s}, {_sq(fmt)})" if fmt
                       else f"to_timestamp({s})"))

    def nullif(self, value: str) -> "ColumnExpression":
        return self._chain(
            "nullif", lambda c: F.nullif(c, F.lit(value)),
            lambda s: f"nullif({s}, {_sq(value)})")

    def access_extreme_array_element(self, first: bool = True
                                     ) -> "ColumnExpression":
        idx = 1 if first else -1
        return self._chain(
            "access_extreme_array_element",
            lambda c: F.element_at(F.sort_array(c), idx),
            lambda s: f"element_at(sort_array({s}), {idx})")

    # ------------------------------------------------------------ output
    @property
    def is_pure_column(self) -> bool:
        return not self._ops

    @property
    def output_column_name(self) -> str:
        """Deterministic name for the transformed column (reference uses
        the raw name for pure columns and a transform-derived label
        otherwise)."""
        if not self._ops:
            return self.name
        return "_".join([self.name] + [op.name for op in self._ops])

    def sql_expression(self, column_sql: str | None = None) -> str:
        """The chain as a Spark SQL expression string over `column_sql`
        (defaults to the bare column name) — used to render levels the way
        the reference's creator classes do."""
        s = column_sql if column_sql is not None else self.name
        for op in self._ops:
            s = op.sql(s)
        return s

    def to_column(self, suffix: str = "") -> Column:
        c: Column = F.col(f"{self.name}{suffix}")
        for op in self._ops:
            c = op.fn(c)
        return c

    def apply(self, col: Column) -> Column:
        for op in self._ops:
            col = op.fn(col)
        return col
