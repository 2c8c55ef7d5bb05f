"""ColumnExpression: the reference's delayed column-transform chain
(/root/reference/splink/internals/column_expression.py:23-365) re-expressed
as a thin builder over pyspark Columns. Each transform maps 1:1 onto a
native function (dialects.py:352-385):

    ColumnExpression("email").lower().regex_extract(r"@(.+)$", 1)
        -> F.regexp_extract(F.lower(F.col("email")), r"@(.+)$", 1)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from collections.abc import Callable

from pyspark.sql import Column, functions as F


@dataclass(frozen=True)
class ColumnExpression:
    name: str
    _ops: tuple[Callable[[Column], Column], ...] = field(default=())

    def _chain(self, fn: Callable[[Column], Column]) -> "ColumnExpression":
        return replace(self, _ops=self._ops + (fn,))

    def lower(self) -> "ColumnExpression":
        return self._chain(F.lower)

    def substr(self, start: int, length: int) -> "ColumnExpression":
        return self._chain(lambda c: F.substring(c, start, length))

    def cast_to_string(self) -> "ColumnExpression":
        return self._chain(lambda c: c.cast("string"))

    def regex_extract(self, pattern: str, capture_group: int = 0
                      ) -> "ColumnExpression":
        return self._chain(lambda c: F.regexp_extract(c, pattern, capture_group))

    def try_parse_date(self, fmt: str | None = None) -> "ColumnExpression":
        return self._chain(lambda c: F.to_date(c, fmt) if fmt else F.to_date(c))

    def try_parse_timestamp(self, fmt: str | None = None) -> "ColumnExpression":
        return self._chain(
            lambda c: F.to_timestamp(c, fmt) if fmt else F.to_timestamp(c))

    def nullif(self, value: str) -> "ColumnExpression":
        return self._chain(lambda c: F.nullif(c, F.lit(value)))

    def access_extreme_array_element(self, first: bool = True
                                     ) -> "ColumnExpression":
        sorted_ = lambda c: F.sort_array(c)
        if first:
            return self._chain(lambda c: F.element_at(sorted_(c), 1))
        return self._chain(lambda c: F.element_at(sorted_(c), -1))

    def to_column(self, suffix: str = "") -> Column:
        c: Column = F.col(f"{self.name}{suffix}")
        for op in self._ops:
            c = op(c)
        return c

    def apply(self, col: Column) -> Column:
        for op in self._ops:
            col = op(col)
        return col
