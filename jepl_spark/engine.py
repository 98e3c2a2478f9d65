"""JeplEngine — the user-facing entry point for batch JEPL queries.

The reference's entry point is ``EvalSQL(sql, docs)`` (eval.go:28-62),
which ignores the FROM clause and evaluates over an in-memory doc batch.
Here FROM is made real: a catalog maps source names to DataFrames,
parquet paths, or saved tables; the compiled plan is pure DataFrame API
(see compiler/select.py).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame, SparkSession

from .compiler.expr import JeplCompileError
from .compiler.select import compile_select
from .lang import ast
from .lang.parser import parse_statement


class JeplEngine:
    def __init__(
        self,
        spark: SparkSession,
        tables: Union[dict[str, Union[DataFrame, str]], None] = None,
        non_null: Union[dict[str, set], None] = None,
        nan_cols: Union[dict[str, set], None] = None,
    ) -> None:
        """``non_null``: per-table sets of dotted column names declared
        never-null (data contract).  Spark relaxes parquet read schemas
        to all-nullable, so this is the handle that lets OR-predicates
        over required columns compile guard-free and push into the
        scan (see compiler.expr.ExprCompiler).

        ``nan_cols``: per-table sets of float column names declared as
        possibly holding stored IEEE NaN.  The default data contract is
        NaN-free floats (the reference ingests JSON, which cannot encode
        NaN) — but parquet CAN store NaN in a double column; declare such
        columns here to get the reference's IEEE comparison semantics
        (NaN op x → false, != → true) at the cost of a per-comparison
        guard on that column (see compiler.expr.ExprCompiler)."""
        self.spark = spark
        self.tables = dict(tables or {})
        self.non_null = {k: frozenset(v) for k, v in (non_null or {}).items()}
        self.nan_cols = {k: frozenset(v) for k, v in (nan_cols or {}).items()}

    def register(self, name: str, source: Union[DataFrame, str]) -> None:
        self.tables[name] = source

    def table(self, name: str) -> DataFrame:
        src = self.tables.get(name)
        if src is None:
            # fall back to the session catalog (temp views, saved tables)
            return self.spark.table(name)
        if isinstance(src, DataFrame):
            return src
        if isinstance(src, str):
            if src.endswith(".parquet") or "/" in src:
                return self.spark.read.parquet(src)
            return self.spark.table(src)
        raise JeplCompileError(f"unresolvable source {name!r}")

    def sql(self, text: str) -> DataFrame:
        """Parse, validate, resolve FROM, compile → DataFrame."""
        stmt = parse_statement(text)
        return self.compile(stmt)

    def compile(self, stmt: ast.SelectStatement) -> DataFrame:
        if not stmt.sources:
            raise JeplCompileError("statement has no FROM source")
        name = stmt.sources[0].database
        df = self.table(name)
        return compile_select(
            stmt, df,
            non_null=self.non_null.get(name, frozenset()),
            nan_cols=self.nan_cols.get(name, frozenset()),
        )

    def sql_on(self, text: str, df: DataFrame) -> DataFrame:
        """Compile a rule against an explicit DataFrame (FROM name is
        accepted but overridden — mirrors the reference, which parses
        FROM and then evaluates whatever batch it is handed)."""
        stmt = parse_statement(text)
        return compile_select(stmt, df)

    def sql_stream(
        self,
        text: str,
        source: DataFrame,
        *,
        ts_col: str,
        duration: str,
        slide: Union[str, None] = None,
        session_gap: Union[str, None] = None,
        watermark: Union[str, None] = "0 seconds",
        non_null=frozenset(),
    ) -> DataFrame:
        """Compile a rule into an event-time-windowed aggregation over a
        (streaming or static) DataFrame — the streaming front door.
        Start it with ``.writeStream`` (see streaming/engine.py for the
        exactly-once sink wiring)."""
        from .streaming.windows import windowed_select

        stmt = parse_statement(text)
        return windowed_select(
            stmt, source, ts_col=ts_col, duration=duration, slide=slide,
            session_gap=session_gap, watermark=watermark, non_null=non_null,
        )
