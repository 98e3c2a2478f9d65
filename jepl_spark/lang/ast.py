"""AST node types, rendering, and validation for the JEPL rule language.

Semantics parity: /root/reference/ast.go.  Validation error strings are a
tested contract of the reference (parser_test.go:64-102) and are
reproduced verbatim.  Rendering (``str(node)``) is load-bearing: the
reference keys grouped output by the *string form* of the rewritten
WHERE condition (groupby.go:36-37), and our golden-fixture oracle
reproduces those keys.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field as _dc_field
from typing import Iterator, Optional, Union

from .tokens import Tok, lookup

# --------------------------------------------------------------------------
# quoting helpers (parser.go:612-661)


def quote_string(s: str) -> str:
    out = []
    for ch in s:
        if ch == "\n":
            out.append("\\n")
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "'":
            out.append("\\'")
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


def _quote_ident_segment(s: str) -> str:
    out = []
    for ch in s:
        if ch == "\n":
            out.append("\\n")
        elif ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        else:
            out.append(ch)
    return "".join(out)


def ident_needs_quotes(ident: str) -> bool:
    from .scanner import is_ident_char, is_ident_first_char

    if lookup(ident) is not Tok.IDENT:
        return True
    for i, ch in enumerate(ident):
        if i == 0 and not is_ident_first_char(ch):
            return True
        if i > 0 and not is_ident_char(ch):
            return True
    return False


def quote_ident(*segments: str) -> str:
    parts = []
    for i, segment in enumerate(segments):
        need = ident_needs_quotes(segment) or (i < len(segments) - 1 and segment != "")
        body = _quote_ident_segment(segment)
        parts.append(f'"{body}"' if need else body)
    return ".".join(parts)


# --------------------------------------------------------------------------
# expression nodes


class Expr:
    """Base class for expression nodes."""


@dataclass
class VarRef(Expr):
    val: str
    segments: list[str] = _dc_field(default_factory=list)

    def __str__(self) -> str:
        return self.val


@dataclass
class IntegerLiteral(Expr):
    val: int

    def __str__(self) -> str:
        return f"{self.val}"


@dataclass
class NumberLiteral(Expr):
    val: float

    def __str__(self) -> str:
        # ast.go:842 — fixed 3 decimals
        return f"{self.val:.3f}"


@dataclass
class StringLiteral(Expr):
    val: str

    def __str__(self) -> str:
        return quote_string(self.val)


@dataclass
class BooleanLiteral(Expr):
    val: bool

    def __str__(self) -> str:
        return "true" if self.val else "false"


@dataclass
class RegexLiteral(Expr):
    pattern: str  # raw pattern text between the '/' delimiters
    compiled: "_re.Pattern[str]" = None  # type: ignore[assignment]

    def __str__(self) -> str:
        return "/" + self.pattern.replace("/", "\\/") + "/"


@dataclass
class ListLiteral(Expr):
    vals: list[Union[str, float, int]] = _dc_field(default_factory=list)

    def __str__(self) -> str:
        parts = []
        for v in self.vals:
            if isinstance(v, str):
                parts.append(quote_ident(v))
            elif isinstance(v, bool):  # not produced by parser
                parts.append(str(v).lower())
            elif isinstance(v, int):
                parts.append(f"{v}")
            else:
                parts.append(f"{v:f}")
        return "[" + ", ".join(parts) + "]"


@dataclass
class BinaryExpr(Expr):
    op: Tok
    lhs: Expr
    rhs: Expr

    def __str__(self) -> str:
        return f"{self.lhs} {self.op} {self.rhs}"


@dataclass
class ParenExpr(Expr):
    expr: Expr

    def __str__(self) -> str:
        return f"({self.expr})"


@dataclass
class Call(Expr):
    name: str
    args: list[Expr] = _dc_field(default_factory=list)

    def __str__(self) -> str:
        return f"{self.name}({', '.join(str(a) for a in self.args)})"


@dataclass
class Measurement:
    database: str

    def __str__(self) -> str:
        return self.database


@dataclass
class Field:
    expr: Expr
    alias: str = ""

    def name(self) -> str:
        """Alias > call name > binary-concat > var name (ast.go:716-737)."""
        if self.alias:
            return self.alias
        e = self.expr
        if isinstance(e, Call):
            return e.name
        if isinstance(e, BinaryExpr):
            return binary_expr_name(e)
        if isinstance(e, ParenExpr):
            return Field(expr=e.expr).name()
        if isinstance(e, VarRef):
            return e.val
        return ""

    def __str__(self) -> str:
        if not self.alias:
            return str(self.expr)
        return f"{self.expr} AS {quote_ident(self.alias)}"


@dataclass
class Dimension:
    expr: Expr

    def __str__(self) -> str:
        return str(self.expr)


@dataclass
class SelectStatement:
    fields: list[Field]
    sources: list[Measurement]
    condition: Optional[Expr] = None
    dimensions: list[Dimension] = _dc_field(default_factory=list)
    is_raw_query: bool = False

    def __str__(self) -> str:
        buf = "SELECT " + ", ".join(str(f) for f in self.fields)
        if self.sources:
            buf += " FROM " + ", ".join(str(s) for s in self.sources)
        if self.condition is not None:
            buf += " WHERE " + str(self.condition)
        if self.dimensions:
            buf += " GROUP BY " + ", ".join(str(d) for d in self.dimensions)
        return buf

    # -- column naming (ast.go:291-336) --------------------------------

    def column_names(self) -> list[str]:
        cols = list(self.fields)
        names: dict[str, int] = {}
        out: list[Optional[str]] = [None] * len(cols)
        for i, col in enumerate(cols):
            if col.alias:
                out[i] = col.alias
                names[col.alias] = 1
        for i, col in enumerate(cols):
            if out[i] is not None:
                continue
            name = col.name()
            if name in names:
                count = names[name]
                while True:
                    resolved = f"{name}_{count}"
                    if resolved not in names:
                        names[name] = count + 1
                        name = resolved
                        break
                    count += 1
            names[name] = names.get(name, 0) + 1
            out[i] = name
        return [n for n in out if n is not None]

    # -- validation (ast.go:359-512) ------------------------------------

    def validate(self) -> None:
        self._validate_fields()
        self._validate_aggregates()
        self._validate_conditions()

    def _validate_fields(self) -> None:
        for f in self.fields:
            bad = _find_invalid_select_op(f.expr)
            if bad is not None:
                raise JeplValidationError(
                    f"invalid operator {bad} in SELECT field, only support +-*/"
                )
            e = f.expr
            if isinstance(e, BinaryExpr):
                _validate_no_mixing(e)
            elif isinstance(e, (ParenExpr, Call)):
                pass
            else:
                raise JeplValidationError(
                    f"invalid field {e} in SELECT field, at least one function"
                )

    def _valid_select_with_aggregate(self) -> None:
        calls: set[str] = set()
        num_aggregates = 0
        for f in self.fields:
            field_calls = walk_function_calls(f.expr)
            for c in field_calls:
                calls.add(c.name)
            if field_calls:
                num_aggregates += 1
        only_selectors = all(
            k in ("top", "bottom", "max", "min", "first", "last", "percentile", "sample")
            for k in calls
        )
        if only_selectors:
            if num_aggregates == 1:
                return
            if num_aggregates > 1 and len(self.fields) != num_aggregates:
                raise JeplValidationError(
                    "mixing multiple selector functions with tags or fields is not supported"
                )
        if num_aggregates != 0 and num_aggregates != len(self.fields):
            raise JeplValidationError(
                "mixing aggregate and non-aggregate queries is not supported"
            )

    def _validate_aggregates(self) -> None:
        for f in self.fields:
            for expr in walk_function_calls(f.expr):
                self._valid_select_with_aggregate()
                if len(expr.args) != 1:
                    raise JeplValidationError(
                        f"invalid number of arguments for {expr.name}, "
                        f"expected 1, got {len(expr.args)}"
                    )
                if expr.name == "count" and not isinstance(expr.args[0], VarRef):
                    raise JeplValidationError(
                        "expected only field argument in count()"
                    )
                arg0 = expr.args[0]
                if isinstance(arg0, VarRef):
                    pass
                elif isinstance(arg0, BinaryExpr):
                    _validate_agg_args(arg0)
                else:
                    raise JeplValidationError(
                        f"expected field argument in {expr.name}()"
                    )

    def _validate_conditions(self) -> None:
        if self.condition is not None:
            _validate_condition(self.condition, None)


class JeplValidationError(Exception):
    """Statement failed semantic validation (analyzer layer)."""


# --------------------------------------------------------------------------
# walkers


def walk(expr: Optional[Expr]) -> Iterator[Expr]:
    """Depth-first pre-order traversal (ast.go:1038-1084)."""
    if expr is None:
        return
    yield expr
    if isinstance(expr, BinaryExpr):
        yield from walk(expr.lhs)
        yield from walk(expr.rhs)
    elif isinstance(expr, Call):
        for a in expr.args:
            yield from walk(a)
    elif isinstance(expr, ParenExpr):
        yield from walk(expr.expr)


def walk_function_calls(expr: Expr) -> list[Call]:
    """Top-level calls in the tree; does not descend into call args
    (ast.go:605-621)."""
    if isinstance(expr, Call):
        return [expr]
    if isinstance(expr, BinaryExpr):
        return walk_function_calls(expr.lhs) + walk_function_calls(expr.rhs)
    if isinstance(expr, ParenExpr):
        return walk_function_calls(expr.expr)
    return []


def walk_refs(expr: Expr) -> list[VarRef]:
    """All VarRefs, including direct call args (ast.go:560-584)."""
    if isinstance(expr, VarRef):
        return [expr]
    if isinstance(expr, Call):
        return [a for a in expr.args if isinstance(a, VarRef)]
    if isinstance(expr, BinaryExpr):
        return walk_refs(expr.lhs) + walk_refs(expr.rhs)
    if isinstance(expr, ParenExpr):
        return walk_refs(expr.expr)
    return []


def walk_names(expr: Expr) -> list[str]:
    return [r.val for r in walk_refs(expr)]


def binary_expr_name(expr: BinaryExpr) -> str:
    """Concatenate VarRef/Call names with underscores (ast.go:987-1008);
    does not descend into call args."""
    names: list[str] = []

    def visit(e: Expr) -> None:
        if isinstance(e, VarRef):
            names.append(e.val)
        elif isinstance(e, Call):
            names.append(e.name)
        elif isinstance(e, BinaryExpr):
            visit(e.lhs)
            visit(e.rhs)
        elif isinstance(e, ParenExpr):
            visit(e.expr)

    visit(expr)
    return "_".join(names)


# --------------------------------------------------------------------------
# validation internals


_INVALID_SELECT_OPS = (
    Tok.EQ, Tok.NEQ, Tok.EQREGEX, Tok.NEQREGEX, Tok.LT, Tok.LTE,
    Tok.GT, Tok.GTE, Tok.AND, Tok.OR, Tok.IN, Tok.NI,
)


def _find_invalid_select_op(expr: Expr) -> Optional[Tok]:
    """First boolean-returning operator in the field tree (parser.go:174-192)."""
    for node in walk(expr):
        if isinstance(node, BinaryExpr) and node.op in _INVALID_SELECT_OPS:
            return node.op
    return None


class _MixValidator:
    """binaryExprValidator (ast.go:958-985): records whether the tree has
    calls and/or raw refs; validates nested binary call-args eagerly."""

    def __init__(self) -> None:
        self.calls = False
        self.refs = False

    def visit(self, expr: Expr) -> None:
        if isinstance(expr, Call):
            self.calls = True
            for a in expr.args:
                if isinstance(a, BinaryExpr):
                    _validate_no_mixing(a)
                    return
            return  # do not descend into call args
        if isinstance(expr, VarRef):
            self.refs = True
            return
        if isinstance(expr, BinaryExpr):
            self.visit(expr.lhs)
            self.visit(expr.rhs)
        elif isinstance(expr, ParenExpr):
            self.visit(expr.expr)


def _validate_no_mixing(e: BinaryExpr) -> None:
    v = _MixValidator()
    v.visit(e)
    if v.calls and v.refs:
        raise JeplValidationError(
            "binary expressions cannot mix aggregates and raw fields"
        )


def _validate_agg_args(e: BinaryExpr) -> None:
    v = _MixValidator()
    v.visit(e)
    if v.calls:
        raise JeplValidationError("argument binary expressions cannot mix function")
    if not v.refs:
        raise JeplValidationError("argument binary expressions at least one key")


def _validate_condition(expr: Expr, op: Optional[Tok]) -> None:
    """validateCondition (ast.go:384-417)."""
    if isinstance(expr, Call):
        raise JeplValidationError(f"invalid filter, unsupport function {expr}")
    if isinstance(expr, BinaryExpr):
        _validate_condition(expr.lhs, expr.op)
        _validate_condition(expr.rhs, expr.op)
        return
    if isinstance(expr, ParenExpr):
        _validate_condition(expr.expr, None)
        return
    if isinstance(expr, RegexLiteral):
        if op not in (Tok.EQREGEX, Tok.NEQREGEX):
            opname = str(op) if op is not None else "ILLEGAL"
            raise JeplValidationError(
                f"invalid filter, unsupport op {opname} for regex"
            )
        return
    if isinstance(expr, StringLiteral):
        if op in (Tok.LT, Tok.LTE, Tok.GT, Tok.GTE, Tok.SUB, Tok.MUL, Tok.DIV, Tok.ADD):
            raise JeplValidationError(
                f"invalid filter, unsupport op {op} for string"
            )
        return
