"""Reference oracle: a literal reimplementation of the JEPL interpreter.

Mirrors /root/reference/eval.go + groupby.go row-for-row, including the
quirk semantics catalogued in SURVEY.md §2.9 (count counts matched rows,
missing field → 0.0 inside max/min, empty aggregates → 0.0, group keys
enumerated pre-WHERE, `true OR nil` → false, …).

Division by zero follows the reference's *actual* behavior, not its
apparent intent: in eval.go the guard ``rhs == 0`` compares an
``interface{}`` against an untyped constant 0 (dynamic type ``int``),
which never equals a ``float64`` or ``int64`` operand, so the
``return float64(0)`` is dead code on two of the three paths:

- float64 lhs ÷ 0 (any numeric rhs) → Go float division: ±Inf, or NaN
  for 0/0 (eval.go:192-200 — guard never fires)
- int64 lhs ÷ float64 0.0 → 0.0 (eval.go:227-231 — the one live path:
  the inner block shadows ``rhs`` with a typed float64 local)
- int64 lhs ÷ int64 0 → runtime panic via Go integer division
  (eval.go:267-273 — guard never fires); we raise ZeroDivisionError

This module is TEST INFRASTRUCTURE ONLY: it is the golden-output
generator that the distributed Spark plans are compared against.  It is
deliberately row-at-a-time and un-optimized.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, Optional

from .lang import ast
from .lang.parser import parse_statement
from .lang.tokens import Tok


def _json_lookup(doc: Any, segments: list[str]) -> Any:
    """jsonparser.Get semantics (eval.go:106-127): walk dotted segments;
    number → float, string → str, bool → bool, missing/object/array/null
    → None."""
    cur = doc
    for seg in segments:
        if isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        else:
            return None
    if isinstance(cur, bool):
        return cur
    if isinstance(cur, (int, float)):
        return float(cur)  # JSON numbers are always float64 (eval.go:109-111)
    if isinstance(cur, str):
        return cur
    return None


class _Acc:
    """Mutable accumulator state carried per Call (ast.go:774-781)."""

    __slots__ = ("result", "first", "count")

    def __init__(self) -> None:
        self.result = 0.0
        self.first = True
        self.count = 0


class OracleStatement:
    """One (possibly group-rewritten) statement with accumulator state."""

    def __init__(self, stmt: ast.SelectStatement, condition: ast.Expr) -> None:
        self.stmt = stmt
        self.condition = condition
        self.calls: list[ast.Call] = []
        for f in stmt.fields:
            self.calls.extend(
                n for n in ast.walk(f.expr) if isinstance(n, ast.Call)
            )
        self.accs: dict[int, _Acc] = {id(c): _Acc() for c in self.calls}

    # -- per-row accumulation (eval.go:307-365) -------------------------

    def accumulate(self, doc: Any) -> None:
        for f in self.stmt.fields:
            self._eval_fc(f.expr, doc)

    def _eval_fc(self, expr: ast.Expr, doc: Any) -> None:
        if isinstance(expr, ast.Call):
            acc = self.accs[id(expr)]
            acc.count += 1
            if expr.name in ("sum", "avg"):
                res = eval_expr(expr.args[0], doc, self.accs)
                if isinstance(res, float) and not isinstance(res, bool):
                    acc.result += res
            elif expr.name in ("max", "min"):
                res = eval_expr(expr.args[0], doc, self.accs)
                thisret = res if isinstance(res, float) and not isinstance(res, bool) else 0.0
                if acc.first:
                    acc.result = thisret
                    acc.first = False
                elif expr.name == "max" and thisret > acc.result:
                    acc.result = thisret
                elif expr.name == "min" and thisret < acc.result:
                    acc.result = thisret
            # count: only the count++ above (eval.go:316)
        elif isinstance(expr, ast.BinaryExpr):
            self._eval_fc(expr.lhs, doc)
            self._eval_fc(expr.rhs, doc)
        elif isinstance(expr, ast.ParenExpr):
            self._eval_fc(expr.expr, doc)

    # -- drain (eval.go:19-25, 70-88) ------------------------------------

    def drain(self) -> list[float]:
        return [eval_expr(f.expr, None, self.accs) for f in self.stmt.fields]


def eval_expr(
    expr: Optional[ast.Expr],
    doc: Any,
    accs: Optional[dict[int, _Acc]] = None,
) -> Any:
    """Eval (eval.go:65-132).  Returns float/str/bool/list/regex/None."""
    if expr is None:
        return None
    if isinstance(expr, ast.Call):
        acc = accs[id(expr)] if accs is not None else _Acc()
        if expr.name == "count":
            ret: Any = float(acc.count)
        else:
            ret = acc.result
            if expr.name == "avg" and acc.count > 0:
                ret = acc.result / float(acc.count)
        acc.result = 0.0
        acc.first = True
        acc.count = 0
        return ret
    if isinstance(expr, ast.BinaryExpr):
        return _eval_binary(expr, doc, accs)
    if isinstance(expr, ast.BooleanLiteral):
        return expr.val
    if isinstance(expr, ast.ListLiteral):
        return expr.vals
    if isinstance(expr, ast.IntegerLiteral):
        return expr.val  # stays python int == Go int64
    if isinstance(expr, ast.NumberLiteral):
        return expr.val
    if isinstance(expr, ast.ParenExpr):
        return eval_expr(expr.expr, doc, accs)
    if isinstance(expr, ast.RegexLiteral):
        return expr.compiled
    if isinstance(expr, ast.StringLiteral):
        return expr.val
    if isinstance(expr, ast.VarRef):
        if doc is None:
            return None
        return _json_lookup(doc, expr.segments)
    return None


def _is_float(v: Any) -> bool:
    return isinstance(v, float) and not isinstance(v, bool)


def _is_int(v: Any) -> bool:
    return isinstance(v, int) and not isinstance(v, bool)


def _in_list(val: Any, arr: Any) -> bool:
    """reflect.DeepEqual list membership (eval.go:367-382): type-strict —
    float64 never equals int64 (quirk §2.9.8)."""
    if not isinstance(arr, list):
        return False
    for item in arr:
        if _is_float(val) and _is_float(item) and val == item:
            return True
        if _is_int(val) and _is_int(item) and val == item:
            return True
        if isinstance(val, str) and isinstance(item, str) and val == item:
            return True
    return False


def _eval_binary(expr: ast.BinaryExpr, doc: Any, accs: Any) -> Any:
    """evalBinaryExpr (eval.go:134-297) with Go's typed dispatch."""
    lhs = eval_expr(expr.lhs, doc, accs)
    rhs = eval_expr(expr.rhs, doc, accs)
    op = expr.op

    if isinstance(lhs, bool):
        ok = isinstance(rhs, bool)
        if op is Tok.AND:
            return ok and (lhs and rhs)
        if op is Tok.OR:
            return ok and (lhs or rhs)
        if op is Tok.EQ:
            return ok and (lhs == rhs)
        if op is Tok.NEQ:
            return ok and (lhs != rhs)
        return None

    if _is_float(lhs):
        if op is Tok.IN:
            return _in_list(lhs, rhs)
        if op is Tok.NI:
            return not _in_list(lhs, rhs)
        ok = _is_float(rhs) or _is_int(rhs)
        rhsf = float(rhs) if ok else 0.0
        if op is Tok.EQ:
            return ok and lhs == rhsf
        if op is Tok.NEQ:
            return ok and lhs != rhsf
        if op is Tok.LT:
            return ok and lhs < rhsf
        if op is Tok.LTE:
            return ok and lhs <= rhsf
        if op is Tok.GT:
            return ok and lhs > rhsf
        if op is Tok.GTE:
            return ok and lhs >= rhsf
        if op in (Tok.ADD, Tok.SUB, Tok.MUL, Tok.DIV):
            if not ok:
                return None
            if op is Tok.ADD:
                return lhs + rhsf
            if op is Tok.SUB:
                return lhs - rhsf
            if op is Tok.MUL:
                return lhs * rhsf
            # eval.go:196: `rhs == 0` (interface vs untyped-int 0) never
            # fires for float64/int64 rhs → plain Go float division
            if rhsf == 0.0:
                if lhs == 0.0 or math.isnan(lhs):
                    return math.nan
                return math.copysign(math.inf, lhs) * math.copysign(1.0, rhsf)
            return lhs / rhsf
        return None

    if _is_int(lhs):
        if _is_float(rhs):
            lf = float(lhs)
            if op is Tok.EQ:
                return lf == rhs
            if op is Tok.NEQ:
                return lf != rhs
            if op is Tok.LT:
                return lf < rhs
            if op is Tok.LTE:
                return lf <= rhs
            if op is Tok.GT:
                return lf > rhs
            if op is Tok.GTE:
                return lf >= rhs
            if op is Tok.ADD:
                return lf + rhs
            if op is Tok.SUB:
                return lf - rhs
            if op is Tok.MUL:
                return lf * rhs
            if op is Tok.DIV:
                # eval.go:227-231: the inner block shadows `rhs` with a
                # typed float64 local, so this is the ONE path where the
                # x/0 → 0.0 guard actually fires in the reference
                if rhs == 0:
                    return 0.0
                return lf / rhs
            return None
        if op is Tok.IN:
            return _in_list(lhs, rhs)
        if op is Tok.NI:
            return not _in_list(lhs, rhs)
        ok = _is_int(rhs)
        rhsi = rhs if ok else 0
        if op is Tok.EQ:
            return ok and lhs == rhsi
        if op is Tok.NEQ:
            return ok and lhs != rhsi
        if op is Tok.LT:
            return ok and lhs < rhsi
        if op is Tok.LTE:
            return ok and lhs <= rhsi
        if op is Tok.GT:
            return ok and lhs > rhsi
        if op is Tok.GTE:
            return ok and lhs >= rhsi
        if op in (Tok.ADD, Tok.SUB, Tok.MUL, Tok.DIV):
            if not ok:
                return None
            if op is Tok.ADD:
                return lhs + rhsi
            if op is Tok.SUB:
                return lhs - rhsi
            if op is Tok.MUL:
                return lhs * rhsi
            if rhsi == 0:
                # eval.go:267-273: the `rhs == 0` guard never fires
                # (interface vs untyped-int 0), so Go executes
                # `lhs / rhsi` and PANICS on integer division by zero.
                # Documented stance: we raise instead of crashing.
                raise ZeroDivisionError(
                    "integer division by zero — the reference panics here "
                    "(eval.go:267-273)"
                )
            # Go int64 division truncates toward zero
            q = abs(lhs) // abs(rhsi)
            return q if (lhs >= 0) == (rhsi >= 0) else -q
        return None

    if isinstance(lhs, str):
        if op is Tok.IN:
            return _in_list(lhs, rhs)
        if op is Tok.NI:
            return not _in_list(lhs, rhs)
        if op is Tok.EQ:
            return isinstance(rhs, str) and lhs == rhs
        if op is Tok.NEQ:
            return isinstance(rhs, str) and lhs != rhs
        if op is Tok.EQREGEX:
            return isinstance(rhs, re.Pattern) and rhs.search(lhs) is not None
        if op is Tok.NEQREGEX:
            return isinstance(rhs, re.Pattern) and rhs.search(lhs) is None
        return None

    return None


def flat_stat_by_group(
    stmt: ast.SelectStatement, docs: list[Any]
) -> dict[str, ast.Expr]:
    """FlatStatByGroup (groupby.go:8-46): one rewritten condition per
    distinct dim-value combination, enumerated over ALL docs pre-WHERE."""
    groups: dict[str, ast.Expr] = {}
    for doc in docs:
        root: Optional[ast.BinaryExpr] = None
        for dim in stmt.dimensions:
            res = eval_expr(dim.expr, doc)
            lhs_lit: Optional[ast.Expr]
            if isinstance(res, bool):
                lhs_lit = ast.BooleanLiteral(val=res)
            elif isinstance(res, str):
                lhs_lit = ast.StringLiteral(val=res)
            elif _is_float(res):
                lhs_lit = ast.NumberLiteral(val=res)
            else:
                # groupby.go:18-34 — a missing dim crashes the reference
                raise ValueError(
                    f"group-by dimension {dim} missing from document"
                )
            rhs = ast.BinaryExpr(op=Tok.EQ, lhs=lhs_lit, rhs=dim.expr)
            if root is None:
                root = ast.BinaryExpr(
                    op=Tok.AND, lhs=ast.BooleanLiteral(val=True), rhs=rhs
                )
            else:
                root = ast.BinaryExpr(op=Tok.AND, lhs=root, rhs=rhs)
        full = ast.BinaryExpr(op=Tok.AND, lhs=root, rhs=stmt.condition)
        groups[str(full)] = full
    return groups


def eval_sql(sql: str, docs: list[Any]) -> dict[str, list[float]]:
    """EvalSQL (eval.go:28-62).  ``docs`` are parsed JSON values (dicts)
    or JSON strings.  Returns {condition-string: [metric per field]}."""
    parsed_docs = [json.loads(d) if isinstance(d, str) else d for d in docs]
    stmt = parse_statement(sql)

    if stmt.condition is None:
        # EvalSQL dereferences Condition before anything else
        # (eval.go:41 / groupby.go:36) — WHERE is effectively mandatory
        raise ValueError("WHERE is required by EvalSQL (eval.go:41)")

    if stmt.dimensions:
        stmts = {
            k: OracleStatement(stmt, cond)
            for k, cond in flat_stat_by_group(stmt, parsed_docs).items()
        }
    else:
        stmts = {str(stmt.condition): OracleStatement(stmt, stmt.condition)}

    out: dict[str, list[float]] = {}
    for key, ost in stmts.items():
        for doc in parsed_docs:
            res = _eval_condition(ost, doc)
            if res is True:
                ost.accumulate(doc)
        out[key] = ost.drain()
    return out


def _eval_condition(ost: OracleStatement, doc: Any) -> Any:
    # Condition never contains Calls (validated), so accs unused there.
    return eval_expr(ost.condition, doc, ost.accs)


def sanity() -> None:
    """Self-check against the reference's own golden anchor
    (eval_test.go:87-102): sum(tcp.in_bytes) where uid = 1 over the ten
    synthetic packetbeat docs must be 120.0 under key 'uid = 1'."""
    docs = [
        {
            "uid": i % 3,
            "tcp": {
                "src_ip": i % 2,
                "dst_ip": i % 3,
                "in_bytes": i * 10,
                "out_bytes": 20,
                "in_pkts": i,
                "out_pkts": 2,
            },
        }
        for i in range(10)
    ]
    pm = eval_sql("select sum(tcp.in_bytes) from packetbeat where uid = 1", docs)
    assert math.isclose(pm["uid = 1"][0], 120.0), pm


if __name__ == "__main__":
    sanity()
    print("oracle sanity OK")
