"""Recursive-descent parser for the JEPL rule language.

Behavior parity: /root/reference/parser.go — precedence-climbing
expression parser (parser.go:379-438), SELECT statement grammar
(parser.go:77-121), list literals (parser.go:334-376), regex operands
(parser.go:499-530), and the exact parse-error message format
(parser.go:671-690), which is a tested contract (parser_test.go:41-102).
"""

from __future__ import annotations

import re as _re
from typing import Optional

from . import ast
from .scanner import BufScanner
from .tokens import Pos, Tok, is_list_op, is_operator, is_regex_op, precedence, tokstr


class JeplParseError(Exception):
    """Parse error with the reference's message format (parser.go:685-690)."""

    def __init__(
        self,
        found: str = "",
        expected: Optional[list[str]] = None,
        pos: Optional[Pos] = None,
        message: str = "",
    ) -> None:
        self.found = found
        self.expected = expected or []
        self.pos = pos or Pos()
        self.message = message
        super().__init__(self._render())

    def _render(self) -> str:
        if self.message:
            return f"{self.message} at line {self.pos.line + 1}, char {self.pos.char + 1}"
        return (
            f"found {self.found}, expected {', '.join(self.expected)} "
            f"at line {self.pos.line + 1}, char {self.pos.char + 1}"
        )


class Parser:
    def __init__(self, text: str) -> None:
        self.s = BufScanner(text)

    # -- scanning helpers -------------------------------------------------

    def _scan(self) -> tuple[Tok, Pos, str]:
        return self.s.scan()

    def _unscan(self) -> None:
        self.s.unscan()

    def _scan_ignore_ws(self) -> tuple[Tok, Pos, str]:
        tok, pos, lit = self._scan()
        if tok is Tok.WS:
            tok, pos, lit = self._scan()
        return tok, pos, lit

    def _consume_ws(self) -> None:
        tok, _, _ = self._scan()
        if tok is not Tok.WS:
            self._unscan()

    def _peek_rune(self) -> str:
        ch, _ = self.s.s.r.read()
        self.s.s.r.unread()
        return ch

    # -- entry points ------------------------------------------------------

    def parse_statement(self) -> ast.SelectStatement:
        tok, pos, lit = self._scan_ignore_ws()
        if tok is Tok.SELECT:
            return self._parse_select_statement()
        raise JeplParseError(tokstr(tok, lit), ["SELECT"], pos)

    def _parse_select_statement(self) -> ast.SelectStatement:
        fields = self._parse_fields()

        tok, pos, lit = self._scan_ignore_ws()
        if tok is not Tok.FROM:
            raise JeplParseError(tokstr(tok, lit), ["FROM"], pos)
        sources = self._parse_sources()

        condition = self._parse_condition()
        dimensions = self._parse_dimensions()

        tok, pos, lit = self._scan_ignore_ws()
        if tok is not Tok.EOF:
            raise JeplParseError(tokstr(tok, lit), ["EOF"], pos)

        stmt = ast.SelectStatement(
            fields=fields,
            sources=sources,
            condition=condition,
            dimensions=dimensions,
        )
        stmt.is_raw_query = not any(
            isinstance(n, ast.Call) for f in fields for n in ast.walk(f.expr)
        )
        stmt.validate()
        return stmt

    # -- clause parsers ------------------------------------------------------

    def _parse_ident(self) -> str:
        tok, pos, lit = self._scan_ignore_ws()
        if tok is not Tok.IDENT:
            raise JeplParseError(tokstr(tok, lit), ["identifier"], pos)
        return lit

    def _parse_segmented_idents(self) -> list[str]:
        idents = [self._parse_ident()]
        while True:
            tok, _, _ = self._scan()
            if tok is not Tok.DOT:
                self._unscan()
                break
            idents.append(self._parse_ident())
        return idents

    def _parse_fields(self) -> list[ast.Field]:
        fields = []
        while True:
            fields.append(self._parse_field())
            tok, _, _ = self._scan()
            if tok is not Tok.COMMA:
                self._unscan()
                break
        return fields

    def _parse_field(self) -> ast.Field:
        self._scan_ignore_ws()
        self._unscan()
        expr = self.parse_expr()
        alias = self._parse_alias()
        self._consume_ws()
        return ast.Field(expr=expr, alias=alias)

    def _parse_alias(self) -> str:
        tok, _, _ = self._scan_ignore_ws()
        if tok is not Tok.AS:
            self._unscan()
            return ""
        return self._parse_ident()

    def _parse_sources(self) -> list[ast.Measurement]:
        sources = []
        while True:
            sources.append(ast.Measurement(database=self._parse_ident()))
            tok, _, _ = self._scan_ignore_ws()
            if tok is not Tok.COMMA:
                self._unscan()
                break
        return sources

    def _parse_condition(self) -> Optional[ast.Expr]:
        tok, _, _ = self._scan_ignore_ws()
        if tok is not Tok.WHERE:
            self._unscan()
            return None
        return self.parse_expr()

    def _parse_dimensions(self) -> list[ast.Dimension]:
        tok, _, _ = self._scan_ignore_ws()
        if tok is not Tok.GROUP:
            self._unscan()
            return []
        tok, pos, lit = self._scan_ignore_ws()
        if tok is not Tok.BY:
            raise JeplParseError(tokstr(tok, lit), ["BY"], pos)
        dims = []
        while True:
            dims.append(self._parse_dimension())
            tok, _, _ = self._scan()
            if tok is not Tok.COMMA:
                self._unscan()
                break
        return dims

    def _parse_dimension(self) -> ast.Dimension:
        re_lit = self._parse_regex()
        if re_lit is not None:
            return ast.Dimension(expr=re_lit)
        expr = self.parse_expr()
        self._consume_ws()
        return ast.Dimension(expr=expr)

    # -- expressions -----------------------------------------------------------

    def parse_expr(self) -> ast.Expr:
        """Precedence climbing over a right-spine of BinaryExprs
        (parser.go:379-438)."""
        root = ast.BinaryExpr(op=Tok.ILLEGAL, lhs=None, rhs=None)  # dummy root
        root.rhs = self._parse_unary_expr()

        while True:
            op, _, _ = self._scan_ignore_ws()
            if not is_operator(op):
                self._unscan()
                return root.rhs

            if is_regex_op(op):
                self._consume_ws()
                rhs = self._parse_regex()
                if rhs is None:
                    tok, pos, lit = self._scan_ignore_ws()
                    raise JeplParseError(tokstr(tok, lit), ["regex"], pos)
            elif is_list_op(op):
                self._consume_ws()
                rhs = self._parse_list()
            else:
                rhs = self._parse_unary_expr()

            node = root
            while True:
                r = node.rhs
                if not isinstance(r, ast.BinaryExpr) or precedence(r.op) >= precedence(op):
                    node.rhs = ast.BinaryExpr(op=op, lhs=node.rhs, rhs=rhs)
                    break
                node = r

    def _parse_unary_expr(self) -> ast.Expr:
        tok, _, _ = self._scan_ignore_ws()
        if tok is Tok.LPAREN:
            expr = self.parse_expr()
            tok, pos, lit = self._scan_ignore_ws()
            if tok is not Tok.RPAREN:
                raise JeplParseError(tokstr(tok, lit), [")"], pos)
            return ast.ParenExpr(expr=expr)
        self._unscan()

        tok, pos, lit = self._scan_ignore_ws()
        if tok is Tok.IDENT:
            tok0, _, _ = self._scan()
            if tok0 is Tok.LPAREN:
                return self._parse_call(lit)
            self._unscan()  # the non-LPAREN token
            self._unscan()  # the IDENT token
            return self._parse_var_ref()
        if tok is Tok.STRING:
            return ast.StringLiteral(val=lit)
        if tok is Tok.NUMBER:
            try:
                v = float(lit)
            except ValueError:
                raise JeplParseError(message="unable to parse number", pos=pos)
            return ast.NumberLiteral(val=v)
        if tok is Tok.INTEGER:
            try:
                v = int(lit)
            except ValueError:
                raise JeplParseError(message="unable to parse integer", pos=pos)
            return ast.IntegerLiteral(val=v)
        if tok in (Tok.TRUE, Tok.FALSE):
            return ast.BooleanLiteral(val=tok is Tok.TRUE)
        if tok is Tok.REGEX:
            return self._compile_regex(lit, pos)
        raise JeplParseError(
            tokstr(tok, lit), ["identifier", "string", "number", "bool"], pos
        )

    def _parse_var_ref(self) -> ast.VarRef:
        segments = self._parse_segmented_idents()
        return ast.VarRef(val=".".join(segments), segments=segments)

    def _parse_list(self) -> ast.ListLiteral:
        tok, pos, lit = self._scan_ignore_ws()
        if tok is not Tok.LBRACKET:
            self._unscan()
            raise JeplParseError(tokstr(tok, lit), ["["], pos)
        vals: list = []
        while True:
            tok, pos, lit = self._scan_ignore_ws()
            if tok is Tok.STRING:
                vals.append(lit)
            elif tok is Tok.NUMBER:
                try:
                    vals.append(float(lit))
                except ValueError:
                    raise JeplParseError(message="unable to parse number", pos=pos)
            elif tok is Tok.INTEGER:
                try:
                    vals.append(int(lit))
                except ValueError:
                    raise JeplParseError(message="unable to parse integer", pos=pos)
            else:
                self._unscan()
                raise JeplParseError(
                    tokstr(tok, lit), ["string", "float", "integer"], pos
                )
            tok, _, _ = self._scan_ignore_ws()
            if tok is not Tok.COMMA:
                self._unscan()
                break
        tok, pos, lit = self._scan_ignore_ws()
        if tok is not Tok.RBRACKET:
            self._unscan()
            raise JeplParseError(tokstr(tok, lit), ["]"], pos)
        return ast.ListLiteral(vals=vals)

    def _parse_regex(self) -> Optional[ast.RegexLiteral]:
        if self._peek_rune() in (" ", "\t", "\n"):
            self._consume_ws()
        if self._peek_rune() != "/":
            return None
        tok, pos, lit = self.s.scan_regex()
        if tok is Tok.BADESCAPE:
            raise JeplParseError(message=f"bad escape: {lit}", pos=pos)
        if tok is Tok.BADREGEX:
            raise JeplParseError(message=f"bad regex: {lit}", pos=pos)
        if tok is not Tok.REGEX:
            raise JeplParseError(tokstr(tok, lit), ["regex"], pos)
        return self._compile_regex(lit, pos)

    @staticmethod
    def _outside_common_regex_dialect(lit: str) -> bool:
        """Constructs outside the RE2 ∩ Python ∩ Java-regex common
        subset: lookaround and backreferences (RE2 rejects them at
        parse, parser.go:488-493), named groups (the two syntaxes are
        mutually unsupported between RE2/Python and Java), POSIX
        classes ``[[:alpha:]]`` (valid RE2/Java atoms that Python re
        silently parses as a literal character class), and ``\\Z``
        (absolute end-of-string in Python, end-before-final-newline in
        Java).  Escape sequences are tracked so ``\\\\1`` (literal
        backslash + digit) is not misread as a backreference.  Escapes
        Python re rejects outright (``\\p{...}``, ``\\z``, ``\\e``) need
        no gate — compilation below fails loudly for both engine and
        oracle.  Known residual: ``\\d``/``\\w``/``\\s`` are ASCII in
        RE2/Java but Unicode-aware in Python; corpus data is ASCII."""
        escaped = False
        i = 0
        while i < len(lit):
            ch = lit[i]
            if escaped:
                if ch.isdigit() and ch != "0":
                    return True  # backreference \1-\9
                if ch == "Z":
                    return True  # \Z semantics differ Python vs Java
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == "(" and lit[i + 1 : i + 2] == "?":
                nxt = lit[i + 2 : i + 3]
                if nxt in ("=", "!", "P", "<"):
                    return True  # lookaround / named group
            elif ch == "[" and lit[i + 1 : i + 2] == ":":
                # POSIX class atom [:name:] (conservative: rejected in
                # any position — engines disagree on its meaning)
                j = lit.find(":]", i + 2)
                if j != -1 and lit[i + 2 : j].lstrip("^").isalpha():
                    return True
            i += 1
        return False

    @classmethod
    def _compile_regex(cls, lit: str, pos: Pos) -> ast.RegexLiteral:
        if cls._outside_common_regex_dialect(lit):
            raise JeplParseError(
                message=(
                    "error parsing regexp: invalid or unsupported Perl "
                    f"syntax: `{lit}`"
                ),
                pos=pos,
            )
        try:
            compiled = _re.compile(lit)
        except _re.error as exc:
            raise JeplParseError(message=str(exc), pos=pos)
        return ast.RegexLiteral(pattern=lit, compiled=compiled)

    def _parse_call(self, name: str) -> ast.Call:
        """Function name + LPAREN already consumed (parser.go:532-588)."""
        name = name.lower()
        args: list[ast.Expr] = []

        re_lit = self._parse_regex()
        if re_lit is not None:
            args.append(re_lit)
        else:
            tok, _, _ = self._scan()
            if tok is Tok.RPAREN:
                return ast.Call(name=name, args=[])
            self._unscan()
            args.append(self.parse_expr())

        while True:
            tok, _, _ = self._scan_ignore_ws()
            if tok is not Tok.COMMA:
                self._unscan()
                break
            re_lit = self._parse_regex()
            if re_lit is not None:
                args.append(re_lit)
                continue
            args.append(self.parse_expr())

        tok, pos, lit = self._scan()
        if tok is not Tok.RPAREN:
            raise JeplParseError(tokstr(tok, lit), [")"], pos)
        return ast.Call(name=name, args=args)


def parse_statement(text: str) -> ast.SelectStatement:
    """Parse + validate one JEPL SELECT statement."""
    return Parser(text).parse_statement()


def parse_expr(text: str) -> ast.Expr:
    """Parse a bare expression (for tests and the expression oracle)."""
    return Parser(text).parse_expr()
