"""Token definitions for the JEPL rule language.

Semantics parity: /root/reference/token.go (token enum, keyword table,
operator precedence).  This is a from-scratch Python implementation —
the token *set* and *precedence table* are part of the language contract
(token.go:11-70, token.go:146-162); the code is new.
"""

from __future__ import annotations

import enum


class Tok(enum.Enum):
    ILLEGAL = "ILLEGAL"
    EOF = "EOF"
    WS = "WS"

    # literals
    IDENT = "IDENT"
    NUMBER = "NUMBER"
    INTEGER = "INTEGER"
    STRING = "STRING"
    BADSTRING = "BADSTRING"
    BADESCAPE = "BADESCAPE"
    TRUE = "TRUE"
    FALSE = "FALSE"
    REGEX = "REGEX"
    BADREGEX = "BADREGEX"

    # operators
    ADD = "+"
    SUB = "-"
    MUL = "*"
    DIV = "/"
    MOD = "%"
    AND = "AND"
    OR = "OR"
    NI = "NI"
    IN = "IN"
    EQ = "="
    NEQ = "!="
    EQREGEX = "=~"
    NEQREGEX = "!~"
    LT = "<"
    LTE = "<="
    GT = ">"
    GTE = ">="

    LBRACKET = "["
    LPAREN = "("
    RBRACKET = "]"
    RPAREN = ")"
    COMMA = ","
    DOT = "."

    # keywords
    ALL = "ALL"
    AS = "AS"
    FROM = "FROM"
    SELECT = "SELECT"
    WHERE = "WHERE"
    GROUP = "GROUP"
    BY = "BY"

    def __str__(self) -> str:  # token.go:138-143
        return self.value


_OPERATORS = {
    Tok.ADD, Tok.SUB, Tok.MUL, Tok.DIV, Tok.MOD,
    Tok.AND, Tok.OR, Tok.NI, Tok.IN,
    Tok.EQ, Tok.NEQ, Tok.EQREGEX, Tok.NEQREGEX,
    Tok.LT, Tok.LTE, Tok.GT, Tok.GTE,
}

# Precedence table — token.go:146-162.
_PRECEDENCE = {
    Tok.OR: 1,
    Tok.AND: 2,
    Tok.IN: 3,
    Tok.NI: 3,
    Tok.EQ: 4, Tok.NEQ: 4, Tok.EQREGEX: 4, Tok.NEQREGEX: 4,
    Tok.LT: 4, Tok.LTE: 4, Tok.GT: 4, Tok.GTE: 4,
    Tok.ADD: 5, Tok.SUB: 5,
    Tok.MUL: 6, Tok.DIV: 6, Tok.MOD: 6,
}

# Keyword lookup — token.go:123-135 (case-insensitive).
KEYWORDS = {
    "all": Tok.ALL, "as": Tok.AS, "from": Tok.FROM, "select": Tok.SELECT,
    "where": Tok.WHERE, "group": Tok.GROUP, "by": Tok.BY,
    "and": Tok.AND, "or": Tok.OR, "in": Tok.IN, "ni": Tok.NI,
    "true": Tok.TRUE, "false": Tok.FALSE,
}


def is_operator(tok: Tok) -> bool:
    return tok in _OPERATORS


def precedence(tok: Tok) -> int:
    return _PRECEDENCE.get(tok, 0)


def lookup(ident: str) -> Tok:
    """Return keyword token for ident, else IDENT (token.go:176-181)."""
    return KEYWORDS.get(ident.lower(), Tok.IDENT)


def is_regex_op(tok: Tok) -> bool:
    return tok in (Tok.EQREGEX, Tok.NEQREGEX)


def is_list_op(tok: Tok) -> bool:
    return tok in (Tok.IN, Tok.NI)


def tokstr(tok: Tok, lit: str) -> str:
    """Literal if provided, else token string (token.go:168-173)."""
    return lit if lit else str(tok)


class Pos:
    """Zero-based line/char position of a token (token.go:183-189)."""

    __slots__ = ("line", "char")

    def __init__(self, line: int = 0, char: int = 0) -> None:
        self.line = line
        self.char = char

    def __repr__(self) -> str:
        return f"Pos(line={self.line}, char={self.char})"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Pos)
            and self.line == other.line
            and self.char == other.char
        )
