"""Front-end tests translated from the reference's own corpus:
scanner_test.go, parser_test.go, ast_test.go (/root/reference).
Error strings are an exact contract (parser_test.go:41-102).
"""

from __future__ import annotations

import pytest

from jepl_spark.lang import ast
from jepl_spark.lang.parser import JeplParseError, Parser, parse_expr, parse_statement
from jepl_spark.lang.scanner import Scanner
from jepl_spark.lang.tokens import Tok


def scan_all(s: str):
    sc = Scanner(s)
    out = []
    while True:
        tok, pos, lit = sc.scan()
        out.append((tok, lit))
        if tok is Tok.EOF:
            return out


# ---------------------------------------------------------------------------
# scanner (scanner_test.go:20-131)

SINGLE_TOKEN_CASES = [
    ("", Tok.EOF, ""),
    ("#", Tok.ILLEGAL, "#"),
    (" ", Tok.WS, " "),
    ("\t", Tok.WS, "\t"),
    ("\n", Tok.WS, "\n"),
    ("\r", Tok.WS, "\n"),
    ("\r\n", Tok.WS, "\n"),
    ("\rX", Tok.WS, "\n"),
    ("+", Tok.ADD, ""),
    ("-", Tok.SUB, ""),
    ("*", Tok.MUL, ""),
    ("/", Tok.DIV, ""),
    ("%", Tok.MOD, ""),
    ("=", Tok.EQ, ""),
    ("<>", Tok.NEQ, ""),
    ("! ", Tok.ILLEGAL, "!"),
    ("<", Tok.LT, ""),
    ("<=", Tok.LTE, ""),
    (">", Tok.GT, ""),
    (">=", Tok.GTE, ""),
    ("[", Tok.LBRACKET, ""),
    ("(", Tok.LPAREN, ""),
    ("]", Tok.RBRACKET, ""),
    (")", Tok.RPAREN, ""),
    (",", Tok.COMMA, ""),
    (".", Tok.DOT, ""),
    ("=~", Tok.EQREGEX, ""),
    ("!~", Tok.NEQREGEX, ""),
    ("!=", Tok.NEQ, ""),
    ("foo", Tok.IDENT, "foo"),
    ("_foo", Tok.IDENT, "_foo"),
    ("Zx12_3U_-", Tok.IDENT, "Zx12_3U_"),
    ("@timestamp", Tok.IDENT, "@timestamp"),
    ("true", Tok.TRUE, ""),
    ("false", Tok.FALSE, ""),
    ("'testing 123!'", Tok.STRING, "testing 123!"),
    ("'foo\\nbar'", Tok.STRING, "foo\nbar"),
    ("'foo\\\\bar'", Tok.STRING, "foo\\bar"),
    ("'test\"", Tok.BADSTRING, "test\""),
    ("\"test\nfoo", Tok.BADSTRING, "test"),
    ("'test\\g'", Tok.BADESCAPE, "\\g"),
    ("100", Tok.INTEGER, "100"),
    ("100.23", Tok.NUMBER, "100.23"),
    (".23", Tok.NUMBER, ".23"),
    ("10.3s", Tok.NUMBER, "10.3"),
    ("+100", Tok.INTEGER, "+100"),
    ("-100", Tok.INTEGER, "-100"),
    ("-100.0", Tok.NUMBER, "-100.0"),
    ("SELECT", Tok.SELECT, ""),
    ("FROM", Tok.FROM, ""),
    ("WHERE", Tok.WHERE, ""),
    ("GROUP", Tok.GROUP, ""),
    ("BY", Tok.BY, ""),
    ("AND", Tok.AND, ""),
    ("and", Tok.AND, ""),
    ("OR", Tok.OR, ""),
    ("or", Tok.OR, ""),
    ("IN", Tok.IN, ""),
    ("in", Tok.IN, ""),
    ("NI", Tok.NI, ""),
    ("AS", Tok.AS, ""),
]


@pytest.mark.parametrize("s,tok,lit", SINGLE_TOKEN_CASES)
def test_scan_single_token(s, tok, lit):
    got_tok, _, got_lit = Scanner(s).scan()
    assert got_tok is tok, f"{s!r}: {got_tok} != {tok}"
    assert got_lit == lit, f"{s!r}: {got_lit!r} != {lit!r}"


def test_scan_multi_token_stream():
    # scanner_test.go:134-184 style positional scan
    s = 'SELECT sum(value) FROM myseries WHERE a = \'b\''
    toks = [t for t, _ in scan_all(s) if t is not Tok.WS]
    assert toks == [
        Tok.SELECT, Tok.IDENT, Tok.LPAREN, Tok.IDENT, Tok.RPAREN,
        Tok.FROM, Tok.IDENT, Tok.WHERE, Tok.IDENT, Tok.EQ, Tok.STRING,
        Tok.EOF,
    ]


def test_scan_number_consumes_trailing_dot():
    # scanner.go:243-254 — "5." lexes as NUMBER 5 and eats the dot
    sc = Scanner("5.")
    tok, _, lit = sc.scan()
    assert tok is Tok.NUMBER and lit == "5"
    tok, _, _ = sc.scan()
    assert tok is Tok.EOF


def test_scan_signed_number_vs_operator():
    # "1 - 2" → INTEGER SUB INTEGER ; "1 -2" → INTEGER INTEGER(-2)
    toks = [(t, l) for t, l in scan_all("1 - 2") if t is not Tok.WS]
    assert [t for t, _ in toks] == [Tok.INTEGER, Tok.SUB, Tok.INTEGER, Tok.EOF]
    toks = [(t, l) for t, l in scan_all("1 -2") if t is not Tok.WS]
    assert [(t, l) for t, l in toks][:3] == [
        (Tok.INTEGER, "1"), (Tok.INTEGER, "-2"), (Tok.EOF, ""),
    ]


# ---------------------------------------------------------------------------
# parser statements + exact error strings (parser_test.go:41-102)


def errstring(fn):
    try:
        fn()
        return ""
    except (JeplParseError, ast.JeplValidationError) as e:
        return str(e)


STATEMENT_ERROR_CASES = [
    ("", "found EOF, expected SELECT at line 1, char 1"),
    ("CREATE", "found CREATE, expected SELECT at line 1, char 1"),
    ("SELECT sum(x) FROM Packetbeat", ""),
    ("SELECT", "found EOF, expected identifier, string, number, bool at line 1, char 8"),
    ("select 7 from foo", "invalid field 7 in SELECT field, at least one function"),
    ("SELECT count(max(value)) FROM myseries", "expected only field argument in count()"),
    ("SELECT count(7 * in_bytes) FROM myseries", "expected only field argument in count()"),
    ("SELECT count(value), value FROM foo",
     "invalid field value in SELECT field, at least one function"),
    ("select count() from myseries",
     "invalid number of arguments for count, expected 1, got 0"),
    ("SELECT value = 2 FROM cpu", "invalid operator = in SELECT field, only support +-*/"),
    ("SELECT s =~ /foo/ FROM cpu", "invalid operator =~ in SELECT field, only support +-*/"),
    ("SELECT count(foo + sum(bar)) FROM cpu", "expected only field argument in count()"),
    ("SELECT (count(foo + sum(bar))) FROM cpu", "expected only field argument in count()"),
    ("SELECT sum(value) + count(foo + sum(bar)) FROM cpu",
     "binary expressions cannot mix aggregates and raw fields"),
    ("SELECT count(x) from foo", ""),
    ("SELECT sum(x) from foo", ""),
    ("SELECT avg(x) from foo", ""),
    ("SELECT count(x), sum(x) from foo", ""),
    ("SELECT count(x), sum(x)+sum(y) from foo", ""),
    ("SELECT sum(x + y *6 /z) from foo", ""),
    ("SELECT sum(x) * (sum(y) / sum(z)) from foo group by host", ""),
]


@pytest.mark.parametrize("s,err", STATEMENT_ERROR_CASES)
def test_parse_statement_errors(s, err):
    assert errstring(lambda: parse_statement(s)) == err


def test_parse_group_by_rendering():
    # parser_test.go:14-38
    stmt = parse_statement(
        'SELECT sum(x) FROM Packetbeat where uid="xxx" group by tcp.src_ip'
    )
    assert ", ".join(str(d) for d in stmt.dimensions) == "tcp.src_ip"
    stmt = parse_statement(
        "SELECT sum(x) FROM Packetbeat group by tcp.src_ip, tcp.dst_ip"
    )
    assert ", ".join(str(d) for d in stmt.dimensions) == "tcp.src_ip, tcp.dst_ip"


# ---------------------------------------------------------------------------
# expression parsing (parser_test.go:105-266)


def test_parse_expr_primitives():
    assert parse_expr("100.0") == ast.NumberLiteral(val=100.0)
    assert parse_expr("100") == ast.IntegerLiteral(val=100)
    assert parse_expr("'foo bar'") == ast.StringLiteral(val="foo bar")
    assert parse_expr("true") == ast.BooleanLiteral(val=True)
    assert parse_expr("false") == ast.BooleanLiteral(val=False)
    assert parse_expr("my_ident") == ast.VarRef(val="my_ident", segments=["my_ident"])


def test_parse_expr_precedence():
    e = parse_expr("1 * 2 + 3")
    assert isinstance(e, ast.BinaryExpr) and e.op is Tok.ADD
    assert isinstance(e.lhs, ast.BinaryExpr) and e.lhs.op is Tok.MUL

    e = parse_expr("1 + 2 * 3")
    assert e.op is Tok.ADD
    assert isinstance(e.rhs, ast.BinaryExpr) and e.rhs.op is Tok.MUL

    e = parse_expr("(1 + 2) * 3")
    assert e.op is Tok.MUL
    assert isinstance(e.lhs, ast.ParenExpr)

    e = parse_expr("1 * 2 * 3")  # left associativity
    assert e.op is Tok.MUL and isinstance(e.lhs, ast.BinaryExpr)

    e = parse_expr("value + 3 < 30 AND 1 + 2 OR true")
    assert e.op is Tok.OR
    assert isinstance(e.lhs, ast.BinaryExpr) and e.lhs.op is Tok.AND
    assert e.rhs == ast.BooleanLiteral(val=True)


def test_parse_expr_regex():
    e = parse_expr("region =~ /us.*/")
    assert e.op is Tok.EQREGEX
    assert isinstance(e.rhs, ast.RegexLiteral) and e.rhs.pattern == "us.*"

    e = parse_expr(r"url =~ /http\:\/\/www\.example\.com/")
    assert isinstance(e.rhs, ast.RegexLiteral)
    assert e.rhs.pattern == r"http\://www\.example\.com"


def test_parse_expr_calls():
    e = parse_expr("my_func()")
    assert e == ast.Call(name="my_func", args=[])
    e = parse_expr("my_func(1, 2 + 3)")
    assert e.name == "my_func" and len(e.args) == 2
    assert e.args[0] == ast.IntegerLiteral(val=1)
    assert isinstance(e.args[1], ast.BinaryExpr)


def test_parse_in_list():
    e = parse_expr("uid IN [1, 2, 3]")
    assert e.op is Tok.IN
    assert e.rhs == ast.ListLiteral(vals=[1, 2, 3])
    e = parse_expr("foo NI ['a', 'b']")
    assert e.op is Tok.NI
    assert e.rhs == ast.ListLiteral(vals=["a", "b"])
    e = parse_expr("x IN [1.5, 2.5]")
    assert e.rhs == ast.ListLiteral(vals=[1.5, 2.5])


# ---------------------------------------------------------------------------
# quoting (parser_test.go:269-306)


def test_quote_string():
    assert ast.quote_string("") == "''"
    assert ast.quote_string("foo") == "'foo'"
    assert ast.quote_string("foo\nbar") == r"'foo\nbar'"
    assert ast.quote_string("foo bar\\\\") == r"'foo bar\\\\'"
    assert ast.quote_string("'foo'") == r"'\'foo\''"


def test_quote_ident():
    assert ast.quote_ident("") == ""
    assert ast.quote_ident("select") == '"select"'
    assert ast.quote_ident("in-bytes") == '"in-bytes"'
    assert ast.quote_ident("foo", "bar") == '"foo".bar'
    assert ast.quote_ident("foo", "", "bar") == '"foo"..bar'
    assert ast.quote_ident("foo bar", "baz") == '"foo bar".baz'
    assert ast.quote_ident("foo.bar", "baz") == '"foo.bar".baz'
    assert ast.quote_ident("foo.bar", "rp", "baz") == '"foo.bar"."rp".baz'
    assert ast.quote_ident("foo.bar", "rp", "1baz") == '"foo.bar"."rp"."1baz"'


# ---------------------------------------------------------------------------
# field naming (ast_test.go:147-219) + column names (ast_test.go:221-278)


FIELD_NAME_CASES = [
    (["value+value"], ["value_value"]),
    (["value+value", "temperature"], ["value_value", "temperature"]),
    (["mean(value)"], ["mean"]),
    (["mean(value) + max(value)"], ["mean_max"]),
    (["mean(value) + max(value)", "temperature"], ["mean_max", "temperature"]),
    (["mean(value) + temperature"], ["mean_temperature"]),
    (["(value)"], ["value"]),
    (["(value + value)"], ["value_value"]),
    (["(mean(value))"], ["mean"]),
    (["(mean(value) + max(value))"], ["mean_max"]),
]


@pytest.mark.parametrize("exprs,aliases", FIELD_NAME_CASES)
def test_field_alias_names(exprs, aliases):
    fields = [ast.Field(expr=parse_expr(s)) for s in exprs]
    assert [f.name() for f in fields] == aliases


def test_column_names_conflicts():
    stmt = ast.SelectStatement(
        fields=[
            ast.Field(expr=ast.Call(name="sum", args=[])),
            ast.Field(expr=ast.Call(name="sum", args=[])),
            ast.Field(expr=ast.Call(name="sum", args=[]), alias="sum_2"),
        ],
        sources=[],
    )
    assert stmt.column_names() == ["sum", "sum_1", "sum_2"]


def test_names_in_select_and_where():
    stmt = parse_statement("select count(asdf), count(bar) from cpu")
    names = []
    for f in stmt.fields:
        names.extend(ast.walk_names(f.expr))
    assert names == ["asdf", "bar"]

    stmt = parse_statement(
        "select sum(xxx) from cpu where time > 23 AND "
        "(asdf = 'jkl' OR (foo = 'bar' AND baz = 'bar'))"
    )
    assert ast.walk_names(stmt.condition) == ["time", "asdf", "foo", "baz"]


def test_statement_rendering():
    stmt = parse_statement(
        "select sum(tcp.in_bytes) AS b from packetbeat where uid = 1 group by tcp.src_ip"
    )
    assert (
        str(stmt)
        == "SELECT sum(tcp.in_bytes) AS b FROM packetbeat WHERE uid = 1 GROUP BY tcp.src_ip"
    )


def test_re2_unsupported_constructs_rejected():
    # the reference's RE2 engine rejects lookaround/backrefs at parse
    # time; we reject the same constructs (Python re would accept them)
    for pat in [r"f(?=oo)", r"f(?!oo)", r"(?<=f)oo", r"(?<!f)oo", r"(a)\1"]:
        err = errstring(lambda p=pat: parse_expr(f"s =~ /{p}/"))
        assert "unsupported Perl syntax" in err, (pat, err)
    # non-capturing groups and normal classes are fine in both dialects
    assert isinstance(parse_expr("s =~ /(?:ab)+[0-9]{2}$/"), ast.BinaryExpr)


def test_regex_gate_posix_classes_and_Z():
    # POSIX classes are valid RE2/Java atoms but Python re silently
    # parses them as literal character classes → reject; \Z differs
    # between Python (absolute end) and Java (before final newline)
    for pat in [r"[[:alpha:]]+", r"x[a[:digit:]]y", r"foo\Z"]:
        err = errstring(lambda p=pat: parse_expr(f"s =~ /{p}/"))
        assert "unsupported Perl syntax" in err, (pat, err)
    # literal '[:' via escape, and \\1 (escaped backslash), stay legal
    assert isinstance(parse_expr(r"s =~ /\[:alpha:\]/"), ast.BinaryExpr)
    assert isinstance(parse_expr(r"s =~ /a\\1/"), ast.BinaryExpr)


def test_condition_validation_errors():
    assert (
        errstring(lambda: parse_statement("select sum(x) from f where count(y) > 1"))
        == "invalid filter, unsupport function count(y)"
    )
    assert (
        errstring(lambda: parse_statement("select sum(x) from f where s > 'abc'"))
        == "invalid filter, unsupport op > for string"
    )
    # `s = /re/` dies at parse time in the reference too: '/' lexes as DIV
    assert (
        errstring(lambda: parse_statement("select sum(x) from f where s = /re/"))
        == "found /, expected identifier, string, number, bool at line 1, char 32"
    )
    # the regex-op rule itself (ast.go:400-406), reached via direct validation
    from jepl_spark.lang.ast import _validate_condition, JeplValidationError
    import re as _re

    with pytest.raises(JeplValidationError, match=r"invalid filter, unsupport op = for regex"):
        _validate_condition(
            ast.BinaryExpr(
                op=Tok.EQ,
                lhs=ast.VarRef(val="s", segments=["s"]),
                rhs=ast.RegexLiteral(pattern="re", compiled=_re.compile("re")),
            ),
            None,
        )


def test_parser_fuzz_error_contract():
    """Crash-freedom: arbitrary garbage, mutated rules, and shuffled
    token soup raise only JeplParseError / JeplValidationError — the
    parser never leaks an internal IndexError/RecursionError."""
    import random
    import string

    from jepl_spark.lang.ast import JeplValidationError
    from jepl_spark.lang.parser import JeplParseError, parse_statement

    rng = random.Random(0)
    corpus = [
        "select sum(x) from t where a > 1 group by b",
        "SELECT max(tcp.in_pkts) FROM pb WHERE ip = '1.2.3.4'",
    ]
    for trial in range(800):
        mode = trial % 3
        if mode == 0:
            s = "".join(rng.choice(string.printable)
                        for _ in range(rng.randrange(1, 80)))
        elif mode == 1:
            base = list(rng.choice(corpus))
            for _ in range(rng.randrange(1, 6)):
                i = rng.randrange(len(base))
                base[i] = rng.choice(string.printable)
            s = "".join(base)
        else:
            toks = rng.choice(corpus).split()
            rng.shuffle(toks)
            s = " ".join(toks[: rng.randrange(1, len(toks) + 1)])
        try:
            parse_statement(s)
        except (JeplParseError, JeplValidationError):
            pass  # the only allowed failure modes
