"""Lexer for the JEPL rule language.

Behavior parity: /root/reference/scanner.go.  Notable contract points
reproduced here (all covered by tests/test_lang.py):

- identifiers start with letter/``_``/``@``; ident chars add digits
  (scanner.go:287-290) — supports keys like ``@timestamp``
- ``+``/``-`` immediately followed by a digit (or ``.digit``) lex as a
  signed number, otherwise as ADD/SUB (scanner.go:204-223)
- ``5.`` lexes as NUMBER "5" and *consumes* the dot (scanner.go:243-254)
- strings quote with ``'`` or ``"``; escapes ``\\n \\\\ \\" \\'``; newline
  or EOF inside → BADSTRING; unknown escape → BADESCAPE (scanner.go:487-519)
- regexes are ``/``-delimited; ``\\/`` unescapes to ``/``; any other
  backslash passes through verbatim; newline → BADREGEX (scanner.go:181-198)
- ``<>`` is NEQ (scanner.go:82-89)
- EOF position: the first EOF read sits just past the last char, any
  further read reports one char further (scanner.go:378-420) — parser
  error messages depend on this
"""

from __future__ import annotations

from .tokens import Pos, Tok, lookup

EOF_CH = "\x00"


def _is_ws(ch: str) -> bool:
    return ch in (" ", "\t", "\n")


def _is_letter(ch: str) -> bool:
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z")


def _is_digit(ch: str) -> bool:
    return "0" <= ch <= "9"


def is_ident_char(ch: str) -> bool:
    return _is_letter(ch) or _is_digit(ch) or ch == "_" or ch == "@"


def is_ident_first_char(ch: str) -> bool:
    return _is_letter(ch) or ch == "_"


class _Reader:
    """Rune reader with unread support and Go-compatible position
    tracking (scanner.go:345-432): each rune carries the position it was
    read at; the EOF position advances exactly once past the input."""

    def __init__(self, s: str) -> None:
        # \r\n and bare \r fold to \n (scanner.go:390-397)
        s = s.replace("\r\n", "\n").replace("\r", "\n")
        self._s = s
        self._i = 0
        self._line = 0
        self._char = 0
        self._eof_seen = False
        self._hist: list[tuple[str, Pos]] = []  # read history
        self._n = 0  # unread depth

    def read(self) -> tuple[str, Pos]:
        if self._n > 0:
            self._n -= 1
            return self.curr()
        if self._i < len(self._s):
            ch = self._s[self._i]
            self._i += 1
        else:
            ch = EOF_CH
        pos = Pos(self._line, self._char)
        self._hist.append((ch, pos))
        if len(self._hist) > 8:
            self._hist.pop(0)
        if ch == "\n":
            self._line += 1
            self._char = 0
        elif not self._eof_seen:
            self._char += 1
        if ch == EOF_CH:
            self._eof_seen = True
        return ch, pos

    def unread(self) -> None:
        self._n += 1

    def curr(self) -> tuple[str, Pos]:
        return self._hist[len(self._hist) - 1 - self._n]


class Scanner:
    """Tokenizer: .scan() yields (Tok, Pos, literal)."""

    def __init__(self, text: str) -> None:
        self.r = _Reader(text)

    def scan(self) -> tuple[Tok, Pos, str]:
        ch0, pos = self.r.read()

        if _is_ws(ch0):
            return self._scan_whitespace()
        if _is_letter(ch0) or ch0 == "_" or ch0 == "@":
            self.r.unread()
            return self._scan_ident(lookup_kw=True)
        if _is_digit(ch0):
            return self._scan_number()

        if ch0 == EOF_CH:
            return Tok.EOF, pos, ""
        if ch0 in ("'", '"'):
            return self._scan_string()
        if ch0 == ".":
            ch1, _ = self.r.read()
            self.r.unread()
            if _is_digit(ch1):
                return self._scan_number()
            return Tok.DOT, pos, ""
        if ch0 in ("+", "-"):
            return self._scan_number()
        if ch0 == "*":
            return Tok.MUL, pos, ""
        if ch0 == "/":
            return Tok.DIV, pos, ""
        if ch0 == "%":
            return Tok.MOD, pos, ""
        if ch0 == "=":
            ch1, _ = self.r.read()
            if ch1 == "~":
                return Tok.EQREGEX, pos, ""
            self.r.unread()
            return Tok.EQ, pos, ""
        if ch0 == "!":
            ch1, _ = self.r.read()
            if ch1 == "=":
                return Tok.NEQ, pos, ""
            if ch1 == "~":
                return Tok.NEQREGEX, pos, ""
            self.r.unread()
            return Tok.ILLEGAL, pos, ch0
        if ch0 == ">":
            ch1, _ = self.r.read()
            if ch1 == "=":
                return Tok.GTE, pos, ""
            self.r.unread()
            return Tok.GT, pos, ""
        if ch0 == "<":
            ch1, _ = self.r.read()
            if ch1 == "=":
                return Tok.LTE, pos, ""
            if ch1 == ">":
                return Tok.NEQ, pos, ""
            self.r.unread()
            return Tok.LT, pos, ""
        if ch0 == "(":
            return Tok.LPAREN, pos, ""
        if ch0 == ")":
            return Tok.RPAREN, pos, ""
        if ch0 == "[":
            return Tok.LBRACKET, pos, ""
        if ch0 == "]":
            return Tok.RBRACKET, pos, ""
        if ch0 == ",":
            return Tok.COMMA, pos, ""

        return Tok.ILLEGAL, pos, ch0

    # -- token class scanners -------------------------------------------

    def _scan_whitespace(self) -> tuple[Tok, Pos, str]:
        ch, pos = self.r.curr()
        buf = [ch]
        while True:
            ch, _ = self.r.read()
            if ch == EOF_CH:
                break
            if not _is_ws(ch):
                self.r.unread()
                break
            buf.append(ch)
        return Tok.WS, pos, "".join(buf)

    def _scan_ident(self, lookup_kw: bool) -> tuple[Tok, Pos, str]:
        _, pos = self.r.read()
        self.r.unread()
        buf: list[str] = []
        while True:
            ch, _ = self.r.read()
            if ch == EOF_CH:
                break
            if ch == '"':
                tok0, pos0, lit0 = self._scan_string()
                if tok0 in (Tok.BADSTRING, Tok.BADESCAPE):
                    return tok0, pos0, lit0
                return Tok.IDENT, pos, lit0
            if is_ident_char(ch):
                buf.append(ch)
                while True:
                    ch, _ = self.r.read()
                    if ch == EOF_CH:
                        self.r.unread()
                        break
                    if not is_ident_char(ch):
                        self.r.unread()
                        break
                    buf.append(ch)
            else:
                self.r.unread()
                break
        lit = "".join(buf)
        if lookup_kw:
            tok = lookup(lit)
            if tok is not Tok.IDENT:
                return tok, pos, ""
        return Tok.IDENT, pos, lit

    def _scan_string(self) -> tuple[Tok, Pos, str]:
        self.r.unread()
        _, pos = self.r.curr()
        ending, _ = self.r.read()
        buf: list[str] = []
        while True:
            ch0, _ = self.r.read()
            if ch0 == ending:
                return Tok.STRING, pos, "".join(buf)
            if ch0 == EOF_CH or ch0 == "\n":
                return Tok.BADSTRING, pos, "".join(buf)
            if ch0 == "\\":
                ch1, _ = self.r.read()
                if ch1 == "n":
                    buf.append("\n")
                elif ch1 == "\\":
                    buf.append("\\")
                elif ch1 == '"':
                    buf.append('"')
                elif ch1 == "'":
                    buf.append("'")
                else:
                    _, bpos = self.r.curr()
                    return Tok.BADESCAPE, bpos, ch0 + ch1
            else:
                buf.append(ch0)

    def scan_regex(self) -> tuple[Tok, Pos, str]:
        _, pos = self.r.curr()
        ch, _ = self.r.read()
        if ch != "/":
            return Tok.BADREGEX, pos, ""
        buf: list[str] = []
        while True:
            ch0, _ = self.r.read()
            if ch0 == "/":
                return Tok.REGEX, pos, "".join(buf)
            if ch0 == EOF_CH:
                return Tok.BADREGEX, pos, ""
            if ch0 == "\n":
                return Tok.BADREGEX, pos, ""
            if ch0 == "\\":
                ch1, _ = self.r.read()
                if ch1 == "/":
                    buf.append("/")
                else:
                    # pass the backslash through, re-read ch1 normally
                    self.r.unread()
                    buf.append("\\")
            else:
                buf.append(ch0)

    def _scan_number(self) -> tuple[Tok, Pos, str]:
        buf: list[str] = []
        ch, pos = self.r.curr()
        if ch in ("+", "-"):
            ch1, _ = self.r.read()
            ch2, _ = self.r.read()
            self.r.unread()
            self.r.unread()
            if _is_digit(ch1) or (ch1 == "." and _is_digit(ch2)):
                buf.append(ch)
            elif ch == "+":
                return Tok.ADD, pos, ""
            else:
                return Tok.SUB, pos, ""
        elif ch == ".":
            ch1, _ = self.r.read()
            self.r.unread()
            if not _is_digit(ch1):
                return Tok.ILLEGAL, pos, "."
            self.r.unread()
        else:
            self.r.unread()

        buf.append(self._scan_digits())

        is_decimal = False
        ch0, _ = self.r.read()
        if ch0 == ".":
            is_decimal = True
            ch1, _ = self.r.read()
            if _is_digit(ch1):
                buf.append(ch0)
                buf.append(ch1)
                buf.append(self._scan_digits())
            else:
                self.r.unread()
        else:
            self.r.unread()

        lit = "".join(buf)
        if not is_decimal:
            return Tok.INTEGER, pos, lit
        return Tok.NUMBER, pos, lit

    def _scan_digits(self) -> str:
        buf: list[str] = []
        while True:
            ch, _ = self.r.read()
            if not _is_digit(ch):
                self.r.unread()
                break
            buf.append(ch)
        return "".join(buf)


class BufScanner:
    """Token-level scanner with unscan support (scanner.go:292-343)."""

    def __init__(self, text: str) -> None:
        self.s = Scanner(text)
        self._buf: list[tuple[Tok, Pos, str]] = []
        self._n = 0

    def _scan_with(self, fn) -> tuple[Tok, Pos, str]:
        if self._n > 0:
            self._n -= 1
            return self.curr()
        self._buf.append(fn())
        if len(self._buf) > 8:
            self._buf.pop(0)
        return self.curr()

    def scan(self) -> tuple[Tok, Pos, str]:
        return self._scan_with(self.s.scan)

    def scan_regex(self) -> tuple[Tok, Pos, str]:
        return self._scan_with(self.s.scan_regex)

    def unscan(self) -> None:
        self._n += 1

    def curr(self) -> tuple[Tok, Pos, str]:
        return self._buf[len(self._buf) - 1 - self._n]
