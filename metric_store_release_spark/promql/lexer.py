"""PromQL lexer.

Token-level parity with vendor/.../promql/parser/lex.go: identifiers may
contain colons (recording-rule names), durations are unit-suffixed ints
(concatenable: 1h30m), strings take Go escape syntax in ' " or ` quotes,
numbers include hex / scientific / inf / nan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "and",
    "or",
    "unless",
    "by",
    "without",
    "on",
    "ignoring",
    "group_left",
    "group_right",
    "offset",
    "bool",
    "atan2",
    "start",
    "end",
}

_AGG_KEYWORDS = {
    "sum",
    "avg",
    "min",
    "max",
    "count",
    "group",
    "stddev",
    "stdvar",
    "topk",
    "bottomk",
    "quantile",
    "count_values",
}

_DURATION_RE = re.compile(r"(?:[0-9]+(?:ms|s|m|h|d|w|y))+")
_NUMBER_RE = re.compile(
    # one branch for all decimal forms (incl. Go's trailing-dot '2.', '2.e3')
    # — alternation is first-match, not longest-match, so '2.' must not be
    # split across branches
    r"0[xX][0-9a-fA-F]+"
    r"|(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
)
_IDENT_RE = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*")
_LABEL_IDENT_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")

_ESCAPES = {
    "n": "\n",
    "t": "\t",
    "r": "\r",
    "\\": "\\",
    "'": "'",
    '"': '"',
    "a": "\a",
    "b": "\b",
    "f": "\f",
    "v": "\v",
}

DURATION_UNITS_MS = {
    "ms": 1,
    "s": 1000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 7 * 86_400_000,
    "y": 365 * 86_400_000,
}


def parse_duration_ms(text: str) -> int:
    """'1h30m' → 5_400_000. vendor model/time.ParseDuration semantics."""
    if not _DURATION_RE.fullmatch(text):
        raise PromQLSyntaxError(f"invalid duration {text!r}")
    total = 0
    for num, unit in re.findall(r"([0-9]+)(ms|s|m|h|d|w|y)", text):
        total += int(num) * DURATION_UNITS_MS[unit]
    return total


class PromQLSyntaxError(Exception):
    pass


@dataclass
class Token:
    kind: str  # IDENT NUMBER STRING DURATION OP EOF
    text: str
    pos: int


_OPS = [
    "==",
    "!=",
    "=~",
    "!~",
    "<=",
    ">=",
    "<",
    ">",
    "=",
    "+",
    "-",
    "*",
    "/",
    "%",
    "^",
    "(",
    ")",
    "{",
    "}",
    "[",
    "]",
    ",",
    ":",
    "@",
]


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c == "#":  # comment to EOL
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c in "'\"`":
            s, j = _lex_string(src, i)
            toks.append(Token("STRING", s, i))
            i = j
            continue
        # duration must be tried before plain number (both start with digits);
        # only treat as duration when a unit suffix is present
        m = _DURATION_RE.match(src, i)
        if m and not (m.end() < n and (src[m.end()].isalnum() or src[m.end()] == "_")):
            nm = _NUMBER_RE.match(src, i)
            if not (nm and nm.end() > m.end()):
                toks.append(Token("DURATION", m.group(), i))
                i = m.end()
                continue
        m = _NUMBER_RE.match(src, i)
        if m and (c.isdigit() or c == "."):
            toks.append(Token("NUMBER", m.group(), i))
            i = m.end()
            continue
        m = _IDENT_RE.match(src, i)
        if m and c != ":":  # leading ':' is the subquery step separator
            text = m.group()
            # keywords and aggregator names are case-insensitive (vendor
            # promql/parser/lex.go key lookup lowercases)
            if text.lower() in KEYWORDS or text.lower() in _AGG_KEYWORDS:
                text = text.lower()
            toks.append(Token("IDENT", text, i))
            i = m.end()
            continue
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(Token("OP", op, i))
                i += len(op)
                break
        else:
            raise PromQLSyntaxError(f"unexpected character {c!r} at {i}")
    toks.append(Token("EOF", "", n))
    return toks


def _lex_string(src: str, i: int) -> tuple[str, int]:
    quote = src[i]
    j = i + 1
    out: list[str] = []
    raw = quote == "`"
    while j < len(src):
        c = src[j]
        if c == quote:
            return "".join(out), j + 1
        if not raw and c == "\\":
            j += 1
            if j >= len(src):
                break
            e = src[j]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
            elif e == "x":
                out.append(chr(int(src[j + 1 : j + 3], 16)))
                j += 2
            else:
                out.append("\\" + e)
            j += 1
            continue
        out.append(c)
        j += 1
    raise PromQLSyntaxError(f"unterminated string starting at {i}")
