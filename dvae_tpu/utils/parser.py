"""Tiny parser combinators (reference ``mmidas/parser.py:17-59``).

The reference ships these as an unused utility; kept for API completeness.
A parser is ``str -> (value, rest) | None``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

Parser = Callable[[str], Optional[Tuple[object, str]]]


def sat(pred: Callable[[str], bool]) -> Parser:
    """Consume one character satisfying ``pred``."""
    def p(s: str):
        if s and pred(s[0]):
            return s[0], s[1:]
        return None
    return p


def one_char(c: str) -> Parser:
    """Consume exactly the character ``c``."""
    return sat(lambda x: x == c)


def any_digit() -> Parser:
    return sat(str.isdigit)


def compose(p1: Parser, p2: Parser) -> Parser:
    """Sequential composition; yields a (v1, v2) pair."""
    def p(s: str):
        r1 = p1(s)
        if r1 is None:
            return None
        v1, rest = r1
        r2 = p2(rest)
        if r2 is None:
            return None
        v2, rest2 = r2
        return (v1, v2), rest2
    return p


def choice(p1: Parser, p2: Parser) -> Parser:
    """Ordered alternative."""
    def p(s: str):
        return p1(s) if p1(s) is not None else p2(s)
    return p


def many(p1: Parser) -> Parser:
    """Zero-or-more repetition; yields a list."""
    def p(s: str):
        out = []
        while True:
            r = p1(s)
            if r is None:
                return out, s
            v, s = r
            out.append(v)
    return p


class ParserError(Exception):
    """Raised by ``parse`` on failure (reference parser.py:7-9 — the
    reference's combinators throw; ours return None internally and surface
    the exception only at the ``parse`` entry point)."""

    def __init__(self, msg: str, content: str):
        super().__init__(f"{msg}: {content}")


def any_char() -> Parser:
    """Consume any single character (reference ``anyChar`` :27-31)."""
    return sat(lambda _: True)


def parse(p: Parser, s: str) -> Tuple[object, str]:
    """Run ``p`` on ``s``; return (value, rest) or raise ``ParserError``
    (reference ``parse`` :12-14)."""
    r = p(s)
    if r is None:
        raise ParserError("Parse failure", s)
    return r
