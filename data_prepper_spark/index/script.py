"""Painless-lite script compiler for ``script_score`` queries.

OpenSearch's ``script_score`` query re-ranks a match set with a Painless
expression over ``_score`` and doc values (reference surface: the
OpenSearch sink's index serves ``script_score`` over any stored
docvalues field — opensearch/.../OpenSearchSink.java mapping
passthrough).  This module compiles the arithmetic subset that covers
the documented scoring recipes — ``_score``, ``doc['field'].value``,
literals, ``+ - * /`` with precedence and parentheses, unary minus, and
the scoring helpers ``ln log10 sqrt abs exp min max pow saturation
sigmoid`` (the same shapes rank_feature exposes) — into a vectorized
numpy closure ``fn(score, values) -> score``.

The compiled function is a pure elementwise map, so it runs identically
on the driver serving path and inside the per-range cogroup kernel, and
the DuckDB oracle can mirror the expression symbol-for-symbol (every
helper has a DuckDB twin: ln/log10/sqrt/abs/exp/least/greatest/pow and
the saturation/sigmoid expansions).  No eval(), no attribute access —
a closed recursive-descent grammar over a closed function table.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["compile_script"]

_TOKEN_RX = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<score>_score\b)"
    r"|(?P<doc>doc\[\s*'(?P<field>[A-Za-z_][A-Za-z0-9_]*)'\s*\]\s*\.\s*value)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[()+\-*/,])"
    r")"
)

# arity-checked function table; every entry has an exact DuckDB twin
_FUNCS = {
    "ln": (1, np.log),
    "log10": (1, np.log10),
    "sqrt": (1, np.sqrt),
    "abs": (1, np.abs),
    "exp": (1, np.exp),
    "min": (2, np.minimum),
    "max": (2, np.maximum),
    "pow": (2, np.power),
    # saturation(v, pivot) = v / (v + pivot)    (rank_feature shape)
    "saturation": (2, lambda v, p: v / (v + p)),
    # sigmoid(v, pivot, exponent) = v^e / (v^e + pivot^e)
    "sigmoid": (3, lambda v, p, e: np.power(v, e)
                / (np.power(v, e) + np.power(p, e))),
}


def _tokenize(src: str) -> list[tuple[str, object]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RX.match(src, i)
        if not m or m.end() == m.start():
            rest = src[i:].strip()
            if not rest:
                break
            raise ValueError(f"script: cannot tokenize at {rest[:20]!r}")
        i = m.end()
        if m.group("num"):
            out.append(("num", float(m.group("num"))))
        elif m.group("score"):
            out.append(("score", None))
        elif m.group("doc"):
            out.append(("doc", m.group("field")))
        elif m.group("name"):
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", None))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0
        self.fields: set[str] = set()

    def peek(self):
        return self.toks[self.i]

    def take(self, kind=None, val=None):
        k, v = self.toks[self.i]
        if (kind and k != kind) or (val is not None and v != val):
            raise ValueError(f"script: expected {val or kind}, got {k} {v!r}")
        self.i += 1
        return v

    # expr := term (('+'|'-') term)*
    def expr(self):
        node = self.term()
        while self.peek() == ("op", "+") or self.peek() == ("op", "-"):
            op = self.take("op")
            rhs = self.term()
            lhs = node
            node = (
                (lambda env, a=lhs, b=rhs: a(env) + b(env))
                if op == "+"
                else (lambda env, a=lhs, b=rhs: a(env) - b(env))
            )
        return node

    # term := unary (('*'|'/') unary)*
    def term(self):
        node = self.unary()
        while self.peek() == ("op", "*") or self.peek() == ("op", "/"):
            op = self.take("op")
            rhs = self.unary()
            lhs = node
            node = (
                (lambda env, a=lhs, b=rhs: a(env) * b(env))
                if op == "*"
                else (lambda env, a=lhs, b=rhs: a(env) / b(env))
            )
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.take("op")
            sub = self.unary()
            return lambda env, a=sub: -a(env)
        return self.primary()

    def primary(self):
        k, v = self.peek()
        if k == "num":
            self.take()
            return lambda env, c=v: c
        if k == "score":
            self.take()
            return lambda env: env["_score"]
        if k == "doc":
            self.take()
            self.fields.add(v)
            return lambda env, f=v: env[f]
        if k == "name":
            name = self.take("name")
            if name not in _FUNCS:
                raise ValueError(f"script: unknown function {name!r}")
            arity, fn = _FUNCS[name]
            self.take("op", "(")
            args = [self.expr()]
            while self.peek() == ("op", ","):
                self.take("op")
                args.append(self.expr())
            self.take("op", ")")
            if len(args) != arity:
                raise ValueError(
                    f"script: {name} takes {arity} args, got {len(args)}")
            return lambda env, fn=fn, args=tuple(args): fn(
                *(a(env) for a in args))
        if (k, v) == ("op", "("):
            self.take("op")
            node = self.expr()
            self.take("op", ")")
            return node
        raise ValueError(f"script: unexpected {k} {v!r}")


def compile_script(src: str):
    """Compile *src* → ``(fn, fields)`` where ``fn(score, values)`` maps
    a float64 score array + per-field float64 docvalue arrays (dict) to
    the scripted score, and *fields* is the sorted list of docvalue
    fields the script reads."""
    p = _Parser(_tokenize(src))
    node = p.expr()
    p.take("end")
    fields = sorted(p.fields)

    def fn(score: np.ndarray, values: dict) -> np.ndarray:
        env = {"_score": score.astype(np.float64)}
        for f in fields:
            env[f] = np.asarray(values[f], dtype=np.float64)
        return np.asarray(node(env), dtype=np.float64)

    return fn, fields
