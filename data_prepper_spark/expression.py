"""Data Prepper expression DSL → Spark ``Column`` compiler.

The reference evaluates its conditional DSL per event with an ANTLR parse
tree walk (/root/reference/data-prepper-expression/src/main/antlr/
DataPrepperExpression.g4; GenericExpressionEvaluator.java:35-43,
ParseTreeEvaluator.java:36-38).  That is per-row interpretation.  Here the
same grammar is compiled ONCE at pipeline-build time into a Catalyst
``Column``; evaluation then happens JVM-side inside whole-stage codegen —
zero per-row Python, per SURVEY.md §2.4 / §3.3.

Grammar coverage (citations into the reference grammar file):
  - ``and`` / ``or`` / ``not``                 (g4:302-304)
  - ``==`` ``!=``                              (g4:292-293)
  - ``<`` ``<=`` ``>`` ``>=``                  (g4:294-297)
  - regex ``=~`` / ``!~``                      (g4:298-299)
  - set membership ``in {…}`` / ``not in {…}`` (g4:300-301,118-120)
  - arithmetic ``+ - * /``, unary ``-``        (g4:26-47,126-128)
  - JSON-Pointer operands ``/status_code``     (g4:209-241)
  - literals Integer/Float/Boolean/String/Null (g4:170-207)
  - env-var operand ``${NAME}``                (g4:243-261; compile-time)
  - functions (docs/expression_syntax.md:171-191):
      length(x), contains(x, y), hasTags("a","b"), getMetadata("/k"),
      cidrContains("/ip", "10.0.0.0/8", …)

JSON-Pointer paths ``/fizz/buzz`` map to nested column access
``fizz.buzz`` (JacksonEvent.java:43-52 pointer semantics); ``hasTags``
reads the ``_tags array<string>`` column and ``getMetadata`` the
``_meta map<string,string>`` column (our EventMetadata equivalents,
SURVEY.md §1.1).
"""

from __future__ import annotations

import ipaddress
import re

from pyspark.sql import Column, functions as F

TAGS_COL = "_tags"
META_COL = "_meta"

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
        (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<env>\$\{[A-Za-z_][A-Za-z0-9_]*\})
      | (?P<ptr>/[A-Za-z0-9_][A-Za-z0-9_/\-]*)
      | (?P<op><=|>=|==|!=|=~|!~|<|>|\+|-|\*|/|\(|\)|\{|\}|,)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "true", "false", "null"}


class ExpressionError(ValueError):
    pass


def _lex(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            if text[pos:].strip() == "":
                break
            raise ExpressionError(f"bad token at {text[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        toks.append((kind, val))
    toks.append(("eof", ""))
    return toks


class _Parser:
    """Recursive-descent over the DP grammar's precedence ladder:
    or < and < not < (==,!=,<,…,=~,in) < (+,-) < (*,/) < unary - < primary.
    """

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ExpressionError(f"expected {val or kind}, got {v!r}")
        return v

    # ---- precedence ladder ----
    def parse(self) -> Column:
        c = self.p_or()
        if self.peek()[0] != "eof":
            raise ExpressionError(f"trailing input at {self.peek()[1]!r}")
        return c

    def p_or(self) -> Column:
        left = self.p_and()
        while self.peek() == ("word", "or"):
            self.next()
            left = left | self.p_and()
        return left

    def p_and(self) -> Column:
        left = self.p_not()
        while self.peek() == ("word", "and"):
            self.next()
            left = left & self.p_not()
        return left

    def p_not(self) -> Column:
        if self.peek() == ("word", "not") and self.toks[self.i + 1][1] != "in":
            self.next()
            return ~self.p_not()
        return self.p_cmp()

    def p_cmp(self) -> Column:
        left = self.p_add()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self.p_add()
            return {
                "==": left.eqNullSafe(right) if isinstance(right, Column) else left == right,
                "!=": ~left.eqNullSafe(right) if isinstance(right, Column) else left != right,
                "<": left < right,
                "<=": left <= right,
                ">": left > right,
                ">=": left >= right,
            }[v]
        if k == "op" and v in ("=~", "!~"):
            self.next()
            pat = self._string_literal()
            rl = left.rlike(pat)
            return rl if v == "=~" else ~rl
        if (k, v) == ("word", "in"):
            self.next()
            return left.isin(*self._set_literal())
        if (k, v) == ("word", "not") and self.toks[self.i + 1][1] == "in":
            self.next()
            self.next()
            return ~left.isin(*self._set_literal())
        return left

    def p_add(self) -> Column:
        left = self.p_mul()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            _, op = self.next()
            right = self.p_mul()
            left = (left + right) if op == "+" else (left - right)
        return left

    def p_mul(self) -> Column:
        left = self.p_unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/"):
            _, op = self.next()
            right = self.p_unary()
            left = (left * right) if op == "*" else (left / right)
        return left

    def p_unary(self) -> Column:
        if self.peek() == ("op", "-"):
            self.next()
            return -self.p_unary()
        return self.p_primary()

    # ---- primaries ----
    def _string_literal(self) -> str:
        k, v = self.next()
        if k != "str":
            raise ExpressionError(f"expected string literal, got {v!r}")
        return v[1:-1].replace('\\"', '"').replace("\\\\", "\\")

    def _set_literal(self) -> list:
        self.expect("op", "{")
        vals = []
        while True:
            k, v = self.next()
            if k == "num":
                vals.append(float(v) if "." in v else int(v))
            elif k == "str":
                vals.append(v[1:-1])
            elif (k, v) == ("word", "true"):
                vals.append(True)
            elif (k, v) == ("word", "false"):
                vals.append(False)
            else:
                raise ExpressionError(f"bad set element {v!r}")
            k, v = self.next()
            if (k, v) == ("op", "}"):
                return vals
            if (k, v) != ("op", ","):
                raise ExpressionError(f"expected , or }} in set, got {v!r}")

    def p_primary(self) -> Column:
        k, v = self.next()
        if k == "num":
            return F.lit(float(v) if "." in v else int(v))
        if k == "str":
            return F.lit(v[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if k == "env":
            return F.lit(_resolve_env(v))
        if k == "ptr":
            return pointer_to_col(v)
        if (k, v) == ("op", "("):
            c = self.p_or()
            self.expect("op", ")")
            return c
        if k == "word":
            if v == "true":
                return F.lit(True)
            if v == "false":
                return F.lit(False)
            if v == "null":
                return F.lit(None)
            if self.peek() == ("op", "("):
                return self._function(v)
            raise ExpressionError(f"unknown identifier {v!r}")
        raise ExpressionError(f"unexpected token {v!r}")

    def _function(self, name: str) -> Column:
        self.expect("op", "(")
        if name == "cidrContains":
            # CIDR args must be STRING constants (g4 function grammar);
            # capture the raw literals here instead of regexing them back
            # out of a compiled Column (which breaks under Spark Connect)
            ip = self.p_or()
            cidrs: list[str] = []
            while True:
                k, v = self.next()
                if (k, v) == ("op", ")"):
                    break
                if (k, v) == ("op", ","):
                    continue
                if k == "str":
                    cidrs.append(v[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
                elif k == "env":
                    cidrs.append(_resolve_env(v))
                else:
                    raise ExpressionError(
                        "cidrContains arguments must be string literals"
                    )
            return _cidr_contains(ip, cidrs)
        args: list = []
        if self.peek() != ("op", ")"):
            while True:
                args.append(self.p_or())
                k, v = self.next()
                if (k, v) == ("op", ")"):
                    break
                if (k, v) != ("op", ","):
                    raise ExpressionError(f"expected , or ) in args, got {v!r}")
        else:
            self.next()
        return _apply_function(name, args)


def pointer_to_col(ptr: str) -> Column:
    """JSON-Pointer ``/a/b`` → ``F.col("a.b")`` (struct navigation)."""
    parts = [p for p in ptr.split("/") if p]
    c = F.col(parts[0])
    for p in parts[1:]:
        c = c.getField(p)
    return c


def _resolve_env(tok: str) -> str:
    """``${name}`` env-var operand (DataPrepperExpression.g4:243-261):
    resolved ONCE at compile time from the process environment — the
    reference substitutes at pipeline creation, not per event."""
    import os

    name = tok[2:-1]
    val = os.environ.get(name)
    if val is None:
        raise ExpressionError(f"environment variable ${{{name}}} is not set")
    return val


def _apply_function(name: str, args: list[Column]) -> Column:
    # Reference impls: LengthExpressionFunction.java:14,
    # ContainsExpressionFunction.java:14, HasTagsExpressionFunction.java:15,
    # GetMetadataExpressionFunction.java:14, CidrExpressionFunction.java:19.
    if name == "length":
        return F.length(args[0])
    if name == "contains":
        return F.contains(args[0], args[1])
    if name == "hasTags":
        cond = None
        for a in args:
            c = F.array_contains(F.col(TAGS_COL), a)
            cond = c if cond is None else (cond & c)
        return cond if cond is not None else F.lit(True)
    if name == "getMetadata":
        # arg is a lit string pointer like "/key"
        return F.element_at(F.col(META_COL), F.regexp_replace(args[0], "^/", ""))
    if name == "cidrContains":
        # reachable only via a pre-compiled Column arg (not the parser,
        # which captures raw literals in _function)
        raise ExpressionError("cidrContains arguments must be string literals")
    raise ExpressionError(f"unknown function {name}()")


_SIGN_BIT = -(1 << 63)  # Long.MIN_VALUE — xor flips the sign bit


def _bias(u64: int) -> int:
    """Unsigned 64-bit value → sign-bit-flipped signed long, so SIGNED
    comparison of biased values == UNSIGNED comparison of the originals."""
    return (u64 ^ (1 << 63)) - (1 << 64) if (u64 ^ (1 << 63)) >= (1 << 63) else (u64 ^ (1 << 63))


def _ipv4_num(ip_col: Column) -> Column:
    octets = F.split(ip_col, r"\.")
    return (
        F.get(octets, 0).try_cast("long") * F.lit(1 << 24)
        + F.get(octets, 1).try_cast("long") * F.lit(1 << 16)
        + F.get(octets, 2).try_cast("long") * F.lit(1 << 8)
        + F.get(octets, 3).try_cast("long")
    )


def _ipv6_halves(ip_col: Column) -> tuple[Column, Column, Column]:
    """(valid, biased_hi, biased_lo) for an IPv6 text column — pure
    Catalyst column arithmetic, no UDF.  Handles '::' zero-compression
    and the embedded-IPv4 tail ('::ffff:192.0.2.1').  The two unsigned
    64-bit halves are built with shiftleft|bitwiseOR (wrapping bit ops —
    no ANSI overflow) and sign-bit-biased so signed (hi, lo) lexicographic
    compare equals unsigned 128-bit compare."""
    s = F.lower(F.trim(ip_col))
    # embedded IPv4 tail → two trailing hex groups
    has_v4 = s.rlike(r"\.")
    quad = F.split(F.regexp_extract(s, r"(\d+\.\d+\.\d+\.\d+)$", 1), r"\.")

    def q(i: int) -> Column:
        return F.get(quad, i).try_cast("long")

    g6 = F.conv((q(0) * 256 + q(1)).cast("string"), 10, 16)
    g7 = F.conv((q(2) * 256 + q(3)).cast("string"), 10, 16)
    s = F.when(
        has_v4,
        F.concat(
            F.regexp_replace(s, r"\d+\.\d+\.\d+\.\d+$", ""), g6, F.lit(":"), g7
        ),
    ).otherwise(s)
    # '::' expansion to 8 groups
    halves = F.split(s, "::", -1)
    left = F.filter(F.split(F.get(halves, 0), ":", -1), lambda x: x != "")
    right = F.filter(
        F.split(F.coalesce(F.element_at(halves, 2), F.lit("")), ":", -1),
        lambda x: x != "",
    )
    pad = F.array_repeat(F.lit("0"), F.lit(8) - F.size(left) - F.size(right))
    groups = F.when(F.size(halves) == 2, F.concat(left, pad, right)).otherwise(
        F.filter(F.split(s, ":", -1), lambda x: x != "")
    )
    gv = F.transform(groups, lambda g: F.conv(g, 16, 10).try_cast("long"))

    def pack(a: Column, b: Column, c: Column, d: Column) -> Column:
        return (
            F.shiftleft(a, 48)
            .bitwiseOR(F.shiftleft(b, 32))
            .bitwiseOR(F.shiftleft(c, 16))
            .bitwiseOR(d)
        )

    hi = pack(F.get(gv, 0), F.get(gv, 1), F.get(gv, 2), F.get(gv, 3))
    lo = pack(F.get(gv, 4), F.get(gv, 5), F.get(gv, 6), F.get(gv, 7))
    # 8 groups AND every group is real hex: a syntactically 8-group but
    # non-hex address must be INVALID (predicate false), not NULL — under
    # negation/CASE a NULL would diverge from the reference's
    # false-for-invalid behavior.
    # case-insensitive: the embedded-IPv4 tail groups come from
    # F.conv(.., 10, 16), which emits UPPERCASE hex
    valid = (F.size(groups) == 8) & F.forall(
        groups, lambda g: g.rlike("^[0-9a-fA-F]{1,4}$")
    )
    bias = F.lit(_SIGN_BIT)
    return valid, hi.bitwiseXOR(bias), lo.bitwiseXOR(bias)


def _cidr_contains(ip_col: Column, cidrs: list[str]) -> Column:
    """CIDR membership as pure column arithmetic, IPv4 AND IPv6 — no UDF
    (the reference's CidrExpressionFunction.java:19 delegates to
    commons-net SubnetUtils / IP6 range classes; here both families
    compile to JVM-side range compares).  IPv4: dotted quad → one long.
    IPv6: '::'-expanded groups → two sign-bit-biased longs, 128-bit range
    test as lexicographic (hi, lo) compare.  CIDR strings parse
    driver-side at compile time; an address only tests against its own
    family's networks."""
    v4nets = []
    v6ranges = []
    for spec in cidrs:
        net = ipaddress.ip_network(spec, strict=False)
        if net.version == 4:
            v4nets.append((int(net.network_address), int(net.broadcast_address)))
        else:
            lo, hi = int(net.network_address), int(net.broadcast_address)
            v6ranges.append(
                (
                    _bias(lo >> 64), _bias(lo & ((1 << 64) - 1)),
                    _bias(hi >> 64), _bias(hi & ((1 << 64) - 1)),
                )
            )
    is_v6 = ip_col.contains(":")
    cond = F.lit(False)
    if v4nets:
        ip_num = _ipv4_num(ip_col)
        v4c = F.lit(False)
        for lo, hi in v4nets:
            v4c = v4c | ((ip_num >= F.lit(lo)) & (ip_num <= F.lit(hi)))
        cond = cond | (~is_v6 & v4c)
    if v6ranges:
        valid, bhi, blo = _ipv6_halves(ip_col)
        v6c = F.lit(False)
        for lo_h, lo_l, hi_h, hi_l in v6ranges:
            ge_lo = (bhi > F.lit(lo_h)) | ((bhi == F.lit(lo_h)) & (blo >= F.lit(lo_l)))
            le_hi = (bhi < F.lit(hi_h)) | ((bhi == F.lit(hi_h)) & (blo <= F.lit(hi_l)))
            v6c = v6c | (ge_lo & le_hi)
        cond = cond | (is_v6 & valid & v6c)
    # malformed addresses (NULL arithmetic anywhere) are NOT contained —
    # false, never NULL (reference: false-for-invalid)
    return F.coalesce(cond, F.lit(False))


def compile_expression(text: str) -> Column:
    """Compile a Data Prepper expression string to a Spark Column (once,
    at plan time — the Catalyst analog of GenericExpressionEvaluator)."""
    return _Parser(_lex(text)).parse()
