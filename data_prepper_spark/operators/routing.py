"""Conditional routing → tagged filtered frames (reference:
data-prepper-core router).

RouteEventEvaluator.java:34-72 evaluates every named route expression per
event; DataFlowComponentRouter.java:23-45 hands each sink the events
matching any of its routes (no routes = all events); multi-sink sharing
copies via RouterCopyRecordStrategy.  Spark-side: compile each route
once, cache the upstream frame, emit one filtered child per sink — or a
single unioned frame with a `_route` tag for audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..expression import compile_expression


def route(
    df: DataFrame,
    routes: dict[str, str],
) -> dict[str, DataFrame]:
    """routes: {name: dp_expression} → {name: filtered DataFrame}.
    The `_default` entry receives events matching NO route (the
    reference's unrouted remainder)."""
    compiled = {name: compile_expression(expr) for name, expr in routes.items()}
    out = {name: df.filter(F.coalesce(c, F.lit(False))) for name, c in compiled.items()}
    none_match = None
    for c in compiled.values():
        nc = ~F.coalesce(c, F.lit(False))
        none_match = nc if none_match is None else (none_match & nc)
    if none_match is not None:
        out["_default"] = df.filter(none_match)
    return out


def route_tagged(df: DataFrame, routes: dict[str, str]) -> DataFrame:
    """Single-frame form: union of all routes with a `_route` tag column
    (an event matching k routes appears k times — copy-on-multi-sink,
    RouterCopyRecordStrategy.java)."""
    parts = [
        d.withColumn("_route", F.lit(name))
        for name, d in route(df, routes).items()
        if name != "_default"
    ]
    if not parts:  # no named routes configured → empty tagged frame
        return df.withColumn("_route", F.lit(None).cast("string")).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
