"""Expression-DSL fuzz: randomly generated arithmetic/boolean DP
expressions must evaluate identically to a Python mirror — one batched
Spark action for all samples (deterministic seed, not time-dependent)."""

import random

from pyspark.sql import functions as F

from data_prepper_spark.expression import compile_expression

N_EXPR = 60
N_ROWS = 25


def _gen(rng: random.Random, depth: int = 0) -> tuple[str, str]:
    """Returns (dp_text, python_text) over int columns a, b (non-zero)."""
    if depth >= 3 or rng.random() < 0.35:
        choice = rng.randrange(3)
        if choice == 0:
            v = rng.randrange(-20, 21)
            return str(v), str(v)
        return ("/a", "a") if choice == 1 else ("/b", "b")
    op = rng.choice(["+", "-", "*"])
    l_dp, l_py = _gen(rng, depth + 1)
    r_dp, r_py = _gen(rng, depth + 1)
    return f"({l_dp} {op} {r_dp})", f"({l_py} {op} {r_py})"


def _gen_bool(rng: random.Random) -> tuple[str, str]:
    cmp_op = rng.choice(["==", "!=", "<", "<=", ">", ">="])
    l_dp, l_py = _gen(rng)
    r_dp, r_py = _gen(rng)
    a = (f"{l_dp} {cmp_op} {r_dp}", f"{l_py} {cmp_op} {r_py}")
    if rng.random() < 0.4:
        cmp_op2 = rng.choice(["==", "<", ">"])
        l2_dp, l2_py = _gen(rng)
        r2_dp, r2_py = _gen(rng)
        joiner = rng.choice(["and", "or"])
        return (
            f"({a[0]}) {joiner} ({l2_dp} {cmp_op2} {r2_dp})",
            f"({a[1]}) {joiner} ({l2_py} {cmp_op2} {r2_py})",
        )
    if rng.random() < 0.3:
        return f"not ({a[0]})", f"not ({a[1]})"
    return a


def test_expression_fuzz_equivalence(spark):
    rng = random.Random(20260817)
    samples = [_gen_bool(rng) for _ in range(N_EXPR)]
    rows = [
        (rng.randrange(-15, 16) or 1, rng.randrange(-15, 16) or 1)
        for _ in range(N_ROWS)
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    cols = [
        F.coalesce(compile_expression(dp), F.lit(False)).alias(f"e{i}")
        for i, (dp, _) in enumerate(samples)
    ]
    got = df.select(*cols).collect()
    for ri, (a, b) in enumerate(rows):
        for i, (_, py) in enumerate(samples):
            want = bool(eval(py, {}, {"a": a, "b": b}))
            assert got[ri][f"e{i}"] == want, (samples[i][0], a, b)
