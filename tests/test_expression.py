"""DP expression DSL → Column compiler tests (grammar parity, SURVEY.md §2.4)."""

import pytest

from data_prepper_spark.expression import ExpressionError, compile_expression


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, 200, "GET", "10.0.1.5", 1.5, ["a", "b"], {"env": "prod"}),
        (2, 404, "POST", "192.168.1.9", 0.5, ["b"], {"env": "dev"}),
        (3, 500, "GET", "172.16.0.1", 2.5, [], {}),
        (4, 301, "PUT", "8.8.8.8", -1.0, ["a"], {"env": "prod"}),
    ]
    return spark.createDataFrame(
        rows,
        "id int, status int, verb string, ip string, dur double, "
        "_tags array<string>, _meta map<string,string>",
    )


def ids(df, expr):
    out = df.filter(compile_expression(expr)).select("id").collect()
    return sorted(r["id"] for r in out)


def test_comparisons(df):
    assert ids(df, "/status >= 400") == [2, 3]
    assert ids(df, "/status == 200") == [1]
    assert ids(df, '/verb != "GET"') == [2, 4]
    assert ids(df, "/status < 300 or /status > 499") == [1, 3]


def test_boolean_ops(df):
    assert ids(df, '/status >= 300 and /verb == "GET"') == [3]
    assert ids(df, "not /status == 200") == [2, 3, 4]
    assert ids(df, "not (/status == 200 or /status == 404)") == [3, 4]


def test_regex_and_sets(df):
    assert ids(df, '/verb =~ "P.*"') == [2, 4]
    assert ids(df, '/verb !~ "P.*"') == [1, 3]
    assert ids(df, "/status in {200, 301}") == [1, 4]
    assert ids(df, "/status not in {200, 301, 404}") == [3]
    assert ids(df, '/verb in {"GET", "PUT"}') == [1, 3, 4]


def test_arithmetic(df):
    assert ids(df, "/status + 100 >= 500") == [2, 3]
    assert ids(df, "/dur * 2 > 3") == [3]
    assert ids(df, "-/dur > 0.5") == [4]
    assert ids(df, "/status / 100 == 2") == [1]


def test_functions(df):
    assert ids(df, "length(/verb) == 4") == [2]
    assert ids(df, 'contains(/ip, "192.168")') == [2]
    assert ids(df, 'hasTags("a")') == [1, 4]
    assert ids(df, 'hasTags("a", "b")') == [1]
    assert ids(df, 'getMetadata("/env") == "prod"') == [1, 4]


def test_cidr(df):
    assert ids(df, 'cidrContains(/ip, "10.0.0.0/8")') == [1]
    assert ids(df, 'cidrContains(/ip, "10.0.0.0/8", "172.16.0.0/12")') == [1, 3]


def test_errors():
    with pytest.raises(ExpressionError):
        compile_expression("/a ==")
    with pytest.raises(ExpressionError):
        compile_expression("bogusfn(/a)")
    with pytest.raises(ExpressionError):
        compile_expression("/a in {")


def test_env_var_operand(df, monkeypatch):
    monkeypatch.setenv("DPS_TEST_VERB", "GET")
    assert ids(df, "/verb == ${DPS_TEST_VERB}") == ids(df, '/verb == "GET"')
    monkeypatch.delenv("DPS_TEST_VERB")
    with pytest.raises(ExpressionError):
        compile_expression("/verb == ${DPS_TEST_VERB}")


def test_cidr_errors(df):
    # IPv6 CIDRs compile since round 3 (128-bit column arithmetic)
    compile_expression('cidrContains(/ip, "2001:db8::/32")')
    # non-literal arguments are still config errors
    with pytest.raises(ExpressionError):
        compile_expression("cidrContains(/ip, /verb)")
