"""Risk scalar functions, Sigma rule engine, CIDR — constant-exact parity."""

from pyspark.sql import functions as F

from webloghunter_spark.functions.cidr import ip_in_cidr
from webloghunter_spark.functions.risk import (
    method_risk_expr,
    status_risk_expr,
    uri_risk_udf,
)
from webloghunter_spark.rules.sigma import DEFAULT_RULES, apply_rules, compile_selection


def test_method_risk_table(spark):
    cases = {
        "GET": 10, "get": 10, "HEAD": 20, "OPTIONS": 25, "POST": 45,
        "PUT": 80, "DELETE": 80, "TRACE": 80, "CONNECT": 80,
        "INVALID": 60, "PROPFIND": 60,
    }
    df = spark.createDataFrame([(m,) for m in cases], "method string")
    out = {r.method: r.r for r in df.select("method", method_risk_expr().alias("r")).collect()}
    assert out == cases


def test_status_risk_table_and_buckets(spark):
    cases = {
        100: 20, 200: 30, 201: 90, 207: 70, 301: 10, 304: 20,
        400: 15, 403: 40, 404: 10, 429: 35, 500: 90, 502: 70,
        # bucket fallbacks
        199: 25, 226: 35, 399: 15, 418: 25, 599: 80,
        # outside all ranges
        0: 90, 999: 90,
    }
    df = spark.createDataFrame([(s,) for s in cases], "status int")
    out = {r.status: r.r for r in df.select("status", status_risk_expr().alias("r")).collect()}
    assert out == cases


URI_CASES = {
    "/index.html": 0,
    "/admin%2Flogin": 10 + 25,        # 1 decode level + sensitive path
    "/%252e%252e%252f": 20 + 80,      # 2 levels + traversal in path
    "/admin/panel": 25,
    "/../../etc/passwd": 80,
    "/x?f=../../etc/passwd": 15,
    "/c99.php": 50,                   # known webshell name
    "/file.php.jpg": 80,
    "/dump.sql": 10,
    "/run.exe": 10,
    "/upload/../../c99.php.png?x=%252e": 100,  # capped
}


def test_uri_risk_values(spark):
    udf = uri_risk_udf(shells=frozenset({"c99.php", "cmd.php"}))
    df = spark.createDataFrame([(u,) for u in URI_CASES], "request_uri string")
    out = {r.request_uri: r.r for r in df.select("request_uri", udf("request_uri").alias("r")).collect()}
    assert out == URI_CASES


def test_uri_risk_col_matches_udf(spark):
    """The native fast path of uri_risk_col scores bit-for-bit what the
    Arrow UDF scores, across plain URIs (native path), encoded/edge
    URIs (routed to the UDF), and NULL."""
    from webloghunter_spark.functions.risk import uri_risk_col

    shells = frozenset({"c99.php", "cmd.php"})
    uris = list(URI_CASES) + [
        "/index.html", "/admin/panel", "/upload/x.php.jpg",
        "/../../etc/passwd", "/dump.sql", "/x?f=../../etc", "/login",
        "/a/b/c99.php", "/a/cmd.php?x=1", "/a?b?c=../d",   # query at FIRST '?'
        "/a/..\\win", "/x\\..y", "/weird�char", "/UPPER/ADMIN/X",
        "/x.PHP.Jpg", "/a.exe", "/shop.pl?id=1", "/a/b/",
        "", "no/leading/slash.sql", "plain",
        # every class that must fall back to the UDF
        "/enc%2e%2e/x", "/frag#../x", "/semi;p=../x", "http://h/../x",
        "//netloc/../x", "/tab\t../x", "/nl\n../x", "/cr\r../x",
        None,
    ]
    df = spark.createDataFrame([(u,) for u in uris], "request_uri string")
    udf = uri_risk_udf(shells)
    native = uri_risk_col("request_uri", shells)
    rows = df.select(
        udf("request_uri").alias("want"), native.alias("got"), "request_uri"
    ).collect()
    bad = [(r.request_uri, r.want, r.got) for r in rows if r.want != r.got]
    assert not bad, bad


def test_cidr_ipv4_and_invalid(spark):
    rows = [("10.10.10.5",), ("10.10.32.5",), ("192.168.0.1",), ("garbage",), ("::1",)]
    df = spark.createDataFrame(rows, "ip string")
    out = df.select(
        "ip",
        ip_in_cidr("ip", ["10.10.10.0/24"]).alias("a"),
        ip_in_cidr("ip", ["10.10.0.0/19", "192.168.0.0/16"]).alias("b"),
        ip_in_cidr("ip", ["::/0"]).alias("c"),
        ip_in_cidr("ip", ["notacidr"]).alias("d"),
    ).collect()
    got = {r.ip: (r.a, r.b, r.c, r.d) for r in out}
    assert got["10.10.10.5"] == (True, True, False, False)
    assert got["10.10.32.5"] == (False, False, False, False)
    assert got["192.168.0.1"] == (False, True, False, False)
    assert got["garbage"] == (False, False, False, False)
    assert got["::1"] == (False, False, True, False)


def _scored(spark, rows):
    df = spark.createDataFrame(
        rows,
        "request_uri string, status int, resp_size long, method string, "
        "request_count long, uri_risk int, status_risk int, referrer string, "
        "user_agent string, ip string",
    )
    return apply_rules(df, DEFAULT_RULES).collect()


def test_rules_highest_score_wins(spark):
    # Row qualifies for 'Large Request Count & Server Error' (80) AND
    # 'Status Code Risk' (40): higher wins.
    rows = [("/x", 500, 100, "GET", 600, 0, 90, "-", "ua", "1.1.1.1")]
    r = _scored(spark, rows)[0]
    assert r.risk_score == 80.0
    assert r.rule_applied == "Large Request Count & Server Error"


def test_rules_tie_first_in_file_order(spark):
    # status_risk>=70 alone -> only 'Status Code Risk' (40)
    rows = [("/x", 201, 10, "GET", 1, 0, 90, "-", "ua", "1.1.1.1")]
    r = _scored(spark, rows)[0]
    assert r.risk_score == 40.0
    assert r.rule_applied == "Status Code Risk"


def test_rules_contains_case_insensitive(spark):
    rows = [("/cgi?cmd=WHOAMI", 200, 30, "GET", 1, 0, 30, "-", "ua", "1.1.1.1")]
    r = _scored(spark, rows)[0]
    assert r.risk_score == 71.1


def test_rules_no_match(spark):
    rows = [("/ok", 200, 30, "GET", 1, 0, 30, "-", "ua", "1.1.1.1")]
    r = _scored(spark, rows)[0]
    assert r.risk_score == 0.0 and r.rule_applied == ""


def test_referrer_rule(spark):
    rows = [("/ok", 404, 0, "GET", 1, 0, 10, "https://fofa.info/x", "ua", "1.1.1.1")]
    r = _scored(spark, rows)[0]
    assert r.risk_score == 67.5


def test_rules_contains_is_regex(spark):
    # Reference parity: pandas str.contains defaults to regex=True, so
    # 'a|b' is an alternation and '.php' matches any char before 'php'.
    from webloghunter_spark.rules.sigma import _rule, apply_rules

    rules = [_rule("Alt", 50.0, {"request_uri|contains": "evil|bad"})]
    df = spark.createDataFrame(
        [("/evil",), ("/bad",), ("/evil|bad",), ("/good",)],
        "request_uri string",
    )
    got = {r.request_uri: r.risk_score for r in apply_rules(df, rules).collect()}
    assert got == {"/evil": 50.0, "/bad": 50.0, "/evil|bad": 50.0, "/good": 0.0}


def test_salted_join_rejects_right_outer(spark):
    import pytest
    from webloghunter_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "x")], "k long, t string")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, on="k", how=how)
    assert salted_join(left, right, on="k", how="left_semi").count() == 1
