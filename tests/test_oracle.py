"""Oracle (reference-interpreter) tests.

Sources: the commented-out expression truth table (ast_test.go:81-144,
adopted as executable spec, adjusted for the JSON lane where all numbers
are float64 — eval.go:109-111) and the end-to-end eval goldens
(eval_test.go:73-102, 104-197).
"""

from __future__ import annotations

import math

import pytest

from jepl_spark.lang.parser import parse_expr
from jepl_spark.oracle import eval_expr, eval_sql, _json_lookup


def ev(expr_text: str, doc=None):
    return eval_expr(parse_expr(expr_text), doc)


# Docs pass through _json_lookup, so values behave like parsed JSON:
# numbers are float64.  List literals keep int64/float64/string types
# (quirk §2.9.8: float64 value never DeepEqual-matches an int64 element).
TRUTH_TABLE = [
    # (expr, doc, expected)
    ("uid IN [1,2,3]", {"uid": 1}, False),          # float vs int list!
    ("uid IN [1.0,2.0,3.0]", {"uid": 1}, True),
    ("uid IN [1.0,2.0,3.0]", {"uid": 4}, False),
    ("uid NI [1.0,2.0,3.0]", {"uid": 1}, False),
    ("uid NI [1.0,2.0,3.0]", {"uid": 4}, True),
    ("foo IN ['xxx','yyy','zzz']", {"foo": "xxx"}, True),
    ("foo NI ['xxx','yyy','zzz']", {"foo": "uuu"}, True),
    ("1 + 2", None, 3),
    ("(foo*2) + ( (4/2) + (3 * 5) - 0.5 )", {"foo": 5.0}, 26.5),
    ("foo / 2", {"foo": 4}, 2.0),
    # ÷0 typed dispatch (eval.go:190-273 — the `rhs == 0` interface-vs-
    # untyped-0 guard is dead code except for int64-lhs ÷ float64-0.0):
    ("foo / 0", {"foo": 4}, math.inf),       # float ÷ int 0 → Go +Inf
    ("foo / 0", {"foo": -4}, -math.inf),     # float ÷ 0 → Go -Inf
    ("foo / 0.0", {"foo": 4}, math.inf),     # float ÷ float 0 → +Inf
    ("4.0 / 0", None, math.inf),             # float lit ÷ int 0 → +Inf
    ("4 / 0.0", None, 0.0),                  # int ÷ float 0.0 → live guard
    ("4 / foo", {"foo": 0}, 0.0),            # int ÷ float64(0) field → 0.0
    ("4 = 4", None, True),
    ("4 <> 4", None, False),
    ("6 > 4", None, True),
    ("4 >= 4", None, True),
    ("4 < 6", None, True),
    ("4 <= 4", None, True),
    ("4 AND 5", None, None),
    ("0 = 'test'", None, False),
    ("1.0 = 1", None, True),
    ("1.2 = 1", None, False),
    ("true AND false", None, False),
    ("true OR false", None, True),
    ("false = 4", None, False),
    ("'foo' = 'bar'", None, False),
    ("'foo' = 'foo'", None, True),
    ("'' = 4", None, False),
    ("'foo' =~ /f.*/", None, True),
    ("'foo' =~ /b.*/", None, False),
    ("'foo' !~ /f.*/", None, False),
    ("'foo' !~ /b.*/", None, True),
    ("foo", {"foo": "bar"}, "bar"),
    ("foo = 'bar'", {"foo": "bar"}, True),
    ("foo = 'bar'", {"foo": None}, None),
    ("foo <> 'bar'", {"foo": "xxx"}, True),
    ("foo =~ /b.*/", {"foo": "bar"}, True),
    ("foo !~ /b.*/", {"foo": "bar"}, False),
    # nil-propagation quirks (eval.go:139-151): bool OR nil → false
    ("true OR missing = 1", {}, False),
    ("true AND missing = 1", {}, False),
    ("missing = 1 OR true", {}, None),   # nil lhs → nil
    ("missing = 1", {}, None),
    ("missing + 1", {}, None),
]


@pytest.mark.parametrize("expr,doc,expected", TRUTH_TABLE)
def test_expression_truth_table(expr, doc, expected):
    got = ev(expr, doc)
    assert got == expected and type(got) is type(expected), (
        f"{expr} over {doc}: got {got!r}, want {expected!r}"
    )


def test_div_zero_nan_and_int_panic():
    # 0/0 in the float path → Go NaN (eval.go:192-200, dead guard)
    assert math.isnan(ev("foo / 0", {"foo": 0}))
    assert math.isnan(ev("0.0 / 0.0"))
    # int64 ÷ int64 0: the reference panics (eval.go:267-273); the
    # oracle's documented stance is ZeroDivisionError
    with pytest.raises(ZeroDivisionError):
        ev("4 / 0")


def test_json_lookup_semantics():
    doc = {"a": {"b": {"c": 5}}, "s": "x", "arr": [1, 2], "obj": {"k": 1}, "n": None}
    assert _json_lookup(doc, ["a", "b", "c"]) == 5.0
    assert isinstance(_json_lookup(doc, ["a", "b", "c"]), float)
    assert _json_lookup(doc, ["s"]) == "x"
    assert _json_lookup(doc, ["missing"]) is None
    assert _json_lookup(doc, ["arr"]) is None   # non-scalar → nil
    assert _json_lookup(doc, ["obj"]) is None
    assert _json_lookup(doc, ["n"]) is None


PACKETBEAT_DOCS = [
    {
        "uid": i % 3,
        "tcp": {
            "src_ip": i % 2,
            "dst_ip": i % 3,
            "in_bytes": i * 10,
            "out_bytes": 20,
            "in_pkts": i,
            "out_pkts": 2,
        },
    }
    for i in range(10)
]


def test_eval_query1_golden():
    # eval_test.go:87-102
    pm = eval_sql(
        "select sum(tcp.in_bytes) from packetbeat where uid = 1", PACKETBEAT_DOCS
    )
    assert list(pm.keys()) == ["uid = 1"]
    assert pm["uid = 1"] == [120.0]


def test_eval_query_grouped_golden():
    # eval_test.go:73-85 — five aggregates, two group dims.
    pm = eval_sql(
        "select max(tcp.in_bytes), min(tcp.in_pkts), count(tcp.in_pkts), "
        "sum(tcp.in_pkts), avg(tcp.in_pkts) from packetbeat where uid = 1 "
        "group by tcp.src_ip, tcp.dst_ip",
        PACKETBEAT_DOCS,
    )
    # groups enumerated over ALL docs pre-WHERE → 6 distinct (src,dst)
    assert len(pm) == 6
    k11 = "true AND 1.000 = tcp.src_ip AND 1.000 = tcp.dst_ip AND uid = 1"
    k01 = "true AND 0.000 = tcp.src_ip AND 1.000 = tcp.dst_ip AND uid = 1"
    # (1,1): docs i=1,7 → max(in_bytes)=70, min(in_pkts)=1, count=2, sum=8, avg=4
    assert pm[k11] == [70.0, 1.0, 2.0, 8.0, 4.0]
    # (0,1): doc i=4 → 40, 4, 1, 4, 4
    assert pm[k01] == [40.0, 4.0, 1.0, 4.0, 4.0]
    # all other groups match zero rows → all-zero points (quirk §2.9.6)
    for k, v in pm.items():
        if k not in (k11, k01):
            assert v == [0.0, 0.0, 0.0, 0.0, 0.0], (k, v)


def test_eval_http_rich_golden():
    # eval_test.go:104-197 benchmark doc: per-doc total = 980
    doc = {
        "_source": {
            "guid": "4a859fff6e5c4521aab187eee1cfceb8",
            "http": {"in_bytes": 560, "out_bytes": 420, "status_code": 200},
        },
        "@timestamp": 1479983530,
    }
    pm = eval_sql(
        "select sum(_source.http.in_bytes+_source.http.out_bytes) AS total_bytes "
        "FROM packetbeat where _source.guid='4a859fff6e5c4521aab187eee1cfceb8'",
        [doc, doc, doc],
    )
    key = "_source.guid = '4a859fff6e5c4521aab187eee1cfceb8'"
    assert pm[key] == [2940.0]


def test_post_agg_arithmetic():
    pm = eval_sql(
        "select sum(v) * (sum(v) / count(v)) AS m from t where v > 0",
        [{"v": 2}, {"v": 4}, {"v": -1}],
    )
    # sum=6, count=2 → 6 * (6/2) = 18
    assert pm["v > 0"] == [18.0]


def test_avg_divides_by_matched_rows_not_nonnull():
    # quirk §2.9.2: rows matching WHERE but missing the field still count
    pm = eval_sql(
        "select avg(v) from t where uid = 1",
        [{"uid": 1, "v": 10}, {"uid": 1}, {"uid": 0, "v": 99}],
    )
    assert pm["uid = 1"] == [5.0]  # 10 / 2 matched rows


def test_max_min_missing_field_contributes_zero():
    # quirk §2.9.4
    pm = eval_sql(
        "select max(v), min(v) from t where uid = 1",
        [{"uid": 1, "v": -5}, {"uid": 1}],
    )
    assert pm["uid = 1"] == [0.0, -5.0]


def test_count_counts_matched_rows():
    # quirk §2.9.1: count(f) ignores whether f exists
    pm = eval_sql(
        "select count(nonexistent) from t where uid = 1",
        [{"uid": 1}, {"uid": 1}, {"uid": 2}],
    )
    assert pm["uid = 1"] == [2.0]


def test_empty_match_returns_zeros():
    pm = eval_sql("select sum(v), avg(v) from t where uid = 99", [{"uid": 1, "v": 3}])
    assert pm["uid = 99"] == [0.0, 0.0]


def test_string_row_dropped_when_condition_non_bool():
    # quirk §2.9.12: a doc whose WHERE result is non-boolean is dropped
    pm = eval_sql(
        "select count(v) from t where v + 1",
        [{"v": 1}, {"v": "s"}, {}],
    )
    assert pm["v + 1"] == [0.0]  # numeric result is not boolean true
