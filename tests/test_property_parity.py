"""Property-based parity: randomly generated JEPL rules + documents,
Spark-compiled plans vs the reference oracle.

Strategy: build random WHERE expressions (bounded depth, drawn from the
full operator surface) and random aggregate rules over a small schema,
evaluate both ways, require identical matched-row sets / metric maps.
Hypothesis shrinks failures to minimal counterexamples.

To keep Spark round-trips affordable, cases are generated up front with
a seeded RNG (deterministic corpus) and executed in ONE batched
DataFrame pass per lane rather than one Spark job per example.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from jepl_spark.compiler.expr import ExprCompiler
from jepl_spark.compiler.select import compile_select
from jepl_spark.lang.parser import parse_expr, parse_statement
from jepl_spark.oracle import eval_expr, eval_sql

from helpers import _group_key

SCHEMA = StructType(
    [
        StructField("a", DoubleType()),
        StructField("b", DoubleType()),
        StructField("s", StringType()),
        StructField("k", StringType()),
    ]
)

NUM_FIELDS = ["a", "b"]
STR_FIELDS = ["s", "k"]
STR_VALUES = ["x", "y", "zz", ""]


def gen_num_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.4:
        return rng.choice(
            NUM_FIELDS
            + [str(rng.choice([0, 1, 2, 7])), f"{rng.uniform(-3, 9):.2f}", "missing"]
        )
    op = rng.choice(["+", "-", "*", "/"])
    return f"({gen_num_expr(rng, depth - 1)} {op} {gen_num_expr(rng, depth - 1)})"


def gen_pred(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.35:
        kind = rng.randrange(6)
        if kind == 0:
            cmp = rng.choice(["=", "!=", "<", "<=", ">", ">="])
            return f"{gen_num_expr(rng, 1)} {cmp} {gen_num_expr(rng, 1)}"
        if kind == 1:
            f = rng.choice(STR_FIELDS)
            v = rng.choice(STR_VALUES)
            return f"{f} {rng.choice(['=', '!='])} '{v}'"
        if kind == 2:
            f = rng.choice(NUM_FIELDS + ["missing"])
            vals = sorted({round(rng.uniform(0, 8), 1) for _ in range(3)})
            lst = ", ".join(str(v) for v in vals)
            return f"{f} {rng.choice(['IN', 'NI'])} [{lst}]"
        if kind == 3:
            f = rng.choice(STR_FIELDS)
            vals = ", ".join(f"'{v}'" for v in rng.sample(STR_VALUES, 2))
            return f"{f} {rng.choice(['IN', 'NI'])} [{vals}]"
        if kind == 4:
            f = rng.choice(STR_FIELDS)
            pat = rng.choice(["^x", "z+", "y$", "."])
            return f"{f} {rng.choice(['=~', '!~'])} /{pat}/"
        return rng.choice(["true", "false"])
    op = rng.choice(["AND", "OR", "AND", "OR"])
    lhs, rhs = gen_pred(rng, depth - 1), gen_pred(rng, depth - 1)
    if rng.random() < 0.3:
        lhs = f"({lhs})"
    if rng.random() < 0.3:
        rhs = f"({rhs})"
    return f"{lhs} {op} {rhs}"


def gen_doc(rng: random.Random) -> dict:
    doc = {}
    if rng.random() < 0.85:
        doc["a"] = round(rng.uniform(-2, 9), 1)
    if rng.random() < 0.85:
        doc["b"] = float(rng.randrange(0, 6))
    if rng.random() < 0.85:
        doc["s"] = rng.choice(STR_VALUES)
    doc["k"] = rng.choice(["g1", "g2", "g3"])
    return doc


def full_row(doc: dict) -> dict:
    return {f: doc.get(f) for f in ("a", "b", "s", "k")}


N_PREDICATES = 120
N_DOCS = 40


def test_predicate_parity_bulk(spark):
    """120 random predicates × 40 random docs: the compiled filter's
    matched set must equal the oracle's, row for row."""
    rng = random.Random(20240816)
    docs = [gen_doc(rng) for _ in range(N_DOCS)]
    preds = [gen_pred(rng, 3) for _ in range(N_PREDICATES)]

    rows = [dict(full_row(d), __i=float(i)) for i, d in enumerate(docs)]
    schema = StructType(list(SCHEMA.fields) + [StructField("__i", DoubleType())])
    df = spark.createDataFrame(rows, schema=schema)
    compiler = ExprCompiler(schema)

    # one Spark pass: a column per predicate.  A generated int÷int-0
    # (e.g. `0 / 0`) raises on BOTH sides — the compiler at constant
    # fold, the oracle at eval (the reference panics there) — which is
    # itself parity; assert the oracle agrees and drop the case.
    from jepl_spark.compiler.expr import JeplCompileError

    cols = [F.col("__i")]
    kept = []
    for j, p in enumerate(preds):
        try:
            pred_col = compiler.compile_predicate(parse_expr(p))
        except JeplCompileError:
            with pytest.raises(ZeroDivisionError):
                eval_expr(parse_expr(p), docs[0])
            continue
        except Exception as e:  # pragma: no cover
            pytest.fail(f"compile failed for {p!r}: {e}")
        cols.append(F.coalesce(pred_col, F.lit(False)).alias(f"p{j}"))
        kept.append(j)
    out = {int(r["__i"]): r for r in df.select(*cols).collect()}

    mismatches = []
    for j in kept:
        for i, d in enumerate(docs):
            oracle_pass = eval_expr(parse_expr(preds[j]), d) is True
            spark_pass = bool(out[i][f"p{j}"])
            if oracle_pass != spark_pass:
                mismatches.append((preds[j], d, spark_pass, oracle_pass))
    assert not mismatches, (
        f"{len(mismatches)} mismatches; first: "
        f"pred={mismatches[0][0]!r} doc={mismatches[0][1]} "
        f"spark={mismatches[0][2]} oracle={mismatches[0][3]}"
    )


N_RULES = 25


def test_rule_parity_bulk(spark):
    """Random full rules (aggregates + optional GROUP BY) vs eval_sql."""
    rng = random.Random(77)
    docs = [gen_doc(rng) for _ in range(N_DOCS)]
    df = spark.createDataFrame([full_row(d) for d in docs], schema=SCHEMA)

    failures = []
    for _ in range(N_RULES):
        n_aggs = rng.randrange(1, 4)
        fields = []
        for fi in range(n_aggs):
            def call():
                fn = rng.choice(["count", "sum", "avg", "max", "min"])
                arg = rng.choice(NUM_FIELDS) if fn == "count" else gen_num_expr(rng, 1)
                return f"{fn}({arg})"

            if rng.random() < 0.4:  # post-aggregate arithmetic field
                op = rng.choice(["+", "-", "*", "/"])
                fields.append(f"{call()} {op} {call()} AS f{fi}")
            elif rng.random() < 0.2:  # arithmetic with a literal
                fields.append(f"{call()} * {rng.randrange(1, 5)} AS f{fi}")
            else:
                fields.append(f"{call()} AS f{fi}")
        pred = gen_pred(rng, 2)
        group = " group by k" if rng.random() < 0.5 else ""
        sql = f"select {', '.join(fields)} from t where {pred}{group}"
        try:
            stmt = parse_statement(sql)
        except Exception:
            continue  # generator produced an invalid rule; skip
        try:
            expected = eval_sql(sql, docs)
        except ZeroDivisionError:
            # int÷int-0 in a constant subtree: the reference panics;
            # the compiler must reject the same rule
            from jepl_spark.compiler.expr import JeplCompileError

            with pytest.raises(JeplCompileError):
                compile_select(stmt, df)
            continue
        result = compile_select(stmt, df)
        rows = result.collect()
        n_dims = 1 if group else 0
        got = {}
        for r in rows:
            vals = list(r)
            key = _group_key(stmt, vals[:n_dims]) if n_dims else str(stmt.condition)
            got[key] = [float(v) for v in vals[n_dims:]]
        if set(got) != set(expected):
            failures.append((sql, "keys", sorted(got), sorted(expected)))
            continue
        for key in expected:
            for x, y in zip(got[key], expected[key]):
                same = (math.isnan(x) and math.isnan(y)) or math.isclose(
                    x, y, rel_tol=1e-9, abs_tol=1e-9
                )
                if not same:
                    failures.append((sql, key, got[key], expected[key]))
                    break
    assert not failures, f"{len(failures)} rule mismatches; first: {failures[0]}"


# -- JSONANY lane: dotted extraction from raw-JSON string columns -----------


def gen_json_pred(rng: random.Random, depth: int) -> str:
    """Predicates over props.p (always JSON number or missing) and
    props.q (always JSON string or missing) — value types consistent
    with usage, as the reference corpus keeps them (the documented
    JSONANY divergence only bites on type-punned data)."""
    if depth <= 0 or rng.random() < 0.4:
        kind = rng.randrange(5)
        if kind == 0:
            cmp = rng.choice(["=", "!=", "<", "<=", ">", ">="])
            return f"props.p {cmp} {gen_num_expr(rng, 1)}"
        if kind == 1:
            return f"props.q {rng.choice(['=', '!='])} '{rng.choice(STR_VALUES)}'"
        if kind == 2:
            vals = sorted({round(rng.uniform(0, 8), 1) for _ in range(3)})
            return f"props.p {rng.choice(['IN', 'NI'])} [{', '.join(map(str, vals))}]"
        if kind == 3:
            pat = rng.choice(["^x", "z+", "y$", "."])
            return f"props.q {rng.choice(['=~', '!~'])} /{pat}/"
        cmp = rng.choice(["=", "!=", "<", ">"])
        return f"a {cmp} props.p"
    op = rng.choice(["AND", "OR"])
    return f"{gen_json_pred(rng, depth - 1)} {op} {gen_json_pred(rng, depth - 1)}"


def test_jsonany_predicate_parity_bulk(spark):
    """100 random predicates over dotted raw-JSON extraction
    (get_json_object lane) × 40 docs: compiled filter vs oracle."""
    import json as _json

    rng = random.Random(31337)
    docs = []
    for _ in range(N_DOCS):
        d = gen_doc(rng)
        props = {}
        if rng.random() < 0.8:
            props["p"] = round(rng.uniform(-2, 9), 1)
        if rng.random() < 0.8:
            props["q"] = rng.choice(STR_VALUES)
        if props or rng.random() < 0.7:
            d["props"] = props
        docs.append(d)

    schema = StructType(
        list(SCHEMA.fields)
        + [StructField("props", StringType()), StructField("__i", DoubleType())]
    )
    rows = [
        dict(
            full_row(d),
            props=_json.dumps(d["props"]) if "props" in d else None,
            __i=float(i),
        )
        for i, d in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, schema=schema)
    compiler = ExprCompiler(schema)

    preds = [gen_json_pred(rng, 2) for _ in range(100)]
    cols = [F.col("__i")]
    for j, p in enumerate(preds):
        pred_col = compiler.compile_predicate(parse_expr(p))
        cols.append(F.coalesce(pred_col, F.lit(False)).alias(f"p{j}"))
    out = {int(r["__i"]): r for r in df.select(*cols).collect()}

    mismatches = []
    for j, p in enumerate(preds):
        for i, d in enumerate(docs):
            oracle_pass = eval_expr(parse_expr(p), d) is True
            spark_pass = bool(out[i][f"p{j}"])
            if oracle_pass != spark_pass:
                mismatches.append((p, d, spark_pass, oracle_pass))
    assert not mismatches, (
        f"{len(mismatches)} mismatches; first: "
        f"pred={mismatches[0][0]!r} doc={mismatches[0][1]} "
        f"spark={mismatches[0][2]} oracle={mismatches[0][3]}"
    )
