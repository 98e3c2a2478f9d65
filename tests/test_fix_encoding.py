"""fix_encoding (mojibake repair): frozen-spec pinning, planted-fixture
repair, one-level-per-pass contract, and DuckDB twin parity."""

import hashlib

import duckdb
from pyspark.sql import functions as F

from jepl_spark.operators.text import (
    MOJIBAKE_PAIRS,
    _cp1252_render,
    fix_encoding,
    fix_encoding_sql,
)


def test_mojibake_pairs_frozen():
    """The repair spec is ONE list consumed by two engines — pin size,
    head order (longest-first), SQL-literal safety, and a digest so an
    accidental generator change cannot shift both engines unnoticed."""
    assert len(MOJIBAKE_PAIRS) == 120
    assert MOJIBAKE_PAIRS[0] == ("â‚¬", "€")  # euro
    lens = [len(m) for m, _ in MOJIBAKE_PAIRS]
    assert lens == sorted(lens, reverse=True)
    for moji, fixed in MOJIBAKE_PAIRS:
        assert "'" not in moji and "'" not in fixed  # SQL-literal safe
        assert "\\" not in moji and "\\" not in fixed
    digest = hashlib.md5(repr(MOJIBAKE_PAIRS).encode("utf-8")).hexdigest()
    assert digest == "236be912d80656639a8943670ea8d27c"


def test_fix_encoding_repairs_planted(spark):
    """Literal mojibake fixtures with literal expected outputs —
    independent of the pair generator, so a generator bug cannot make
    the test agree with itself.  The right-double-quote case encodes
    via a cp1252-unmapped byte, so its mojibake carries a raw C1
    control (U+009D) — repair must run BEFORE the control strip or
    the evidence is destroyed."""
    cases = [
        ("cafÃ©", "café"),
        ("donâ€™t â€œquoteâ€\u009d me",
         "don’t “quote” me"),
        ("â‚¬5 â€” or â€“ less"
         " â€¦",
         "€5 — or – less …"),
        ("KÃ¶ln StraÃŸe naÃ¯ve",
         "Köln Straße naïve"),
        ("Å’uvre Å¡kola Å¾ivot",
         "Œuvre škola život"),
        ("Â«guillemetsÂ» Â©2024 30Â°C",
         "«guillemets» ©2024 30°C"),
        ("plain ASCII stays put", "plain ASCII stays put"),
        ("ctrl\u0000chars\u007f\u009dgone\tkept\nkept",
         "ctrlcharsgone\tkept\nkept"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i int, s string"
    )
    got = {r["i"]: r["f"]
           for r in df.select("i", fix_encoding(F.col("s")).alias("f")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_fix_encoding_one_level_per_pass_and_stable_on_clean(spark):
    """One pass removes exactly one corruption level (the documented
    contract); a second application of the chain is a no-op on the
    repaired text."""
    def corrupt(s):
        return "".join(_cp1252_render(b) for b in s.encode("utf-8"))

    clean = "it’s café — €5 «ok» Straße"
    once, twice = corrupt(clean), corrupt(corrupt(clean))
    df = spark.createDataFrame([(once, twice)], "a string, b string")
    row = df.select(
        fix_encoding(F.col("a")).alias("fa"),
        fix_encoding(fix_encoding(F.col("a"))).alias("faa"),
        fix_encoding(fix_encoding(F.col("b"))).alias("fbb"),
    ).collect()[0]
    assert row["fa"] == clean
    assert row["faa"] == clean       # stable once repaired
    assert row["fbb"] == clean       # two passes undo two levels


def test_fix_encoding_duckdb_twin_parity(spark):
    """The generated SQL replays the chain verbatim: every Latin-1
    supplement char, the cp1252 extras, and the punctuation block
    round-trip identically through both engines, embedded mid-text."""
    rows = [(i, f"x {moji} y{i}") for i, (moji, _) in enumerate(MOJIBAKE_PAIRS)]
    rows.append((len(rows),
                 "Ã¢â‚¬ mixed cafÃ© tail\u009d"))
    df = spark.createDataFrame(rows, "i int, s string")
    got = {r["i"]: r["f"]
           for r in df.select("i", fix_encoding(F.col("s")).alias("f")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    ora = dict(con.execute(f"SELECT i, {fix_encoding_sql('s')} FROM t").fetchall())
    assert got == ora
