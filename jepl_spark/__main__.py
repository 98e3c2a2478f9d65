"""Command-line JEPL runner.

Batch:

    python -m jepl_spark "select count(x) AS n from t where x > 1" \\
        --table t=/path/to/t.parquet [--table u=/path/u.parquet] \\
        [--non-null t=x,y] [--master local[4]] [--json]

Streaming (event-time windowed, availableNow, exactly-once sink):

    python -m jepl_spark "select count(x) AS n from t where x > 1" \\
        --table t=/path/to/dir --window "1 hour" --ts-col ts \\
        [--slide "30 minutes" | --session-gap "10 minutes"] \\
        [--watermark "1 hour"] --sink /out/dir --checkpoint /ckpt [--json]

Parses the rule, compiles it against the registered parquet table(s),
and prints the result rows (one JSON object per line with --json,
otherwise Spark's .show()).  In streaming mode the FROM table is read
as a file stream, the rule runs as a windowed Structured Streaming
query into an IdempotentParquetSink, and the committed rows are
printed after the availableNow drain; re-running with the same
--checkpoint resumes exactly-once.  Exit code 1 on
parse/validation/compile errors, with the reference-identical error
message on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="python -m jepl_spark")
    p.add_argument("rule", help="JEPL statement")
    p.add_argument("--table", action="append", default=[],
                   metavar="NAME=PATH", help="register a parquet table")
    p.add_argument("--non-null", action="append", default=[],
                   metavar="NAME=COL[,COL...]",
                   help="declare never-null columns (unlocks OR pushdown)")
    p.add_argument("--nan-col", action="append", default=[],
                   metavar="NAME=COL[,COL...]",
                   help="declare float columns that may hold stored NaN")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--json", action="store_true",
                   help="print one JSON object per row instead of .show()")
    p.add_argument("--window", default=None,
                   help="streaming mode: tumbling window duration")
    p.add_argument("--slide", default=None)
    p.add_argument("--session-gap", default=None)
    p.add_argument("--watermark", default="0 seconds")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--sink", default=None, help="streaming output dir")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args(argv)
    if args.window and not (args.sink and args.checkpoint):
        p.error("--window requires --sink and --checkpoint")

    def parse_kv(entries):
        out = {}
        for e in entries:
            if "=" not in e:
                p.error(f"expected NAME=VALUE, got {e!r}")
            k, v = e.split("=", 1)
            out[k] = v
        return out

    tables = parse_kv(args.table)
    non_null = {k: set(v.split(",")) for k, v in parse_kv(args.non_null).items()}
    nan_cols = {k: set(v.split(",")) for k, v in parse_kv(args.nan_col).items()}

    from pyspark.errors import AnalysisException
    from pyspark.sql import SparkSession

    from jepl_spark.compiler.expr import JeplCompileError
    from jepl_spark.engine import JeplEngine
    from jepl_spark.lang.ast import JeplValidationError
    from jepl_spark.lang.parser import JeplParseError

    preexisting = SparkSession.getActiveSession()
    spark = (
        SparkSession.builder.master(args.master)
        .appName("jepl-cli")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    if preexisting is None:
        # only quiet a session we created — never mutate a host session
        # (e.g. the pytest fixture) behind its owner's back
        spark.sparkContext.setLogLevel("ERROR")
    try:
        eng = JeplEngine(spark, tables, non_null=non_null, nan_cols=nan_cols)
        if args.window:
            from jepl_spark.lang.parser import parse_statement
            from jepl_spark.streaming.engine import (
                file_stream,
                run_rule_stream,
                run_to_completion,
            )
            from jepl_spark.streaming.sink import IdempotentParquetSink

            stmt = parse_statement(args.rule)
            name = stmt.sources[0].database if stmt.sources else None
            if name not in tables:
                print(f"streaming mode: FROM table {name!r} must be "
                      f"registered with --table", file=sys.stderr)
                return 1
            schema = spark.read.parquet(tables[name]).schema
            sink = IdempotentParquetSink(args.sink)
            q = run_rule_stream(
                args.rule,
                file_stream(spark, tables[name], schema),
                ts_col=args.ts_col,
                duration=args.window or "0",
                slide=args.slide,
                session_gap=args.session_gap,
                watermark=args.watermark,
                non_null=non_null.get(name, frozenset()),
                sink=sink,
                checkpoint=args.checkpoint,
            )
            run_to_completion(q, timeout_s=3600)
            df = sink.read_committed(spark)
        else:
            df = eng.sql(args.rule)
        if args.json:
            for row in df.collect():
                print(json.dumps(row.asDict(), default=str))
        else:
            df.show(100, truncate=False)
        return 0
    except (JeplParseError, JeplValidationError, JeplCompileError) as e:
        print(str(e), file=sys.stderr)
        return 1
    except AnalysisException as e:
        # unregistered FROM table / bad --table path: one clean line,
        # not a multi-screen JVM traceback
        print(f"analysis error: {e.getMessage().splitlines()[0]}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
