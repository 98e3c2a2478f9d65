"""jepl_spark — a PySpark-native streaming CEP engine for the JEPL rule
language (reference semantics: github.com/youfulife/jepl, studied at
/root/reference; implementation is new and Spark-first).

Layers:
- ``jepl_spark.lang``      — tokenizer / parser / validator (pure Python)
- ``jepl_spark.compiler``  — AST → PySpark Column / DataFrame plans
- ``jepl_spark.streaming`` — windows, watermarks, stateful ops, sinks
- ``jepl_spark.sources``   — table loaders + deterministic clip generator
- ``jepl_spark.operators`` — dedup / similarity / text-analysis pipeline ops
- ``jepl_spark.oracle``    — literal reference interpreter (test oracle)
"""

from .lang.parser import parse_statement, JeplParseError
from .lang.ast import JeplValidationError

__all__ = [
    "parse_statement",
    "JeplParseError",
    "JeplValidationError",
]
