from .parser import parse_statement, parse_expr, JeplParseError
from .ast import JeplValidationError

__all__ = ["parse_statement", "parse_expr", "JeplParseError", "JeplValidationError"]
