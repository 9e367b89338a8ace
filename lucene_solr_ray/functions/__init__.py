from .valuesource import (FUNCTIONS, compile_expr, eval_expr, parse_func,
                          parse_infix)

__all__ = ["FUNCTIONS", "compile_expr", "eval_expr", "parse_func",
           "parse_infix"]
