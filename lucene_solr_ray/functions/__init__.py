from .valuesource import FUNCTIONS, compile_expr, eval_expr, parse_func

__all__ = ["FUNCTIONS", "compile_expr", "eval_expr", "parse_func"]
