from .render import render_row_expr, row_hash_expr

__all__ = ["render_row_expr", "row_hash_expr"]
