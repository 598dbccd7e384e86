from .exact import dmoney, drate, dsum, dsum_expr, exact_div

__all__ = ["dmoney", "drate", "dsum", "dsum_expr", "exact_div"]
