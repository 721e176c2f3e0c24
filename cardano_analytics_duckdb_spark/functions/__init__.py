from .rounding import rnd, rnd_sql

__all__ = ["rnd", "rnd_sql"]
