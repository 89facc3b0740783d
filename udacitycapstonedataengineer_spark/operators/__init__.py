from .cleaning import dedup_by_key, drop_nulls, null_profile, row_accounting
from .dims import build_calendar_dim, build_dimension

__all__ = [
    "dedup_by_key",
    "drop_nulls",
    "null_profile",
    "row_accounting",
    "build_calendar_dim",
    "build_dimension",
]
