from .cleaning import clean_events, range_filter
from .dedup import dedup_keep_any, dedup_row_number, exact_dedup
from .merge import anti_join_merge, high_water_mark_filter, incremental_upsert

__all__ = [
    "anti_join_merge",
    "clean_events",
    "dedup_keep_any",
    "dedup_row_number",
    "exact_dedup",
    "high_water_mark_filter",
    "incremental_upsert",
    "range_filter",
]
