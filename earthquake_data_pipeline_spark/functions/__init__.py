from .scalar import (
    case_rank,
    decade_of,
    epoch_ms_to_timestamp,
    in_closed_range,
    severity_of,
    surrogate_key,
    token_pattern,
)

__all__ = [
    "case_rank",
    "decade_of",
    "epoch_ms_to_timestamp",
    "in_closed_range",
    "severity_of",
    "surrogate_key",
    "token_pattern",
]
