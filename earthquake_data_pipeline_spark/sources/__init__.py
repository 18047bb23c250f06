from .usgs import (
    FixtureFetcher,
    HttpFetcher,
    SyntheticFetcher,
    UsgsDataSource,
    fetch_to_dataframe,
    plan_windows,
)

__all__ = [
    "FixtureFetcher",
    "HttpFetcher",
    "SyntheticFetcher",
    "UsgsDataSource",
    "fetch_to_dataframe",
    "plan_windows",
]
