"""Admission-feedback rate limiting: the token bucket.

operators/analytics.py::rate_limit_flags computes the STATELESS
disciplines (the trailing count includes throttled events). The token
bucket is the real ingress-edge policy: each admission SPENDS a token,
so whether event i is admitted depends on which earlier events were —
an inherently sequential recurrence per key that no window frame can
express. This is the repo's canonical applyInPandas shape: Python only
where the semantics demand it, one hash shuffle on the key, pure
integer state so a SQL oracle (recursive CTE) replays it bit-for-bit.

State is kept in 1/refill_den token units: a bucket holds burst tokens
(capacity burst*den units), refills at refill_num/refill_den tokens per
second, and each admission costs den units. Integer units mean no float
drift ever decides an admission.

100 TB: partition by key — each group is processed by one task, which
is the inherent cost of admission feedback (the recurrence is a prefix
computation; Blelloch-style scan parallelization exists but needs the
min/plus semiring per segment — not worth it until a single key's
events overflow one task, at which point split by (key, epoch-day) and
carry a day of boundary state, as rate_limit_flags documents).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_bucket_admit(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    burst: int = 2,
    refill_num: int = 1,
    refill_den: int = 7200,
) -> DataFrame:
    """Per-key token-bucket admission over (ts, id)-ordered events.

    For each key, with t_0 its first event: tokens start FULL
    (burst*den units); before event i (i>0),
    ``units = min(burst*den, units + (ts_i - ts_{i-1}) * num)``;
    the event is admitted iff ``units >= den`` and admission subtracts
    ``den``. Ties on ts order by id — the same total order the oracle's
    row_number uses, so replay is exact.

    Output: one row per event with the pre-admission unit count and the
    admission flag.
    """
    cap = burst * refill_den
    out_schema = (
        f"{id_col} long, {key_col} long, ts_s long, "
        "units_before long, admitted boolean"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts_s", id_col], ignore_index=True)
        ts_arr = pdf["ts_s"].to_numpy()
        n = len(ts_arr)
        before = np.empty(n, dtype=np.int64)
        admitted = np.empty(n, dtype=bool)
        units = cap
        prev_ts = None
        for i in range(n):
            ts = ts_arr[i]
            if prev_ts is not None:
                units = min(cap, units + (ts - prev_ts) * refill_num)
            prev_ts = ts
            before[i] = units
            ok = units >= refill_den
            admitted[i] = ok
            if ok:
                units -= refill_den
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                key_col: pdf["k"],
                "ts_s": pdf["ts_s"],
                "units_before": before,
                "admitted": admitted,
            }
        )

    e = events.select(
        F.col(id_col),
        F.col(key_col).alias("k"),
        F.floor(F.unix_timestamp(F.col(ts_col))).cast("long").alias("ts_s"),
    )
    return e.groupBy("k").applyInPandas(fn, out_schema)
