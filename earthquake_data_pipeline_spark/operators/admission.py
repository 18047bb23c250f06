"""Admission-feedback rate limiting: the token bucket.

operators/analytics.py::rate_limit_flags computes the STATELESS
disciplines (the trailing count includes throttled events). The token
bucket is the real ingress-edge policy: each admission SPENDS a token,
so whether event i is admitted depends on which earlier events were —
an inherently sequential recurrence per key that no window frame can
express. This is the repo's canonical streaming-state Python shape:
Python only where the semantics demand it, one hash shuffle on the key,
pure integer state so a SQL oracle (recursive CTE) replays it
bit-for-bit.

State is kept in 1/refill_den token units: a bucket holds burst tokens
(capacity burst*den units), refills at refill_num/refill_den tokens per
second, and each admission costs den units. Integer units mean no float
drift ever decides an admission.

100 TB: partition by key, sort WITHIN partitions by (key, ts, id) on
the JVM side (spill-safe external sort), then stream the partition
through ``mapInPandas`` with a per-key state dict carried across Arrow
batches. Task memory is O(arrow_batch + keys_in_partition) — NOT
O(largest group): the earlier ``groupBy().applyInPandas`` shape
materialized a key's ENTIRE history as one pandas frame, so a single
hot key (a bot hammering the ingress edge with 10^8 events — the
web-scale norm, same duplicate-mass lesson as pairing.bucket_pairs)
OOM'd the task doing work that needs only rolling state. The serial
chain per key is inherent to admission feedback (a prefix recurrence;
Blelloch-style scan parallelization needs the min/plus semiring per
segment — not worth it until one key's LATENCY dominates, at which
point split by (key, epoch-day) and carry a day of boundary state, as
rate_limit_flags documents), but serial never has to mean resident.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..qcommon import epoch_s


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

    Execution shape (hot-key safe): one hash exchange on the key, a
    partition-local (key, ts, id) sort, then a streaming
    ``mapInPandas`` stage whose state dict survives Arrow batch
    boundaries — a key with more events than one Arrow batch (or one
    task's memory) streams through in rolling O(1) state. Keys are
    contiguous after the sort, so each batch is processed as runs with
    the same tight per-row loop the per-group form used; the dict is
    touched once per run, not per row.
    """
    cap = burst * refill_den
    out_schema = (
        f"{id_col} long, {key_col} long, ts_s long, "
        "units_before long, admitted boolean"
    )

    def fn(batches):
        import numpy as np

        state: dict = {}  # key -> (units, last_ts)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            karr = pdf["k"].to_numpy()
            ts_arr = pdf["ts_s"].to_numpy()
            before = np.empty(n, dtype=np.int64)
            admitted = np.empty(n, dtype=bool)
            # contiguous key runs (the partition is sorted by k, ts, id)
            starts = np.flatnonzero(
                np.concatenate(([True], karr[1:] != karr[:-1]))
            )
            bounds = np.append(starts, n)
            for s, t in zip(bounds[:-1], bounds[1:]):
                key = karr[s]
                key = key.item() if hasattr(key, "item") else key
                if key != key:  # NaN-keyed rows: one shared null bucket
                    key = None
                units, prev_ts = state.get(key, (cap, None))
                for i in range(s, t):
                    ts = ts_arr[i]
                    if prev_ts is not None:
                        units = min(
                            cap, units + (ts - prev_ts) * refill_num
                        )
                    prev_ts = ts
                    before[i] = units
                    ok = units >= refill_den
                    admitted[i] = ok
                    if ok:
                        units -= refill_den
                state[key] = (units, prev_ts)
            yield pd.DataFrame(
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
        # epoch_s, not unix_timestamp (r13 ts-domain axis): floor-exact
        # seconds on any epoch; the old floor() wrapped an already-
        # truncated long
        epoch_s(F.col(ts_col)).alias("ts_s"),
    )
    return (
        e.repartition(F.col("k"))
        .sortWithinPartitions("k", "ts_s", id_col)
        .mapInPandas(fn, out_schema)
    )
