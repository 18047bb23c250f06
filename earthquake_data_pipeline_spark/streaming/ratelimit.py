"""Streaming face of token-bucket admission (operators/admission.py).

The batch operator replays a key's full history per run; at the ingest
edge the same recurrence must run INCREMENTALLY — each micro-batch
advances per-key state (remaining units, last timestamp) instead of
re-reading history. applyInPandasWithState is the exact tool: arbitrary
per-key state, Arrow-batched, hash-partitioned by the group key so
state lives where the key's events arrive.

Ordering contract: within a micro-batch events are sorted by
(ts_s, id) before applying the recurrence; ACROSS micro-batches the
recurrence is exact when the source delivers each key's events in
timestamp order (true for the repo's file-source replays and any
log-compacted queue with per-key ordering). An out-of-order arrival
older than the key's last seen timestamp contributes a refill of 0
(clamped) and does NOT rewind the refill anchor (last_ts is
monotone) — the bucket cannot be grown by replaying the past, neither
directly nor by double-crediting the interval after a late event. Full late-data handling would need a watermarked reorder
buffer in front (the same trade streaming_dedup documents).

100 TB: state is two int64s per key; the shuffle is the groupBy hash
exchange every stateful operator pays. Hot keys serialize on one task —
the same inherent-recurrence bound the batch operator documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_token_bucket(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
    burst: int = 2,
    refill_num: int = 1,
    refill_den: int = 43200,
) -> DataFrame:
    """Incremental token bucket: same integer-unit recurrence as
    operators/admission.py::token_bucket_admit, state carried across
    micro-batches. Input needs an integer-seconds ``ts_col``.

    Emits one row per event: (id, key, ts_s, units_before, admitted).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cap = burst * refill_den
    out_schema = (
        f"{id_col} long, {key_col} long, ts_s long, "
        "units_before long, admitted boolean"
    )
    state_schema = "units long, last_ts long"

    def update(key: tuple, pdfs, state: GroupState):
        if state.exists:
            units, last_ts = state.get
            if last_ts < 0:  # sentinel: no event seen yet
                last_ts = None
        else:
            units, last_ts = cap, None
        # One sort over the WHOLE micro-batch group, not per Arrow chunk:
        # a key whose batch spans multiple record batches must still see
        # its events in (ts, id) order or the recurrence diverges from
        # the batch operator's whole-history sort.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values([ts_col, id_col], ignore_index=True)
        before = []
        admitted = []
        for ts in pdf[ts_col]:
            if last_ts is not None:
                units = min(cap, units + max(0, ts - last_ts) * refill_num)
                # Late arrival (ts < last_ts): refill 0 AND the anchor
                # must not rewind, or the next in-order event would
                # re-credit an interval already counted.
                last_ts = max(last_ts, int(ts))
            else:
                last_ts = int(ts)
            before.append(units)
            ok = units >= refill_den
            admitted.append(ok)
            if ok:
                units -= refill_den
        yield pd.DataFrame(
            {
                id_col: pdf[id_col],
                key_col: key[0],
                "ts_s": pdf[ts_col],
                "units_before": before,
                "admitted": admitted,
            }
        )
        state.update((int(units), int(last_ts) if last_ts is not None else -1))

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
