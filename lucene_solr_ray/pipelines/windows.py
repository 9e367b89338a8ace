"""Windowed aggregates over the events stream (SURVEY.md §2.10 notes).

The reference's streaming operators assume per-shard sorted delivery with
no watermarks (ReducerStream.java:57,206); Ray Data has no event-time
machinery either, so windows are expressed batch-style over the ordered
log (the guide's streaming-shaped-workload pattern):

- ``tumbling_window``: fixed-size windows are a pure column computation
  (floor of epoch / size) followed by a grouped aggregate — no ordering
  assumption at all.
- ``session_windows``: gap-based sessions need per-key time order, so the
  groupby(key).map_groups stage sorts each key's events by ts and splits
  where the gap exceeds the timeout (the ordering assumption lives INSIDE
  the group, which hash partitioning guarantees is complete).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Sum

from .util import read, round_col


def tumbling_window_events(sf_dir: str, window_sec: int = 3600):
    """Events per (event_type, hour window): count + rounded sum(value)."""
    ds = read(sf_dir, "events", ["event_type", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[us]").astype(np.int64) // 1_000_000
        return pa.table({
            "event_type": t.column("event_type"),
            "window_start": pa.array(
                (epoch // window_sec) * window_sec, type=pa.int64()),
            "value": t.column("value"),
        })

    out = (ds.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["event_type", "window_start"])
           .aggregate(Count(alias_name="cnt"),
                      Sum("value", alias_name="sum_value")))
    return out.map_batches(lambda t: round_col(t, "sum_value", 2),
                           batch_format="pyarrow")


def session_windows_events(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessions per user: (user_id, session_id, n_events).

    ONE vectorized sessionizer per hash bucket (``bucketed_group_agg``)
    instead of ``groupby(user).map_groups`` — the per-group Python
    overhead (~1ms/group, util.py) is pathological at millions of
    distinct users, while the bucketed form is a single
    sort + diff + cumsum per bucket. Hash partitioning guarantees each
    bucket holds complete users, which is the only ordering assumption.
    """
    from .util import bucketed_group_agg

    ds = read(sf_dir, "events", ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes, "m")

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        n = len(df)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        brk = np.concatenate(
            ([0], (np.diff(ts) > gap).astype(np.int64)))
        brk[new_user] = 0
        csum = np.cumsum(brk)
        start_idx = np.nonzero(new_user)[0]
        run_lens = np.diff(np.concatenate((start_idx, [n])))
        sid = csum - np.repeat(csum[start_idx], run_lens)
        # per-session counts without a pandas groupby: session starts are
        # user starts or gap breaks
        sess_start = new_user | (brk == 1)
        starts = np.nonzero(sess_start)[0]
        counts = np.diff(np.concatenate((starts, [n])))
        return pd.DataFrame({
            "user_id": uid[starts],
            "session_id": sid[starts],
            "n_events": counts.astype(np.int64),
        })

    return bucketed_group_agg(ds, ["user_id"], sessionize)


def hopping_window_events(sf_dir: str, size_sec: int = 7200,
                          step_sec: int = 3600):
    """Hopping (sliding) windows: each event lands in size/step
    overlapping windows (here 2h windows every 1h -> 2 per event). The
    window assignment is a vectorized per-batch explode; the aggregate is
    one grouped count/sum like the tumbling case."""
    ds = read(sf_dir, "events", ["event_type", "ts", "value"])
    n_windows = size_sec // step_sec

    def win(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[us]").astype(np.int64) // 1_000_000
        last = (epoch // step_sec) * step_sec  # latest window containing t
        offs = np.arange(n_windows, dtype=np.int64) * step_sec
        starts = (np.repeat(last, n_windows)
                  - np.tile(offs, len(epoch)))
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": pa.array(np.repeat(et, n_windows)),
            "window_start": pa.array(starts, type=pa.int64()),
            "value": pa.array(np.repeat(val, n_windows)),
        })

    out = (ds.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["event_type", "window_start"])
           .aggregate(Count(alias_name="cnt"),
                      Sum("value", alias_name="sum_value")))
    return out.map_batches(lambda t: round_col(t, "sum_value", 2),
                           batch_format="pyarrow")
