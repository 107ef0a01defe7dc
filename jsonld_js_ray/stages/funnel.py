"""Per-user funnel analysis — how far each user progresses through an
ORDERED event-type chain (signup → view → click → purchase), each
stage strictly after the previous one's first completion.

The classic product-analytics operator (a sequential pattern match,
not a plain aggregate): stage i's timestamp is the user's earliest
event of type i occurring STRICTLY AFTER the user's stage-(i-1)
timestamp. Ray Data has no native sequential-window operator, so the
shape is the repo's per-key order-statistics pattern (cf.
stages/rank.py): ONE uniform user-hash shard shuffle, then the chain
evaluated inside each shard with |stages| vectorized passes (filter by
type → merge previous stage per user → strict-after filter → per-user
min) — no per-user Python, and the stage count (not the corpus) bounds
the pass count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FUNNEL_STAGES = ("signup", "view", "click", "purchase")
FUNNEL_SHARDS = 64


def funnel_stages(events, stages=FUNNEL_STAGES,
                  window_us: int | None = None):
    """events (ts, user_id, event_type) → (user_id, funnel_stage):
    the number of chain stages the user completed (0..len(stages)).
    With ``window_us`` set, every stage must ALSO fall within that
    many microseconds of the user's stage-1 timestamp — the
    conversion-window variant every product funnel actually uses (an
    unbounded chain counts a purchase a year after signup as a
    conversion). The window anchors at the user's FIRST stage-1
    event (mirrored in SQL)."""
    def keyed(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket",
            pa.array((users % FUNNEL_SHARDS).astype("int32")))

    def per_shard(g, _stages=tuple(stages), _w=window_us) -> pa.Table:
        import pandas as pd

        users = g["user_id"].to_numpy().astype(np.int64)
        all_users = np.unique(users)
        depth = np.zeros(len(all_users), np.int64)
        ts = pd.Series(g["ts"].to_numpy())
        cur = None            # frame (user_id → t[, start])
        for i, st in enumerate(_stages):
            sel = g["event_type"].to_numpy() == st
            df = pd.DataFrame({"user_id": users[sel],
                               "ts": ts[sel].to_numpy()})
            if cur is None:
                t = df.groupby("user_id", sort=False)["ts"].min()
                nxt = pd.DataFrame({"t": t, "start": t}) \
                    if _w is not None else pd.DataFrame({"t": t})
            else:
                m = df.merge(cur.reset_index(), on="user_id")
                keep = m["ts"] > m["t"]
                if _w is not None:
                    keep &= (m["ts"] <= m["start"]
                             + pd.Timedelta(_w, unit="us"))
                m = m[keep]
                t = m.groupby("user_id", sort=False)["ts"].min()
                if _w is not None:
                    start = m.groupby("user_id",
                                      sort=False)["start"].first()
                    nxt = pd.DataFrame({"t": t, "start": start})
                else:
                    nxt = pd.DataFrame({"t": t})
            if not len(nxt):
                break
            depth[np.isin(all_users, nxt.index.to_numpy())] = i + 1
            cur = nxt
        return pa.table({
            "user_id": pa.array(all_users, pa.int64()),
            "funnel_stage": pa.array(depth),
        })

    return events.map_batches(keyed, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_shard, batch_format="pandas")


FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000       # 7 days in µs


def funnel_stages_windowed(events, stages=FUNNEL_STAGES,
                           window_us: int = FUNNEL_WINDOW_US):
    """funnel_stages with the conversion window bound (see there)."""
    return funnel_stages(events, stages, window_us=window_us)


def funnel_sql(stages=FUNNEL_STAGES,
               window_us: int | None = None) -> str:
    ctes = ["u AS (SELECT DISTINCT user_id FROM events)"]
    for i, st in enumerate(stages, start=1):
        if i == 1:
            start_col = ", min(ts) AS start" if window_us is not None \
                else ""
            ctes.append(
                f"s1 AS (SELECT user_id, min(ts) AS t{start_col} "
                f"FROM events WHERE event_type = '{st}' "
                f"GROUP BY user_id)")
        else:
            if window_us is not None:
                wpred = (f" AND e.ts <= s{i - 1}.start "
                         f"+ to_microseconds(CAST({window_us} "
                         f"AS BIGINT))")
                scol = f", s{i - 1}.start AS start"
                sgrp = f", s{i - 1}.start"
            else:
                wpred = scol = sgrp = ""
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(e.ts) AS t{scol} "
                f"FROM events e JOIN s{i - 1} "
                f"ON s{i - 1}.user_id = e.user_id "
                f"WHERE e.event_type = '{st}' AND e.ts > s{i - 1}.t"
                f"{wpred} GROUP BY e.user_id{sgrp})")
    case = " ".join(
        f"WHEN s{i}.t IS NOT NULL THEN {i}"
        for i in range(len(stages), 0, -1))
    joins = " ".join(f"LEFT JOIN s{i} USING (user_id)"
                     for i in range(1, len(stages) + 1))
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT u.user_id, CAST(CASE {case} ELSE 0 END AS BIGINT)"
            f" AS funnel_stage\nFROM u {joins}")


FUNNEL_SQL = funnel_sql()
FUNNEL_WINDOWED_SQL = funnel_sql(window_us=FUNNEL_WINDOW_US)
