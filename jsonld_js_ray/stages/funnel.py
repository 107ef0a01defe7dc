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


def funnel_stages(events, stages=FUNNEL_STAGES):
    """events (ts, user_id, event_type) → (user_id, funnel_stage):
    the number of chain stages the user completed (0..len(stages))."""
    def keyed(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket",
            pa.array((users % FUNNEL_SHARDS).astype("int32")))

    def per_shard(g, _stages=tuple(stages)) -> pa.Table:
        users = g["user_id"].to_numpy().astype(np.int64)
        all_users = np.unique(users)
        # reached[u] = timestamp of the latest completed stage
        cur = None            # pandas frame (user_id, t)
        depth = np.zeros(len(all_users), np.int64)
        import pandas as pd

        ts = pd.Series(g["ts"].to_numpy())
        for i, st in enumerate(_stages):
            sel = g["event_type"].to_numpy() == st
            df = pd.DataFrame({"user_id": users[sel],
                               "ts": ts[sel].to_numpy()})
            if cur is None:
                nxt = df.groupby("user_id", sort=False)["ts"].min()
            else:
                prev = cur.rename("prev").reset_index()
                prev.columns = ["user_id", "prev"]
                m = df.merge(prev, on="user_id")
                m = m[m["ts"] > m["prev"]]
                nxt = m.groupby("user_id", sort=False)["ts"].min()
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


def funnel_sql(stages=FUNNEL_STAGES) -> str:
    ctes = ["u AS (SELECT DISTINCT user_id FROM events)"]
    prev = None
    for i, st in enumerate(stages, start=1):
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{st}' GROUP BY user_id)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(e.ts) AS t "
                f"FROM events e JOIN s{i - 1} "
                f"ON s{i - 1}.user_id = e.user_id "
                f"WHERE e.event_type = '{st}' AND e.ts > s{i - 1}.t "
                f"GROUP BY e.user_id)")
        prev = i
    case = " ".join(
        f"WHEN s{i}.t IS NOT NULL THEN {i}"
        for i in range(len(stages), 0, -1))
    joins = " ".join(f"LEFT JOIN s{i} USING (user_id)"
                     for i in range(1, len(stages) + 1))
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT u.user_id, CAST(CASE {case} ELSE 0 END AS BIGINT)"
            f" AS funnel_stage\nFROM u {joins}")


FUNNEL_SQL = funnel_sql()
