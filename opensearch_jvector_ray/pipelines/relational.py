"""Relational pipelines over the star-schema tables: last-write-wins on
the events log (D3 analog at table scale) and a TPC-H-Q1-flavoured
partial-aggregate groupby (the A2-style combiner pattern: pre-aggregate
inside map_batches, then a tiny groupby over partials)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum


def events_last_write_wins(ds: "rd.Dataset") -> pd.DataFrame:
    """Latest event per user (ts desc, event_id desc tie-break) — the
    update-wins rule of D3 applied to an event log via groupby+map_groups."""
    def latest(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "descending"),
                                                ("event_id", "descending")])
        return group.take(idx[:1])

    out = (ds.groupby("user_id")
             .map_groups(latest, batch_format="pyarrow")
             .to_pandas())
    out = out.sort_values("user_id").reset_index(drop=True)
    return out[["user_id", "ts", "event_type", "value"]]


def revenue_by_nation(orders: "rd.Dataset", customer_path: str,
                      nation_path: str) -> pd.DataFrame:
    """Broadcast hash-join + combiner aggregate: orders (large, streamed)
    joined to customer->nation (small side, `ray.put` ONCE and read per
    task — never re-shipped per batch), partial-aggregated inside
    map_batches, reduced by a tiny groupby.  Money as integer cents.

    The J-pattern for small-side joins at 100 TB: the fact table never
    shuffles; only (nation, partial-sum) rows do.
    """
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(customer_path, columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(nation_path, columns=["n_nationkey", "n_name"])
    cust_to_nation = dict(zip(cust["c_custkey"].to_pylist(),
                              cust["c_nationkey"].to_pylist()))
    nation_name = dict(zip(nation["n_nationkey"].to_pylist(),
                           nation["n_name"].to_pylist()))
    lookup_ref = ray.put((cust_to_nation, nation_name))

    def partial(batch: pa.Table) -> pa.Table:
        c2n, n_name = ray.get(lookup_ref)
        cust_keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.rint(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        names = [n_name.get(c2n.get(int(ck), -1), None) for ck in cust_keys]
        df = pd.DataFrame({"n_name": names, "cents": cents, "n_orders": 1})
        df = df[df.n_name.notna()]
        g = (df.groupby("n_name", sort=False)
               .agg(cents=("cents", "sum"), n_orders=("n_orders", "sum"))
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (orders.map_batches(partial, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("cents", alias_name="cents"),
                      Sum("n_orders", alias_name="n_orders"))
           .to_pandas())
    agg["total_revenue"] = np.round(agg.pop("cents") / 100.0, 2)
    agg["n_orders"] = agg["n_orders"].astype(np.int64)
    return (agg.sort_values("n_name").reset_index(drop=True)
            [["n_name", "n_orders", "total_revenue"]])


def events_window_agg(ds: "rd.Dataset") -> pd.DataFrame:
    """Tumbling daily window aggregate per event type (the windowed-
    aggregate custom operator: floor-to-window inside map_batches partials,
    then a small groupby — no event-time machinery needed for a bounded
    log).  Money summed as integer cents for an fp-noise-free oracle."""
    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype("datetime64[us]")
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "window_start": day,
            "n_events": 1,
            "cents": np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64),
        })
        g = (df.groupby(["event_type", "window_start"], sort=False)
               .agg(n_events=("n_events", "sum"), cents=("cents", "sum"))
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["event_type", "window_start"])
             .aggregate(Sum("n_events", alias_name="n_events"),
                        Sum("cents", alias_name="cents"))
             .to_pandas())
    agg["sum_value"] = np.round(agg.pop("cents") / 100.0, 2)
    agg["n_events"] = agg["n_events"].astype(np.int64)
    return (agg.sort_values(["event_type", "window_start"])
               .reset_index(drop=True)[["event_type", "window_start",
                                        "n_events", "sum_value"]])


def events_sessionize(ds: "rd.Dataset", gap_minutes: int = 30) -> pd.DataFrame:
    """Session windows (gap-based) per user: a new session starts when the
    gap to the previous event exceeds ``gap_minutes``.

    The streaming-shaped custom operator from the brief: the event log is
    treated as an ordered, key-partitioned stream — one groupby(user_id)
    shuffle co-locates each key, and the windowing itself is a sorted
    numpy pass inside the group (the guide's session-window recipe).
    Ordering ties on equal ts resolve by event_id (both sides).
    """
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new = np.ones(len(g), dtype=np.int64)
        new[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
        sess = np.cumsum(new)
        out = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                            "session_idx": sess, "ts": g["ts"].to_numpy(),
                            "one": 1})
        agg = (out.groupby("session_idx", sort=True)
                  .agg(user_id=("user_id", "first"),
                       session_start=("ts", "min"),
                       session_end=("ts", "max"),
                       n_events=("one", "sum"))
                  .reset_index())
        return agg[["user_id", "session_idx", "session_start", "session_end",
                    "n_events"]]

    out = (ds.groupby("user_id")
             .map_groups(sessionize, batch_format="pandas")
             .to_pandas())
    out["session_idx"] = out["session_idx"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return (out.sort_values(["user_id", "session_idx"])
               .reset_index(drop=True))


def top_order_revenue(orders: "rd.Dataset", lineitem: "rd.Dataset",
                      k: int = 10, orderdate_before: str = "1998-01-01",
                      ) -> pd.DataFrame:
    """Big-big equi-join (TPC-H-Q3 flavour): revenue per order from
    lineitem, joined to the order's metadata, top-k by revenue.

    Both sides are large, so neither is broadcast: lineitem is first
    partial-aggregated per order key inside map_batches (integer-cents
    combiner — the heavy table collapses to one row per key before any
    exchange), then the two key-level tables are co-grouped on
    o_orderkey with ONE shuffle (tag-union + groupby, the partitioned
    hash-join pattern) and joined inside each group.  Ties on equal
    revenue resolve by o_orderkey asc (deterministic; oracle identical).
    """
    cutoff = np.datetime64(f"{orderdate_before}T00:00:00", "us")

    def li_partial(batch: pa.Table) -> pa.Table:
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        price_c = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(batch["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"key": key, "cents": price_c * (100 - disc_c)})
        g = df.groupby("key", sort=False)["cents"].sum().reset_index()
        g["side"] = np.int8(1)
        g["o_orderdate"] = pd.NaT
        return pa.Table.from_pandas(g, preserve_index=False)

    def o_tag(batch: pa.Table) -> pa.Table:
        dates = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = dates < cutoff
        batch = batch.filter(pa.array(keep))
        n = batch.num_rows
        return pa.table({
            "key": pc.cast(batch["o_orderkey"], pa.int64()),
            "cents": pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "o_orderdate": pc.cast(batch["o_orderdate"], pa.timestamp("us")),
        })

    li = lineitem.map_batches(li_partial, batch_format="pyarrow")
    od = orders.map_batches(o_tag, batch_format="pyarrow")

    def join_group(group: pd.DataFrame) -> pd.DataFrame:
        o = group[group.side == 0]
        l = group[group.side == 1]
        if o.empty or l.empty:
            return pd.DataFrame(columns=["o_orderkey", "o_orderdate", "cents"])
        return pd.DataFrame({
            "o_orderkey": [int(group["key"].iloc[0])],
            "o_orderdate": [o["o_orderdate"].iloc[0]],
            "cents": [int(l["cents"].sum())],
        })

    joined = (od.union(li).groupby("key")
              .map_groups(join_group, batch_format="pandas")
              .to_pandas())
    if joined.empty:
        return pd.DataFrame(columns=["o_orderkey", "o_orderdate", "revenue"])
    joined["revenue"] = np.round(joined.pop("cents") / 10000.0, 4)
    joined["o_orderkey"] = joined["o_orderkey"].astype(np.int64)
    out = (joined.sort_values(["revenue", "o_orderkey"],
                              ascending=[False, True], kind="mergesort")
                 .head(k).reset_index(drop=True))
    return out[["o_orderkey", "o_orderdate", "revenue"]]


def events_asof_orders(events: "rd.Dataset", orders: "rd.Dataset") -> pd.DataFrame:
    """As-of join (custom operator b-category): for every event, the
    latest order of the same customer at or before the event time.

    Partitioning assumption (documented per the brief): both sides are
    co-grouped on the join key by ONE shuffle — the two tables are
    tag-unioned into a shared schema and grouped by key, so each group
    task sees all events + all orders of one customer and runs a sorted
    searchsorted as-of inside.  Ties on equal order date resolve to the
    max o_orderkey (deterministic; the SQL oracle uses the same rule).
    """
    def tag_events(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": pc.cast(batch["user_id"], pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "event_id": batch["event_id"],
            "ts": batch["ts"],
            "o_orderkey": pa.array(np.full(n, -1, dtype=np.int64)),
            "o_orderdate": pa.nulls(n, type=pa.timestamp("us")),
        })

    def tag_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": pc.cast(batch["o_custkey"], pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "event_id": pa.array(np.full(n, -1, dtype=np.int64)),
            "ts": pa.nulls(n, type=pa.timestamp("us")),
            "o_orderkey": batch["o_orderkey"],
            "o_orderdate": pc.cast(batch["o_orderdate"], pa.timestamp("us")),
        })

    unioned = (events.map_batches(tag_events, batch_format="pyarrow")
               .union(orders.map_batches(tag_orders, batch_format="pyarrow")))

    def asof_group(group: pd.DataFrame) -> pd.DataFrame:
        ev = group[group.side == 0]
        od = group[group.side == 1].sort_values(["o_orderdate", "o_orderkey"])
        if ev.empty or od.empty:
            return pd.DataFrame(columns=["event_id", "user_id", "ts",
                                         "o_orderkey", "o_orderdate"])
        dates = od["o_orderdate"].to_numpy()
        idx = np.searchsorted(dates, ev["ts"].to_numpy(), side="right") - 1
        hit = idx >= 0
        ev = ev[hit]
        sel = od.iloc[idx[hit]]
        return pd.DataFrame({
            "event_id": ev["event_id"].to_numpy(),
            "user_id": ev["key"].to_numpy(),
            "ts": ev["ts"].to_numpy(),
            "o_orderkey": sel["o_orderkey"].to_numpy(),
            "o_orderdate": sel["o_orderdate"].to_numpy(),
        })

    out = (unioned.groupby("key")
           .map_groups(asof_group, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["event_id", "user_id", "ts",
                                     "o_orderkey", "o_orderdate"])
    out["event_id"] = out["event_id"].astype(np.int64)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


def pricing_summary(ds: "rd.Dataset", cutoff: str = "1998-09-02") -> pd.DataFrame:
    """Groupby aggregate with EXACT integer-cents money math (so the
    DuckDB oracle compare is fp-noise-free) and per-batch partial
    aggregation before the shuffle (combiner)."""
    cutoff_ts = np.datetime64(f"{cutoff}T00:00:00", "us")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship <= cutoff_ts
        if not keep.any():
            return pa.table({"l_returnflag": pa.array([], type=pa.string()),
                             "l_linestatus": pa.array([], type=pa.string()),
                             "qty": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        batch = batch.filter(pa.array(keep))
        df = batch.select(["l_returnflag", "l_linestatus"]).to_pandas()
        qty = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        price_c = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(batch["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df["qty"] = qty
        df["cents"] = price_c * (100 - disc_c)
        g = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
               .agg(qty=("qty", "sum"), cents=("cents", "sum"), n=("qty", "size"))
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("qty", alias_name="sum_qty"),
                        Sum("cents", alias_name="cents"),
                        Sum("n", alias_name="count_order"))
             .to_pandas())
    agg["sum_disc_price"] = np.round(agg.pop("cents") / 10000.0, 4)
    agg["sum_qty"] = agg["sum_qty"].astype(np.int64)
    agg["count_order"] = agg["count_order"].astype(np.int64)
    agg = agg.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    return agg[["l_returnflag", "l_linestatus", "sum_qty", "sum_disc_price",
                "count_order"]]
