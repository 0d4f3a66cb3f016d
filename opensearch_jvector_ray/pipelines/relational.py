"""Relational pipelines over the star-schema tables: last-write-wins on
the events log (D3 analog at table scale), broadcast + big-big joins,
windowed/session aggregates, and a TPC-H-Q1-flavoured partial-aggregate
groupby (the A2-style combiner pattern: pre-aggregate inside map_batches,
then a tiny groupby over partials).

Scale shapes used throughout (the round-1 verdict's fixes):
  - per-key logic never runs one Python call per key: keys are
    hash-bucketed into ``num_parts`` co-partitions (``hash_copartition``)
    and each WHOLE bucket is processed vectorized (pandas/numpy C paths);
  - operators that produce table-sized output return a ``Dataset``
    (callers sample/convert; nothing table-sized is pandas'd inside);
  - every shuffle is preceded by a per-batch combiner where one exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

DEFAULT_PARTS = 64


def hash_copartition(ds: "rd.Dataset", key_col: str, fn,
                     num_parts: int = DEFAULT_PARTS) -> "rd.Dataset":
    """groupby over hash(key) % num_parts: ``fn`` (pandas DataFrame ->
    DataFrame) sees a WHOLE co-partition — every row of every key that
    hashes into the bucket — and runs vectorized.  One Python call per
    bucket, never per key; same exchange volume as groupby(key)."""
    def add_part(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(np.asarray(k), categorize=False)
                % np.uint64(num_parts)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns="__part"))

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("__part")
              .map_groups(run, batch_format="pandas"))


def events_last_write_wins(ds: "rd.Dataset") -> "rd.Dataset":
    """Latest event per user (ts desc, event_id desc tie-break) — the
    update-wins rule of D3 applied to an event log.

    Per-batch COMBINER first (latest-per-user within the batch), so only
    one (user, latest) partial per user per batch rides the shuffle; the
    hash-co-partitioned reduce then picks the global latest vectorized.
    Returns a Dataset (one row per user — table-sized at scale)."""
    def latest_per_user(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return g.drop_duplicates(subset="user_id", keep="last")

    def combiner(batch: pa.Table) -> pa.Table:
        df = batch.select(["user_id", "ts", "event_type", "value",
                           "event_id"]).to_pandas()
        return pa.Table.from_pandas(latest_per_user(df), preserve_index=False)

    partials = ds.map_batches(combiner, batch_format="pyarrow")
    out = hash_copartition(partials, "user_id", latest_per_user)
    return out.drop_columns(["event_id"])


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

    # broadcast SORTED numpy arrays (not Python dicts): the probe is a
    # vectorized searchsorted, no per-row boxing — millions of customers
    # cost two array binary-searches per batch, not len(batch) dict gets
    cust = pq.read_table(customer_path, columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(nation_path, columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    o = np.argsort(ck, kind="stable")
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False)
    nname = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    no = np.argsort(nk, kind="stable")
    lookup_ref = ray.put((ck[o], cn[o], nk[no], nname[no]))

    def partial(batch: pa.Table) -> pa.Table:
        ck_s, cn_s, nk_s, nname_s = ray.get(lookup_ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.rint(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        pos = np.clip(np.searchsorted(ck_s, keys), 0, len(ck_s) - 1)
        hit = ck_s[pos] == keys
        nat = cn_s[pos[hit]]
        npos = np.clip(np.searchsorted(nk_s, nat), 0, len(nk_s) - 1)
        nhit = nk_s[npos] == nat
        idx = npos[nhit]
        # per-batch combiner: bincount over the nation INDEX (cents fit
        # float64 exactly at batch granularity: << 2^53)
        n_orders = np.bincount(idx, minlength=len(nk_s))
        sums = np.bincount(idx, weights=cents[hit][nhit].astype(np.float64),
                           minlength=len(nk_s)).astype(np.int64)
        nz = n_orders > 0
        return pa.table({
            "n_name": pa.array(nname_s[nz].tolist(), type=pa.string()),
            "cents": pa.array(sums[nz]),
            "n_orders": pa.array(n_orders[nz].astype(np.int64)),
        })

    agg = (orders.map_batches(partial, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("cents", alias_name="cents"),
                      Sum("n_orders", alias_name="n_orders"))
           .to_pandas())
    agg["total_revenue"] = np.round(agg.pop("cents") / 100.0, 2)
    agg["n_orders"] = agg["n_orders"].astype(np.int64)
    return (agg.sort_values("n_name").reset_index(drop=True)
            [["n_name", "n_orders", "total_revenue"]])


def revenue_by_region_brand(lineitem: "rd.Dataset", part_path: str,
                            supplier_path: str, nation_path: str,
                            region_path: str) -> pd.DataFrame:
    """Multi-way BROADCAST star join: the lineitem fact streams, all four
    dimension tables (part, supplier, nation, region) are composed
    in-process into two flat lookups — partkey -> brand index and
    suppkey -> region index (supplier⋈nation⋈region collapsed before
    broadcast) — `ray.put` ONCE and probed with vectorized searchsorted
    per batch.  Revenue uses the pricing_summary integer trick
    (price_cents * (100 - discount_pct), exact int math on BOTH sides),
    and only (region, brand, partials) rows ever shuffle.
    """
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(part_path, columns=["p_partkey", "p_brand"])
    supp = pq.read_table(supplier_path,
                         columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(nation_path,
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(region_path, columns=["r_regionkey", "r_name"])

    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    brands, bidx = np.unique(np.asarray(part["p_brand"].to_pylist(),
                                        dtype=object), return_inverse=True)
    po = np.argsort(pk, kind="stable")

    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    nreg = nat["n_regionkey"].to_numpy(zero_copy_only=False)
    no = np.argsort(nk, kind="stable")
    rk = reg["r_regionkey"].to_numpy(zero_copy_only=False)
    rnames = np.asarray(reg["r_name"].to_pylist(), dtype=object)
    ro = np.argsort(rk, kind="stable")
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False)
    so = np.argsort(sk, kind="stable")
    # collapse supplier -> region INDEX before broadcasting; the probes
    # are VALIDATED like the part/supplier probes below — an unclamped
    # miss either IndexErrors (key beyond the table) or silently
    # resolves to the NEXT nation/region, misattributing revenue
    npos = np.clip(np.searchsorted(nk[no], sn[so]), 0, len(nk) - 1)
    if not np.array_equal(nk[no][npos], sn[so]):
        missing = sorted(set(sn[so][nk[no][npos] != sn[so]].tolist()))
        raise ValueError(f"supplier nationkeys {missing[:5]} missing "
                         f"from the nation table")
    sreg = np.clip(np.searchsorted(rk[ro], nreg[no][npos]),
                   0, len(rk) - 1)
    if not np.array_equal(rk[ro][sreg], nreg[no][npos]):
        missing = sorted(set(
            nreg[no][npos][rk[ro][sreg] != nreg[no][npos]].tolist()))
        raise ValueError(f"nation regionkeys {missing[:5]} missing "
                         f"from the region table")
    lookup_ref = ray.put((pk[po], bidx[po], sk[so], sreg,
                          brands, rnames[ro]))

    def partial(batch: pa.Table) -> pa.Table:
        pk_s, bid_s, sk_s, sreg_s, brands_, regions_ = ray.get(lookup_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        price_c = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        ppos = np.clip(np.searchsorted(pk_s, lpk), 0, len(pk_s) - 1)
        phit = pk_s[ppos] == lpk
        spos = np.clip(np.searchsorted(sk_s, lsk), 0, len(sk_s) - 1)
        shit = sk_s[spos] == lsk
        hit = phit & shit
        nb = len(brands_)
        combined = sreg_s[spos[hit]] * nb + bid_s[ppos[hit]]
        size = len(regions_) * nb
        n_items = np.bincount(combined, minlength=size)
        sums = np.bincount(combined, weights=rev[hit].astype(np.float64),
                           minlength=size).astype(np.int64)
        nz = np.flatnonzero(n_items)
        return pa.table({
            "r_name": pa.array([regions_[i // nb] for i in nz],
                               type=pa.string()),
            "p_brand": pa.array([brands_[i % nb] for i in nz],
                                type=pa.string()),
            "rev_i": pa.array(sums[nz]),
            "n_items": pa.array(n_items[nz].astype(np.int64)),
        })

    agg = (lineitem.map_batches(partial, batch_format="pyarrow")
           .groupby(["r_name", "p_brand"])
           .aggregate(Sum("rev_i", alias_name="rev_i"),
                      Sum("n_items", alias_name="n_items"))
           .to_pandas())
    agg["revenue"] = np.round(agg.pop("rev_i") / 10000.0, 4)
    agg["n_items"] = agg["n_items"].astype(np.int64)
    return (agg.sort_values(["r_name", "p_brand"]).reset_index(drop=True)
            [["r_name", "p_brand", "n_items", "revenue"]])


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


def events_sessionize(ds: "rd.Dataset", gap_minutes: int = 30) -> "rd.Dataset":
    """Session windows (gap-based) per user: a new session starts when the
    gap to the previous event exceeds ``gap_minutes``.

    The streaming-shaped custom operator from the brief: the event log is
    treated as an ordered, key-partitioned stream — ONE hash-co-partition
    shuffle co-locates each key, and the windowing is a single vectorized
    pass over the whole bucket (all its users at once: a session break is
    "user changed OR gap exceeded").  Ordering ties on equal ts resolve by
    event_id (both sides).  Returns a Dataset (one row per session —
    table-sized at scale).
    """
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame(columns=["user_id", "session_idx",
                                         "session_start", "session_end",
                                         "n_events"])
        user_change = np.ones(n, dtype=bool)
        user_change[1:] = uid[1:] != uid[:-1]
        new = user_change.copy()
        new[1:] |= (ts[1:] - ts[:-1]) > gap_us
        run = np.cumsum(new)                       # global session run id
        # per-user session_idx: run minus the run at the user's first row
        first_run = run[user_change]               # one per user, in order
        user_ord = np.cumsum(user_change) - 1      # 0-based user number
        sess = run - first_run[user_ord] + 1
        out = pd.DataFrame({"user_id": uid, "session_idx": sess,
                            "ts": g["ts"].to_numpy(), "one": 1})
        agg = (out.groupby(["user_id", "session_idx"], sort=True)
                  .agg(session_start=("ts", "min"),
                       session_end=("ts", "max"),
                       n_events=("one", "sum"))
                  .reset_index())
        agg["session_idx"] = agg["session_idx"].astype(np.int64)
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg[["user_id", "session_idx", "session_start", "session_end",
                    "n_events"]]

    return hash_copartition(ds, "user_id", sessionize)


def top_order_revenue(orders: "rd.Dataset", lineitem: "rd.Dataset",
                      k: int = 10, orderdate_before: str = "1998-01-01",
                      ) -> pd.DataFrame:
    """Big-big equi-join (TPC-H-Q3 flavour): revenue per order from
    lineitem, joined to the order's metadata, top-k by revenue.

    Both sides are large, so neither is broadcast: lineitem is first
    partial-aggregated per order key inside map_batches (integer-cents
    combiner — the heavy table collapses to one row per key before any
    exchange), then the two key-level tables are co-partitioned on
    hash(o_orderkey) with ONE shuffle (tag-union + hash_copartition, the
    partitioned hash-join pattern) and joined VECTORIZED per bucket, with
    a per-bucket top-k so the driver merges num_parts * k rows, never the
    joined table.  Ties on equal revenue resolve by o_orderkey asc
    (deterministic; oracle identical).
    """
    cutoff = np.datetime64(f"{orderdate_before}T00:00:00", "us")

    def li_partial(batch: pa.Table) -> pa.Table:
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        price_c = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(batch["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"key": key, "cents": price_c * (100 - disc_c),
                           "side": np.int8(1)})
        g = (df.groupby("key", sort=False)
               .agg(cents=("cents", "sum"), side=("side", "first"))
               .reset_index())
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

    def join_partition(df: pd.DataFrame) -> pd.DataFrame:
        """Whole co-partition at once: sum lineitem partials per key and
        hash-join to the orders side — vectorized pandas merge, ONE call
        per bucket (not per order key), then a per-partition top-k so only
        num_parts * k rows ever reach the driver."""
        o = df[df.side == 0][["key", "o_orderdate"]]
        l = df[df.side == 1].groupby("key", sort=False)["cents"].sum()
        if o.empty or l.empty:
            return pd.DataFrame(columns=["o_orderkey", "o_orderdate",
                                         "revenue"])
        m = o.merge(l.rename("cents"), left_on="key", right_index=True,
                    how="inner")
        m["revenue"] = np.round(m.pop("cents") / 10000.0, 4)
        m = m.rename(columns={"key": "o_orderkey"})
        m = m.sort_values(["revenue", "o_orderkey"],
                          ascending=[False, True], kind="mergesort").head(k)
        return m[["o_orderkey", "o_orderdate", "revenue"]]

    tops = hash_copartition(od.union(li), "key", join_partition).to_pandas()
    if tops.empty:
        return pd.DataFrame(columns=["o_orderkey", "o_orderdate", "revenue"])
    tops["o_orderkey"] = tops["o_orderkey"].astype(np.int64)
    out = (tops.sort_values(["revenue", "o_orderkey"],
                            ascending=[False, True], kind="mergesort")
               .head(k).reset_index(drop=True))
    return out[["o_orderkey", "o_orderdate", "revenue"]]


def events_asof_orders(events: "rd.Dataset", orders: "rd.Dataset") -> "rd.Dataset":
    """As-of join (custom operator b-category): for every event, the
    latest order of the same customer at or before the event time.

    Partitioning assumption (documented per the brief): both sides are
    co-grouped on the join key by ONE hash-co-partition shuffle — the two
    tables are tag-unioned into a shared schema and bucketed by
    hash(key), so each bucket task sees all events + all orders of its
    customers and runs ONE vectorized ``pd.merge_asof(by=key)`` (C path,
    no per-key Python).  Ties on equal order date resolve to the max
    o_orderkey (merge_asof keeps the LAST among equal 'on' values given
    the (o_orderdate, o_orderkey) sort; the SQL oracle uses the same
    rule).  Returns a Dataset (event-log-sized output at scale).
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

    empty_cols = ["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"]

    def asof_partition(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df.side == 0][["key", "event_id", "ts"]]
        od = df[df.side == 1][["key", "o_orderkey", "o_orderdate"]]
        if ev.empty or od.empty:
            return pd.DataFrame(columns=empty_cols)
        # merge_asof: both frames sorted by the 'on' column; among equal
        # o_orderdate rows the LAST (max o_orderkey, via the secondary
        # sort) wins — the deterministic tie rule
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
        od = od.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        m = pd.merge_asof(ev, od, left_on="ts", right_on="o_orderdate",
                          by="key", direction="backward",
                          allow_exact_matches=True)
        m = m[m["o_orderkey"].notna()]
        out = pd.DataFrame({
            "event_id": m["event_id"].to_numpy(dtype=np.int64),
            "user_id": m["key"].to_numpy(dtype=np.int64),
            "ts": m["ts"].to_numpy(),
            "o_orderkey": m["o_orderkey"].to_numpy(dtype=np.int64),
            "o_orderdate": m["o_orderdate"].to_numpy(),
        })
        return out

    return hash_copartition(unioned, "key", asof_partition)


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


def orders_range_join(orders: "rd.Dataset", days: int = 90,
                      num_parts: int = DEFAULT_PARTS) -> "rd.Dataset":
    """Range (interval) join — the as-of join's unbounded sibling
    (custom operator a-category): for every order, ALL strictly-earlier
    orders of the same customer within ``days`` days.

    Partitioning assumption (documented per the brief): ONE
    hash-co-partition shuffle on the join key (o_custkey); each bucket
    task self-joins its customers vectorized (pandas merge on key +
    range mask — C paths, no per-key Python).  Per-key fan-out is
    bounded by orders-per-customer-per-window, so the per-bucket
    intermediate is sum_k |O_k|^2 over the bucket's customers — bounded
    when key cardinality grows with data (the TPC-H shape: ~10 orders
    per customer regardless of scale).  Hot keys would salt the same
    way the dictionary aggregation does.  Returns a Dataset
    (join-sized output): (o_orderkey, o_custkey, o_orderdate,
    prev_orderkey, prev_orderdate, day_gap).
    """
    window = np.timedelta64(days, "D").astype("timedelta64[us]")
    empty = {
        "o_orderkey": pa.array([], type=pa.int64()),
        "o_custkey": pa.array([], type=pa.int64()),
        "o_orderdate": pa.array([], type=pa.timestamp("us")),
        "prev_orderkey": pa.array([], type=pa.int64()),
        "prev_orderdate": pa.array([], type=pa.timestamp("us")),
        "day_gap": pa.array([], type=pa.int64()),
    }

    def join_partition(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pa.table(empty).to_pandas()
        left = df[["o_orderkey", "o_custkey", "o_orderdate"]]
        right = left.rename(columns={"o_orderkey": "prev_orderkey",
                                     "o_orderdate": "prev_orderdate"})
        m = left.merge(right, on="o_custkey")
        gap = m["o_orderdate"].to_numpy() - m["prev_orderdate"].to_numpy()
        keep = (gap > np.timedelta64(0, "us")) & (gap <= window)
        out = m[keep][["o_orderkey", "o_custkey", "o_orderdate",
                       "prev_orderkey", "prev_orderdate"]].copy()
        out["day_gap"] = (gap[keep] // np.timedelta64(1, "D")).astype(np.int64)
        return out

    proj = orders.map_batches(
        lambda b: b.select(["o_orderkey", "o_custkey", "o_orderdate"]),
        batch_format="pyarrow")
    return hash_copartition(proj, "o_custkey", join_partition,
                            num_parts=num_parts)


def quantile_summary(ds: "rd.Dataset", col: str,
                     qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                     ) -> pd.DataFrame:
    """EXACT distributed quantiles via a value-count combiner.

    Shape: per-batch value counts (combiner — one (value, count) partial
    per distinct value per batch) -> distributed groupby(value).sum ->
    the driver pulls only the DISTINCT-VALUE-sized aggregate, sorts it
    once, and selects quantiles from the cumulative counts.  No full
    sort of the data, nothing row-sized on the driver; cost is bounded
    by distinct-value cardinality (prices/quantities — not free text).

    Selection rule matches DuckDB's quantile_disc: the value at
    cumulative count >= ceil(q * n) (clamped to >= 1), with the q*n
    product computed in float64 on both sides.
    """
    import math

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(v[~np.isnan(v)], return_counts=True)
        return pa.table({"value": pa.array(vals, type=pa.float64()),
                         "cnt": pa.array(cnts.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("value")
             .aggregate(Sum("cnt", alias_name="n"))
             .to_pandas())
    agg = agg.sort_values("value").reset_index(drop=True)
    cum = agg["n"].to_numpy().cumsum()
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        # empty / all-NaN input: quantiles are undefined — NaN rows
        # beat the IndexError the searchsorted probe used to raise
        return pd.DataFrame([(float(q), float("nan")) for q in qs],
                            columns=["quantile", "value"])
    rows = []
    for q in qs:
        t = max(1, math.ceil(q * total))
        idx = int(np.searchsorted(cum, t, side="left"))
        rows.append((float(q), float(agg["value"].iloc[idx])))
    return pd.DataFrame(rows, columns=["quantile", "value"])


def events_funnel(ds: "rd.Dataset", steps: "list[str]",
                  key_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts",
                  num_parts: int = DEFAULT_PARTS) -> "rd.Dataset":
    """Ordered funnel analysis [the standard product-analytics funnel:
    per user, how many of the given steps happened in order, each
    strictly AFTER the previous step's first qualifying occurrence].

    Step i's timestamp is the MIN ts of a ``steps[i]`` event strictly
    later than step i-1's timestamp (the chained-min rule — the SQL
    oracle builds the same chain with per-step min-join CTEs; integer
    microsecond comparisons, no fp).  Users with no step-1 event emit
    nothing.  ONE user-key shuffle; per bucket the loop is over STEPS
    (a handful), each a vectorized groupby-min — never per user.
    Returns (key_col, steps_completed int64)."""
    if not steps or any(not isinstance(s_, str) or not s_
                        for s_ in steps):
        raise ValueError("steps must be a non-empty list of event "
                         "types")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        prev = None
        completed = None
        for i, step in enumerate(steps):
            sub = df[df[type_col] == step]
            if prev is not None:
                sub = sub.merge(prev.rename("__pt"),
                                left_on=key_col, right_index=True)
                sub = sub[sub[ts_col] > sub["__pt"]]
            cur = sub.groupby(key_col)[ts_col].min()
            if i == 0:
                completed = pd.Series(1, index=cur.index,
                                      dtype=np.int64)
            else:
                completed.loc[completed.index.isin(cur.index)] = i + 1
            if cur.empty:
                break
            prev = cur
        if completed is None or completed.empty:
            # empty frame inherits the INPUT key dtype — a hardcoded
            # int64 would clash with string-keyed funnels when another
            # bucket emits rows (block schemas must unify)
            return pd.DataFrame({key_col: df[key_col].iloc[:0],
                                 "steps_completed":
                                 pd.Series(dtype=np.int64)})
        out = completed.rename("steps_completed").reset_index()
        out["steps_completed"] = out["steps_completed"].astype(np.int64)
        return out

    prepped = ds.select_columns([key_col, type_col, ts_col])
    return hash_copartition(prepped, key_col, bucket, num_parts)
