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
from ray.data.aggregate import Count, Sum


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
