"""Geo-distance search: vectorized haversine over Arrow batches.

OpenSearch's geo_distance query/sort family (public semantics: filter
docs within a radius of a point, order by distance ascending) expressed
in the brute-force-knn shape this repo uses for vector kernels
(`pipelines/knn.py:brute_force_topk`): the query points are ray.put
ONCE, every batch computes the haversine distance with numpy, per-batch
partial top-k bounds what leaves each task, and the driver combine is
(queries x k)-sized.

FP rule (the repo-wide vector-entry rule, NOTES.md): distances are
round(6) BEFORE ranking on BOTH sides — numpy and libm trig differ in
the last ulp, and ranking raw on one side only would make k-boundary
ties probabilistic.  Tie-break (distance asc, id asc) everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat: np.ndarray, lon: np.ndarray,
                 qlat: float, qlon: float) -> np.ndarray:
    """Great-circle distance in km — the canonical haversine with a
    PINNED operation order mirrored symbol-for-symbol by the SQL oracle
    (oracles.geo_distance_sql): half-angle sines squared, cos-lat
    product, 2*R*asin(sqrt(a))."""
    dphi = np.radians(lat - qlat) / 2.0
    dlmb = np.radians(lon - qlon) / 2.0
    a = (np.sin(dphi) ** 2
         + np.cos(np.radians(qlat)) * np.cos(np.radians(lat))
         * np.sin(dlmb) ** 2)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def geo_distance_topk(ds, queries: "dict[str, tuple[float, float]]",
                      k: int,
                      id_col: str = "event_id",
                      lat_col: str = "lat", lon_col: str = "lon",
                      radius_km: float | None = None,
                      round_decimals: int = 6) -> pd.DataFrame:
    """Top-k nearest rows to each query point, optionally restricted to
    ``radius_km`` (the geo_distance filter + geo-distance sort combo).

    Returns (query_id, rank, id_col, distance_km) ranked (rounded
    distance asc, id asc).  Per-batch partials are <= k rows per query;
    nothing corpus-sized leaves a task.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    qids = sorted(queries)
    qref = ray.put([(qid, float(queries[qid][0]), float(queries[qid][1]))
                    for qid in qids])

    def score_batch(batch: pa.Table) -> pa.Table:
        pts = ray.get(qref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        out_q, out_id, out_d = [], [], []
        for qid, qla, qlo in pts:
            d = np.round(haversine_km(lat, lon, qla, qlo),
                         round_decimals)
            sel_ids, sel_d = ids, d
            if radius_km is not None:
                keep = d <= radius_km
                sel_ids, sel_d = ids[keep], d[keep]
            if len(sel_ids) > k:
                # full (dist asc, id asc) lexsort of the batch slice —
                # exact at rounded-tie boundaries, and trivially cheap
                # next to the haversine itself at batch size 8192
                order = np.lexsort((sel_ids, sel_d))[:k]
                sel_ids, sel_d = sel_ids[order], sel_d[order]
            out_q.extend([qid] * len(sel_ids))
            out_id.append(sel_ids)
            out_d.append(sel_d)
        if not out_q:
            return pa.table({
                "query_id": pa.array([], type=pa.string()),
                id_col: pa.array([], type=batch[id_col].type),
                "distance_km": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id)),
            "distance_km": pa.array(np.concatenate(out_d),
                                    type=pa.float64())})

    parts = ds.map_batches(score_batch, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    cols = ["query_id", "rank", id_col, "distance_km"]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    out = parts.sort_values(["query_id", "distance_km", id_col],
                            ascending=[True, True, True],
                            kind="mergesort")
    out = out.groupby("query_id", sort=False).head(k)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[cols].reset_index(drop=True)


def geo_bounding_box(ds, boxes: "dict[str, tuple[float, float, float, float]]",
                     id_col: str = "event_id",
                     lat_col: str = "lat", lon_col: str = "lon"
                     ) -> pd.DataFrame:
    """geo_bounding_box filter [OpenSearch public semantics]: rows whose
    point lies inside each (top, left, bottom, right) box, INCLUSIVE
    edges; a box with left > right CROSSES THE DATELINE and matches
    lon >= left OR lon <= right (the antimeridian rule).  Returns
    (query_id, id_col) ordered (query_id, id asc) — box membership is
    exact comparisons only, so the SQL oracle mirrors it verbatim."""
    for qid, (top, left, bottom, right) in boxes.items():
        if bottom > top:
            raise ValueError(f"box {qid!r}: bottom {bottom} > top {top}")
    items = sorted((qid, float(t), float(l), float(b), float(r))
                   for qid, (t, l, b, r) in boxes.items())
    bref = ray.put(items)

    def score_batch(batch: pa.Table) -> pa.Table:
        bxs = ray.get(bref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        out_q, out_id = [], []
        for qid, top, left, bottom, right in bxs:
            m = (lat <= top) & (lat >= bottom)
            if left <= right:
                m &= (lon >= left) & (lon <= right)
            else:                       # dateline-crossing box
                m &= (lon >= left) | (lon <= right)
            sel = ids[m]
            out_q.extend([qid] * len(sel))
            out_id.append(sel)
        if not out_q:
            return pa.table({
                "query_id": pa.array([], type=pa.string()),
                id_col: pa.array([], type=batch[id_col].type)})
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id))})

    parts = ds.map_batches(score_batch, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    cols = ["query_id", id_col]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    return (parts.sort_values(cols, kind="mergesort")
                 .reset_index(drop=True)[cols])


def geo_polygon(ds, polygons: "dict[str, list[tuple[float, float]]]",
                id_col: str = "event_id",
                lat_col: str = "lat", lon_col: str = "lon"
                ) -> pd.DataFrame:
    """geo_polygon query [OpenSearch public semantics]: rows whose point
    falls inside each polygon (list of (lat, lon) vertices, closed
    implicitly), by ray-casting crossing parity.

    FP rule: the crossing test is DIVISION-FREE — per edge,
    ``cond = (y1 > lat) != (y2 > lat)`` and
    ``t = (lon - x1)*(y2 - y1) - (lat - y1)*(x2 - x1)`` with a crossing
    iff ``cond AND ((t < 0) == (y2 > y1))`` — every operation is a
    single IEEE double op mirrored symbol-for-symbol by the SQL oracle
    (oracles.geo_polygon_sql), so membership is bit-identical on both
    sides.  Points exactly on an edge follow the formula's parity (the
    shared tie rule).  Returns (query_id, id_col) ordered
    (query_id, id asc)."""
    for qid, verts in polygons.items():
        if len(verts) < 3:
            raise ValueError(f"polygon {qid!r} needs >= 3 vertices")
    items = sorted((qid, [(float(la), float(lo)) for la, lo in verts])
                   for qid, verts in polygons.items())
    pref = ray.put(items)

    def score_batch(batch: pa.Table) -> pa.Table:
        polys = ray.get(pref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        out_q, out_id = [], []
        for qid, verts in polys:
            cnt = np.zeros(len(ids), dtype=np.int64)
            n_v = len(verts)
            for i in range(n_v):
                y1, x1 = verts[i]
                y2, x2 = verts[(i + 1) % n_v]
                cond = (y1 > lat) != (y2 > lat)
                t = (lon - x1) * (y2 - y1) - (lat - y1) * (x2 - x1)
                cnt += (cond & ((t < 0) == (y2 > y1))).astype(np.int64)
            sel = ids[(cnt % 2) == 1]
            out_q.extend([qid] * len(sel))
            out_id.append(sel)
        if not out_q:
            return pa.table({
                "query_id": pa.array([], type=pa.string()),
                id_col: pa.array([], type=batch[id_col].type)})
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id))})

    parts = ds.map_batches(score_batch, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    cols = ["query_id", id_col]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    return (parts.sort_values(cols, kind="mergesort")
                 .reset_index(drop=True)[cols])


MERCATOR_LAT_MAX = 85.0511287798066


def geotile_grid(ds, zoom: int, size: int = 100,
                 lat_col: str = "lat", lon_col: str = "lon"
                 ) -> pd.DataFrame:
    """geotile_grid aggregation [OpenSearch public semantics]: bucket
    points into web-mercator "z/x/y" map tiles and count, top ``size``
    buckets ordered (doc_count desc, tile asc).

    Tile math (the OSM slippy-tile formulas, shared op order with the
    SQL oracle — every step one IEEE double op through the same libm):
      x = floor((lon + 180) / 360 * 2^z)
      y = floor((1 - ln(tan(r) + 1/cos(r)) / pi) / 2 * 2^z), r = radians(lat)
    clamped into [0, 2^z - 1]; points beyond the mercator latitude
    bound (|lat| > 85.0511287798066) are excluded — the OpenSearch
    rule.  Per batch: vectorized tile ids + one np.unique partial
    (tile-distinct-sized); ONE small groupby merges partials."""
    if not (0 <= int(zoom) <= 29):
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    z = int(zoom)
    f = float(1 << z)
    import pyarrow as _pa

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        keep = np.abs(lat) <= MERCATOR_LAT_MAX
        lat, lon = lat[keep], lon[keep]
        if not len(lat):
            return pa.table({"tile": pa.array([], type=_pa.string()),
                             "doc_count": pa.array([], type=_pa.int64())})
        x = np.floor((lon + 180.0) / 360.0 * f)
        # pinned deg->rad constant (shared with the SQL): radians() on
        # another engine could be lat*pi/180 in a different op order
        r = lat * 0.017453292519943295
        y = np.floor((1.0 - np.log(np.tan(r) + 1.0 / np.cos(r))
                      / np.pi) / 2.0 * f)
        xi = np.clip(x, 0.0, f - 1.0).astype(np.int64)
        yi = np.clip(y, 0.0, f - 1.0).astype(np.int64)
        code = xi * (1 << z) + yi
        u, c = np.unique(code, return_counts=True)
        tiles = [f"{z}/{v // (1 << z)}/{v % (1 << z)}" for v in u.tolist()]
        return pa.table({"tile": pa.array(tiles, type=_pa.string()),
                         "doc_count": pa.array(c.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("tile").sum("doc_count"))
    out = agg.to_pandas().rename(columns={"sum(doc_count)": "doc_count"})
    if out.empty:
        return pd.DataFrame(columns=["tile", "doc_count"])
    out["doc_count"] = out["doc_count"].astype(np.int64)
    out = out.sort_values(["doc_count", "tile"],
                          ascending=[False, True],
                          kind="mergesort").head(size)
    return out.reset_index(drop=True)[["tile", "doc_count"]]


GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_grid(ds, precision: int, size: int = 100,
                 lat_col: str = "lat", lon_col: str = "lon"
                 ) -> pd.DataFrame:
    """geohash_grid aggregation [OpenSearch public semantics]: bucket
    points by base32 geohash cell at ``precision`` chars, count, top
    ``size`` ordered (doc_count desc, hash asc).

    Geohash is pure INTEGER math (binary subdivision + bit interleave,
    longitude first), so membership is exact on both sides:
      xq = floor((lon + 180) / 360 * 2^ceil(5p/2))   (clamped)
      yq = floor((lat + 90) / 180 * 2^floor(5p/2))
    interleaved MSB-first into 5p bits -> base32 chars.  The SQL oracle
    unrolls the same bit sum (oracles.geohash_grid_sql)."""
    p = int(precision)
    if not (1 <= p <= 9):
        raise ValueError(f"precision must be in [1, 9], got {precision}")
    n_bits = 5 * p
    n_x = (n_bits + 1) // 2
    n_y = n_bits // 2
    fx, fy = float(1 << n_x), float(1 << n_y)
    import pyarrow as _pa

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        if not len(lat):
            return pa.table({"geohash": pa.array([], type=_pa.string()),
                             "doc_count": pa.array([], type=_pa.int64())})
        xq = np.clip(np.floor((lon + 180.0) / 360.0 * fx),
                     0.0, fx - 1.0).astype(np.int64)
        yq = np.clip(np.floor((lat + 90.0) / 180.0 * fy),
                     0.0, fy - 1.0).astype(np.int64)
        code = np.zeros(len(lat), dtype=np.int64)
        for j in range(n_bits):          # j=0 is the MSB, longitude first
            if j % 2 == 0:
                bit = (xq >> (n_x - 1 - j // 2)) & 1
            else:
                bit = (yq >> (n_y - 1 - (j - 1) // 2)) & 1
            code |= bit << (n_bits - 1 - j)
        u, c = np.unique(code, return_counts=True)
        hashes = ["".join(GEOHASH32[(v >> (5 * (p - 1 - g))) & 31]
                          for g in range(p)) for v in u.tolist()]
        return pa.table({"geohash": pa.array(hashes, type=_pa.string()),
                         "doc_count": pa.array(c.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("geohash").sum("doc_count"))
    out = agg.to_pandas().rename(columns={"sum(doc_count)": "doc_count"})
    if out.empty:
        return pd.DataFrame(columns=["geohash", "doc_count"])
    out["doc_count"] = out["doc_count"].astype(np.int64)
    out = out.sort_values(["doc_count", "geohash"],
                          ascending=[False, True],
                          kind="mergesort").head(size)
    return out.reset_index(drop=True)[["geohash", "doc_count"]]


def geo_centroid(ds, lat_col: str = "lat", lon_col: str = "lon",
                 decimals: int = 2) -> pd.DataFrame:
    """geo_centroid aggregation [OpenSearch public semantics:
    arithmetic mean of the points].

    Distributed-exactness contract: inputs must ALREADY be quantized to
    ``decimals`` places (the scaled values are integers up to fp noise,
    so numpy's rint and the oracle's round agree — a true .5 tie would
    split half-even vs half-up and is outside the contract).  Sums run
    as SCALED int64 — integer addition is associative, so the result is
    independent of Ray's block arrival order (a float partial-sum tree
    would drift by ulps run-to-run and against the oracle's ordered
    SUM).  The mean divides ONCE at the end; output rounds to 6dp.
    Returns one row (lat, lon, count)."""
    scale = float(10 ** int(decimals))

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        sl = np.rint(lat * scale).astype(np.int64).sum()
        sn = np.rint(lon * scale).astype(np.int64).sum()
        return pa.table({"sl": pa.array([int(sl)], type=pa.int64()),
                         "sn": pa.array([int(sn)], type=pa.int64()),
                         "n": pa.array([len(lat)], type=pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(agg["n"].sum())
    if n == 0:
        return pd.DataFrame({"lat": [], "lon": [], "count": []})
    return pd.DataFrame({
        "lat": [round(float(agg["sl"].sum()) / (scale * n), 6)],
        "lon": [round(float(agg["sn"].sum()) / (scale * n), 6)],
        "count": [n]})
