"""Geospatial feature operators: nearest-POI assignment and grid-cell
density — the location-enrichment stage of a behavioral pipeline
(reference analog: netml's per-flow header enrichment, recast as
per-entity spatial features; reference/src/netml/pparser/parser.py
carries no geo ops, so these extend the engine the way a web-scale
event pipeline needs).

The test corpora carry no lat/lon columns, so both operators accept
coordinates synthesized DETERMINISTICALLY from the entity key by
:func:`synth_latlon` — pure 64-bit integer arithmetic stated
identically in the SQL oracles (the url_features_docs precedent).  A
real deployment passes ``lat_col`` / ``lon_col`` instead.

Float-parity design (measured, not guessed): DuckDB's and numpy's
``sin`` / ``cos`` / ``sqrt`` are BITWISE identical on this platform,
while ``asin`` differs in the last ulp.  The nearest-POI pick
therefore orders by the raw haversine TERM h = sin²(Δφ/2) +
cosφ₁·cosφ₂·sin²(Δλ/2) — monotone in distance and bitwise-equal on
both engines — and only the EMITTED distance goes through ``asin``,
rounded to 4 decimals (0.1 m) so the ≤3e-12 km asin divergence can
never flip a digit.

Scale shape: POIs are a SMALL broadcast side (a list in the task
closure — the model-broadcast precedent); per-entity work is one
(n_keys × n_poi) vectorized trig block inside the keyed exchange that
dedups entities.  Grid stats are distinct-pair count partials + ONE
cell-hash exchange (the hhi_concentration shape) — the event stream
never moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["synth_latlon", "nearest_poi", "grid_stats", "DEFAULT_POIS"]

# (poi_id, lat, lon) — a fixed broadcast side for tests/benchmarks
DEFAULT_POIS = [
    (0, 37.77, -122.42),   # SF
    (1, 51.51, -0.13),     # London
    (2, 35.68, 139.69),    # Tokyo
    (3, -33.87, 151.21),   # Sydney
    (4, 28.61, 77.21),     # Delhi
]


def synth_latlon(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-key coordinates from 64-bit integer keys —
    pure int64 arithmetic, stated verbatim in the SQL oracles:
    ``lat = ((k * 2654435761) % 18000) / 100.0 - 90.0`` and
    ``lon = ((k * 1103515245 + 12345) % 36000) / 100.0 - 180.0``."""
    k = keys.astype(np.int64)
    lat = ((k * 2654435761) % 18000) / 100.0 - 90.0
    lon = ((k * 1103515245 + 12345) % 36000) / 100.0 - 180.0
    return lat, lon


def _haversine_term(lat1, lon1, lat2, lon2):
    """h = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2), multiplication order
    matching the SQL text exactly (left-associative)."""
    s1 = np.sin(np.radians((lat2 - lat1) / 2))
    s2 = np.sin(np.radians((lon2 - lon1) / 2))
    return s1 * s1 + np.cos(np.radians(lat1)) * np.cos(
        np.radians(lat2)) * s2 * s2


def nearest_poi(ds, key_col: str, pois=None, *, round_to: int = 4):
    """For every distinct key: the nearest point-of-interest by
    haversine distance (R = 6371 km) and that distance — the
    store-assignment / market-area primitive.  Ties on the raw
    haversine term break toward the smaller poi_id (stated in SQL).

    Output: one row per distinct key — (key, poi_id, dist_km)."""
    from .partition import partition_map

    pois = DEFAULT_POIS if pois is None else pois
    poi_id = np.array([p[0] for p in pois], dtype=np.int64)
    plat = np.array([p[1] for p in pois], dtype=np.float64)
    plon = np.array([p[2] for p in pois], dtype=np.float64)

    def _distinct(t: pa.Table) -> pa.Table:
        return t.select([key_col]).group_by([key_col]).aggregate([])

    keys_ds = ds.select_columns([key_col]) \
        .map_batches(_distinct, batch_size=None, batch_format="pyarrow")

    def _fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key_col: t[key_col],
                             "poi_id": pa.array([], pa.int64()),
                             "dist_km": pa.array([], pa.float64())})
        k = np.unique(t[key_col].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        lat, lon = synth_latlon(k)
        # (n_keys, n_poi) haversine terms; argmin is bitwise-safe
        h = _haversine_term(lat[:, None], lon[:, None],
                            plat[None, :], plon[None, :])
        pick = np.argmin(h, axis=1)          # first min == smallest id
        hbest = h[np.arange(len(k)), pick]
        dist = 2.0 * 6371.0 * np.arcsin(np.sqrt(hbest))
        return pa.table({key_col: pa.array(k),
                         "poi_id": pa.array(poi_id[pick]),
                         "dist_km": pa.array(np.round(dist, round_to))})

    return partition_map(keys_ds, key_col, _fn, sort_by=[key_col])


def grid_stats(ds, key_col: str, val_col: str, *,
               cell_deg: float = 5.0, round_to: int = 9):
    """Per-grid-cell density: event count, DISTINCT entity count and
    value sum over ``cell_deg``° × ``cell_deg``° cells of the
    synthesized coordinates — the spatial-density feature (geohash
    binning at fixed precision).  Cells are
    ``floor((lat + 90) / cell_deg)`` / ``floor((lon + 180) / cell_deg)``.

    Scale shape: per-batch (cell, key) group-by partials carrying
    (n, value_sum) — the exchange moves distinct pairs, never events —
    ONE cell-hash exchange, in-partition pair collapse + segmented
    sums (the hhi_concentration kernel shape)."""
    from .partition import partition_map

    def _partial(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = synth_latlon(k)
        cy = np.floor((lat + 90.0) / cell_deg).astype(np.int64)
        cx = np.floor((lon + 180.0) / cell_deg).astype(np.int64)
        cell = cy * 100_000 + cx
        g = pa.table({"cell": pa.array(cell), key_col: t[key_col],
                      "v": t[val_col]}) \
            .group_by(["cell", key_col]) \
            .aggregate([([], "count_all"), ("v", "sum")])
        return g.rename_columns(["cell", key_col, "n", "vs"])

    parts = ds.select_columns([key_col, val_col]) \
        .map_batches(_partial, batch_size=None, batch_format="pyarrow")

    def _fin(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"cell_lat": pa.array([], pa.int64()),
                             "cell_lon": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64()),
                             "value_sum": pa.array([], pa.float64())})
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        vs = t["vs"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = len(cell)
        pb = np.r_[True, (cell[1:] != cell[:-1]) | (key[1:] != key[:-1])]
        pidx = np.flatnonzero(pb)
        pn = np.add.reduceat(n, pidx)
        pv = np.add.reduceat(vs, pidx)
        pcell = cell[pidx]
        cb = np.r_[True, pcell[1:] != pcell[:-1]]
        cidx = np.flatnonzero(cb)
        out_cell = pcell[cidx]
        return pa.table({
            "cell_lat": pa.array(out_cell // 100_000),
            "cell_lon": pa.array(out_cell % 100_000),
            "n_events": pa.array(np.add.reduceat(pn, cidx)),
            "n_users": pa.array(np.diff(np.r_[cidx, len(pcell)])
                                .astype(np.int64)),
            "value_sum": pa.array(np.round(np.add.reduceat(pv, cidx),
                                           round_to))})

    return partition_map(parts, "cell", _fin,
                         sort_by=["cell", key_col])
