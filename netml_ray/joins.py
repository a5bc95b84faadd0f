"""Broadcast joins & label join (ref J1, parser.py:857-924).

Small build sides (dimension tables, label maps) are materialized once,
put in the object store with ``ray.put``, and looked up inside
``map_batches`` — no shuffle (ray_guide: broadcast pattern).  The label
join replicates the reference's semantics: last-row-wins dedup on the
build side (parser.py:900-902), inner semantics (unmatched probe rows
dropped, parser.py:905-918), BENIGN/NORMAL → 0 else 1 normalization
(parser.py:877, 893-899).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

NORMAL_LABELS = {"BENIGN", "NORMAL"}


def _to_pandas_small(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset (small side only)


def broadcast_join(
    ds,
    small,
    key: str,
    *,
    right_cols: list[str] | None = None,
    how: str = "left",
    suffix: str = "_r",
    on_duplicate: str = "error",
):
    """Map-side hash join of a Dataset against a small table.

    ``small`` may be a pandas DataFrame, Arrow table, or small Dataset.
    The build side is shipped once via ``ray.put`` and read per task —
    not re-serialized per batch.  ``how`` ∈ {left, inner}.

    The build side must be unique on ``key``: ``on_duplicate`` ∈
    {"error" (default — raise, naming the key), "last", "first"}
    controls what happens when it isn't (label_join uses "last" to
    keep the reference's last-row-wins semantics, parser.py:900-902).
    """
    import ray

    sdf = _to_pandas_small(small)
    if right_cols is not None:
        sdf = sdf[[key] + [c for c in right_cols if c != key]]
    if sdf[key].duplicated().any():
        if on_duplicate == "error":
            dups = sdf[key][sdf[key].duplicated()].unique()[:5]
            raise ValueError(
                f"broadcast_join build side has duplicate values in key "
                f"{key!r} (e.g. {list(dups)}); pass on_duplicate='last' or "
                f"'first' to dedup"
            )
        sdf = sdf.drop_duplicates(subset=[key], keep=on_duplicate)
    ref = ray.put(sdf)

    class _Join:
        def __init__(self):
            self.small = ray.get(ref).set_index(key)

        def __call__(self, t: pa.Table) -> pa.Table:
            probe = t[key].to_pandas()
            idx = self.small.index.get_indexer(probe)
            matched = idx >= 0
            if how == "inner":
                t = t.filter(pa.array(matched))
                idx = idx[matched]
                matched = matched[matched]
            for c in self.small.columns:
                name = c + suffix if c in t.column_names else c
                vals = self.small[c].to_numpy()[np.where(matched, idx, 0)]
                if matched.all():
                    arr = pa.array(vals)
                else:
                    arr = pa.array(vals, mask=~matched)
                t = t.append_column(name, arr)
            return t

    return ds.map_batches(_Join, batch_format="pyarrow", concurrency=(1, 8))


def normalize_labels(labels_df: pd.DataFrame, key: str, label_col: str) -> pd.DataFrame:
    """CICIDS-style label normalization + last-row-wins dedup
    (ref: parser.py:877-902)."""
    out = labels_df[[key, label_col]].copy()
    out["label"] = (~out[label_col].str.upper().isin(NORMAL_LABELS)).astype(np.int64)
    out = out.drop_duplicates(subset=[key], keep="last")  # last wins
    return out[[key, "label"]]


def label_join(ds, labels_df: pd.DataFrame, key: str, label_col: str = "label_raw"):
    """Inner broadcast label join with reference semantics (J1)."""
    norm = normalize_labels(labels_df, key, label_col)
    return broadcast_join(ds, norm, key, how="inner")


def semi_join(ds, keys_iterable, key: str, *, anti: bool = False):
    """Semi/anti join: broadcast the key set, filter inside map_batches
    with a vectorized ``pc.is_in`` membership test."""
    import ray

    ref = ray.put(pa.array(sorted(set(keys_iterable))))

    class _Semi:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[key], value_set=self.keys)
            if anti:
                mask = pc.invert(mask)
            return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(_Semi, batch_format="pyarrow", concurrency=(1, 8))
