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

    from netml_ray.partition import auto_concurrency

    return ds.map_batches(_Join, batch_format="pyarrow",
                          concurrency=auto_concurrency())


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


def hash_join(
    left,
    right,
    key: str,
    *,
    how: str = "inner",
    suffix: str = "_r",
    num_partitions: int | None = None,
    bloom: bool = False,
):
    """Large-large equi-join: co-partition both sides by ``hash(key)``
    (ONE shuffle over the union, the same exchange the as-of join
    uses) and merge each partition pair Arrow-natively: ONE
    dictionary-encode over the concatenated keys, a stable argsort of
    the build side, two ``searchsorted`` calls per probe row, and
    output materialized with vectorized ``pc.take`` gathers — no
    pandas conversion, so list/nested payload columns pass through
    zero-copy and unmatched left rows yield typed NULLs (no float64
    upcast of int columns).  ``how`` ∈ {inner, left, full}; ``full``
    additionally emits unmatched build-side rows with the key column
    coalesced from the right (SQL ``FULL JOIN … USING`` semantics) and
    typed NULLs for the other left columns.  NULL keys never match
    (SQL semantics).  For small build sides prefer ``broadcast_join``
    (no shuffle at all).

    ``bloom=True`` (inner only): build a Bloom filter over the right
    side's keys (one narrow pass) and drop left rows that definitely
    can't match BEFORE the co-partitioning exchange — the all-to-all
    then carries only plausible matches (``netml_ray.bloom``); false
    positives are resolved exactly by the join itself, so the result
    is bit-identical (pinned by pytest).
    """
    from netml_ray.partition import partition_map2

    if how not in ("inner", "left", "full"):
        raise ValueError(f"how={how!r} not supported (inner|left|full)")
    if bloom and how == "inner":
        from netml_ray.bloom import bloom_prefilter, build_bloom

        left = bloom_prefilter(left, key, build_bloom(right, key))

    def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        nl, nr = lt.num_rows, rt.num_rows
        rcols = [c for c in rt.column_names if c != key]

        def _name(c: str) -> str:
            return c + suffix if c in lt.column_names else c

        def _right_only() -> pa.Table:
            """All right rows, null left columns, key coalesced."""
            cols = {}
            for c in lt.column_names:
                if c == key:
                    cols[c] = pc.cast(rt[key], lt.schema.field(c).type)
                else:
                    cols[c] = pa.nulls(nr, type=lt.schema.field(c).type)
            for c in rcols:
                cols[_name(c)] = rt[c]
            return pa.table(cols)

        if nl == 0 and how == "full" and nr > 0:
            return _right_only()
        if nl == 0 or (nr == 0 and how == "inner"):
            cols = {c: pa.array([], type=lt.schema.field(c).type)
                    for c in lt.column_names}
            for c in rcols:
                cols[_name(c)] = pa.array([], type=rt.schema.field(c).type)
            return pa.table(cols)
        if nr == 0:  # left/full: all left rows, null right columns
            cols = {c: lt[c] for c in lt.column_names}
            for c in rcols:
                cols[_name(c)] = pa.nulls(nl, type=rt.schema.field(c).type)
            return pa.table(cols)

        rkey = pc.cast(rt[key], lt[key].type)
        combo = pa.chunked_array(
            list(lt[key].chunks) + list(rkey.chunks), type=lt[key].type)
        enc = pc.dictionary_encode(combo)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices
        if idx.null_count:
            # null keys never match: distinct sentinels per side
            codes = np.asarray(idx.fill_null(-1)).astype(np.int64)
            null_mask = np.asarray(pc.is_null(idx))
            codes[:nl][null_mask[:nl]] = -1
            codes[nl:][null_mask[nl:]] = -2
        else:
            codes = idx.to_numpy().astype(np.int64)
        lcodes, rcodes = codes[:nl], codes[nl:]
        rorder = np.argsort(rcodes, kind="stable")
        rsorted = rcodes[rorder]
        lo_i = np.searchsorted(rsorted, lcodes, side="left")
        hi_i = np.searchsorted(rsorted, lcodes, side="right")
        counts = hi_i - lo_i
        rmask = None
        if how == "inner":
            out_counts = counts
            total = int(counts.sum())
            l_idx = np.repeat(np.arange(nl), counts)
            offs = np.concatenate([[0], np.cumsum(counts)])
            intra = np.arange(total) - np.repeat(offs[:-1], counts)
            r_idx = rorder[np.repeat(lo_i, counts) + intra]
        else:
            out_counts = np.maximum(counts, 1)
            total = int(out_counts.sum())
            l_idx = np.repeat(np.arange(nl), out_counts)
            offs = np.concatenate([[0], np.cumsum(out_counts)])
            intra = np.arange(total) - np.repeat(offs[:-1], out_counts)
            matched = np.repeat(counts > 0, out_counts)
            r_idx = np.zeros(total, dtype=np.int64)
            if matched.any():
                r_idx[matched] = rorder[
                    (np.repeat(lo_i, out_counts) + intra)[matched]]
            if not matched.all():
                rmask = ~matched
        lsel = pc.take(lt, pa.array(l_idx))
        cols = {c: lsel[c] for c in lsel.column_names}
        ridx = pa.array(r_idx, mask=rmask) if rmask is not None else pa.array(r_idx)
        for c in rcols:
            cols[_name(c)] = pc.take(rt[c], ridx)
        out = pa.table(cols)
        if how == "full":
            matched_r = np.zeros(nr, dtype=bool)
            if rmask is not None:
                hit = r_idx[~rmask]
            else:
                hit = r_idx
            # null-key right rows (code -2) never match by construction
            matched_r[hit] = True
            un_r = np.flatnonzero(~matched_r)
            if len(un_r):
                sel = pa.array(un_r)
                extra = {}
                for c in lt.column_names:
                    if c == key:
                        extra[c] = pc.take(
                            pc.cast(rt[key], lt.schema.field(c).type), sel)
                    else:
                        extra[c] = pa.nulls(
                            len(un_r), type=lt.schema.field(c).type)
                for c in rcols:
                    extra[_name(c)] = pc.take(rt[c], sel)
                out = pa.concat_tables([out, pa.table(extra)])
        return out

    return partition_map2(left, right, key, _fn,
                          num_partitions=num_partitions)


def range_join(
    left,
    right,
    key: str,
    *,
    left_ts: str,
    right_ts: str,
    lo: float = 0.0,
    hi: float = 0.0,
    suffix: str = "_r",
    num_partitions: int | None = None,
):
    """Interval (range) join: for every left row, all right rows of the
    same key with ``right_ts ∈ [left_ts + lo, left_ts + hi]``.

    Co-partition by key, sort each side by (key, ts), then per left
    segment ONE pair of ``searchsorted`` calls yields each row's match
    window; matches materialize via two vectorized ``take`` gathers
    (output-proportional — no per-pair Python).  Inner semantics:
    left rows with no in-range right row are dropped.
    """
    from netml_ray.kernels import segment_starts
    from netml_ray.partition import partition_map2

    def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        nl = lt.num_rows
        out_schema_right = [c for c in rt.column_names if c != key]
        if nl == 0 or rt.num_rows == 0:
            cols = {c: lt[c] for c in lt.column_names}
            for c in out_schema_right:
                name = c + suffix if c in lt.column_names else c
                cols[name] = pa.nulls(0, type=rt.schema.field(c).type)
            return pa.table(cols).slice(0, 0)
        combo = pa.chunked_array(
            list(lt[key].chunks) + list(rt[key].chunks), type=lt[key].type)
        enc = pc.dictionary_encode(combo)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        lcodes, rcodes = codes[:nl], codes[nl:]
        ltsv = lt[left_ts].to_numpy().astype(np.float64)
        rtsv = rt[right_ts].to_numpy().astype(np.float64)
        r_starts = segment_starts(rcodes)
        r_ends = np.r_[r_starts[1:], len(rcodes)]
        rmap = {rcodes[s]: (s, e) for s, e in zip(r_starts, r_ends)}
        l_starts = segment_starts(lcodes)
        l_ends = np.r_[l_starts[1:], nl]
        win_lo = np.zeros(nl, dtype=np.int64)
        win_hi = np.zeros(nl, dtype=np.int64)
        for s, e in zip(l_starts, l_ends):
            seg = rmap.get(lcodes[s])
            if seg is None:
                continue
            rs, re_ = seg
            win_lo[s:e] = rs + np.searchsorted(rtsv[rs:re_], ltsv[s:e] + lo,
                                               side="left")
            win_hi[s:e] = rs + np.searchsorted(rtsv[rs:re_], ltsv[s:e] + hi,
                                               side="right")
        counts = np.maximum(win_hi - win_lo, 0)
        l_idx = np.repeat(np.arange(nl), counts)
        total = int(counts.sum())
        offs = np.concatenate([[0], np.cumsum(counts)])
        r_idx = np.repeat(win_lo, counts) + (np.arange(total)
                                             - np.repeat(offs[:-1], counts))
        lsel = pc.take(lt, pa.array(l_idx))
        cols = {c: lsel[c] for c in lsel.column_names}
        for c in out_schema_right:
            name = c + suffix if c in lt.column_names else c
            cols[name] = pc.take(rt[c], pa.array(r_idx))
        return pa.table(cols)

    return partition_map2(
        left, right, key, _fn, num_partitions=num_partitions,
        sort_left=[key, left_ts], sort_right=[key, right_ts])


def semi_join_broadcast(ds, keys_iterable, key: str, *, anti: bool = False):
    """Semi/anti join against a SMALL driver-side key set: broadcast the
    key set once (``ray.put``), filter inside map_batches with a
    vectorized ``pc.is_in`` membership test.  For a large / distributed
    right side use ``semi_join`` (co-partitioned exchange) instead."""
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

    from netml_ray.partition import auto_concurrency

    return ds.map_batches(_Semi, batch_format="pyarrow",
                          concurrency=auto_concurrency())


def semi_join(left, right, key: str, *, anti: bool = False,
              num_partitions: int | None = None, bloom: bool = False):
    """SQL EXISTS / NOT EXISTS: keep left rows whose ``key`` does
    (``anti=False``) or does not (``anti=True``) appear among the
    right side's non-NULL keys.  Same co-partitioned exchange as
    ``hash_join`` but the probe is a membership test — the right side
    ships ONLY its key column into the shuffle, and output carries
    only left columns (never wider than the input).  NULL left keys
    never match, so they are dropped by the semi and kept by the anti
    (SQL NOT EXISTS semantics, not NOT IN's NULL poisoning).

    ``bloom=True`` (semi only — an anti must see every probe row):
    Bloom-prefilter the left side before the exchange; a bloom
    negative is exact ("key definitely absent"), a false positive is
    resolved by the exact membership test."""
    from netml_ray.partition import partition_map2

    right_keys = right.select_columns([key])
    if bloom and not anti:
        from netml_ray.bloom import bloom_prefilter, build_bloom

        left = bloom_prefilter(left, key, build_bloom(right_keys, key))

    def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0:
            return lt
        lk = lt[key]
        valid = pc.is_valid(lk)
        rk = rt[key].drop_null()
        if rt.num_rows == 0 or len(rk) == 0:
            hit = pa.array(np.zeros(lt.num_rows, dtype=bool))
        else:
            hit = pc.and_kleene(pc.is_in(lk, value_set=rk), valid)
            hit = pc.fill_null(hit, False)
        keep = pc.invert(hit) if anti else hit
        return lt.filter(keep)

    return partition_map2(left, right_keys, key, _fn,
                          num_partitions=num_partitions)


def anti_join(left, right, key: str, *, num_partitions: int | None = None):
    """SQL NOT EXISTS — see ``semi_join``."""
    return semi_join(left, right, key, anti=True,
                     num_partitions=num_partitions)


def interval_overlap_join(
    left,
    right,
    key: str,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    suffix: str = "_r",
    num_partitions: int | None = None,
):
    """Interval × interval OVERLAP join: for every left interval
    [ls, le], all right intervals [rs, re] of the same key with
    ``rs <= le AND re >= ls`` (closed-interval overlap — the standard
    non-equi join shape for sessions × campaigns, downtime × traffic,
    validity windows × observations).  Start/end columns must be
    numeric (e.g. epoch microseconds); inner semantics.

    Scale shape: co-partition both sides by key (ONE exchange each),
    sort right by (key, start); per left segment the candidate window
    is cut on BOTH sides before any expansion — the high cut is
    ``searchsorted(right_starts, le, 'right')`` (starts beyond the
    left end can't overlap) and the low cut is a binary search over
    the RUNNING MAX of right ends (monotone, so every interval before
    the first index with ``max_end >= ls`` is provably dead — the
    trick that keeps long-lived stale intervals from forcing a full
    prefix scan).  Survivors expand via repeat/arange gathers and one
    residual mask; output-proportional work thereafter.
    """
    from netml_ray.kernels import segment_starts
    from netml_ray.partition import partition_map2

    def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        nl = lt.num_rows
        out_right = [c for c in rt.column_names if c != key]

        def _empty():
            cols = {c: lt[c].slice(0, 0) for c in lt.column_names}
            for c in out_right:
                name = c + suffix if c in lt.column_names else c
                cols[name] = pa.nulls(0, type=rt.schema.field(c).type)
            return pa.table(cols)

        if nl == 0 or rt.num_rows == 0:
            return _empty()
        combo = pa.chunked_array(
            list(lt[key].chunks) + list(rt[key].chunks),
            type=lt[key].type)
        enc = pc.dictionary_encode(combo)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        lcodes, rcodes = codes[:nl], codes[nl:]
        ls = lt[left_start].to_numpy(zero_copy_only=False)
        le = lt[left_end].to_numpy(zero_copy_only=False)
        rs_v = rt[right_start].to_numpy(zero_copy_only=False)
        re_v = rt[right_end].to_numpy(zero_copy_only=False)
        r_starts = segment_starts(rcodes)
        r_ends = np.r_[r_starts[1:], len(rcodes)]
        rmap = {rcodes[s]: (s, e) for s, e in zip(r_starts, r_ends)}
        l_starts = segment_starts(lcodes)
        l_ends = np.r_[l_starts[1:], nl]
        win_lo = np.zeros(nl, dtype=np.int64)
        win_hi = np.zeros(nl, dtype=np.int64)
        for s, e in zip(l_starts, l_ends):
            seg = rmap.get(lcodes[s])
            if seg is None:
                continue
            rs0, re0 = seg
            runmax = np.maximum.accumulate(re_v[rs0:re0])
            win_lo[s:e] = rs0 + np.searchsorted(runmax, ls[s:e],
                                                side="left")
            win_hi[s:e] = rs0 + np.searchsorted(rs_v[rs0:re0], le[s:e],
                                                side="right")
        counts = np.maximum(win_hi - win_lo, 0)
        if not counts.any():
            return _empty()
        l_idx = np.repeat(np.arange(nl), counts)
        total = int(counts.sum())
        offs = np.concatenate([[0], np.cumsum(counts)])
        r_idx = np.repeat(win_lo, counts) + (
            np.arange(total) - np.repeat(offs[:-1], counts))
        # residual mask: the window is only a superset (ends are not
        # monotone under a start sort)
        keep = re_v[r_idx] >= ls[l_idx]
        l_idx, r_idx = l_idx[keep], r_idx[keep]
        lsel = pc.take(lt, pa.array(l_idx))
        cols = {c: lsel[c] for c in lsel.column_names}
        for c in out_right:
            name = c + suffix if c in lt.column_names else c
            cols[name] = pc.take(rt[c], pa.array(r_idx))
        return pa.table(cols)

    return partition_map2(
        left, right, key, _fn, num_partitions=num_partitions,
        sort_left=[key, left_start, left_end],
        sort_right=[key, right_start, right_end])
