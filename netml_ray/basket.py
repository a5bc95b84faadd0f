"""Market-basket association rules (support / confidence / lift).

``association_rules`` treats each ``basket_col`` value as a basket and
each distinct ``item_col`` value in it as an item, and returns every
directed rule ``antecedent -> consequent`` between items co-occurring
in at least ``min_joint`` baskets, scored with the classic Agrawal &
Srikant (VLDB 1994) measures over DISTINCT memberships:

- ``support``    = n_joint / n_baskets
- ``confidence`` = n_joint / n_antecedent
- ``lift``       = n_joint * n_baskets / (n_antecedent * n_consequent)

netml's closest analog is its categorical per-flow protocol counting
(reference src/netml/pparser/parser.py per-flow categorical tallies);
this generalizes co-occurrence to cross-item dependence scoring — the
"users who trigger A also trigger B" feature a recommender / anomaly
pipeline derives from an event log.

Scale shape (north_rule: same job at N and 4N parallelism):

- ONE hash exchange on ``basket_col`` (``partition_map``) co-locates
  each basket's rows; inside a partition everything is vectorized —
  lexsort-dedup to distinct (basket, item), local factorize, repeat/
  arange pair expansion (the ``cooccurrence_similarity`` kernel shape)
  bounded by the ``max_basket`` quadratic guard, reduceat counts.
- Each partition emits ONE small partial table carrying three kinds of
  rows (pair counts, per-item basket counts, a basket-total row) —
  O(items² + items + 1) rows per partition, independent of basket
  count, so the driver fold is tiny.  Baskets are disjoint across hash
  partitions, so partial counts sum exactly.
- The driver folds partials with one Arrow ``group_by`` and computes
  the rule measures in numpy — O(distinct item pairs) work.

Baskets with more than ``max_basket`` distinct items are SKIPPED for
pair counting (logged, same contract as ``cooccurrence_similarity``
and the n-gram Jaccard family) but still count toward ``n_baskets``
and the per-item counts; the SQL oracle must state the identical rule
(trivially true when every basket is under the cap, as in the test
corpora — the guard exists for web-scale skew).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

__all__ = ["association_rules"]


def _empty_partial() -> pa.Table:
    return pa.table({"kind": pa.array([], pa.int8()),
                     "a": pa.array([], pa.string()),
                     "b": pa.array([], pa.string()),
                     "n": pa.array([], pa.int64())})


def association_rules(ds, basket_col: str, item_col: str, *,
                      min_joint: int = 1, max_basket: int = 4096,
                      round_to: int = 9) -> pa.Table:
    """Directed association rules over distinct (basket, item)
    memberships; returns a driver-side ``pa.Table`` (the rule set is
    O(items²), small by construction) sorted by (antecedent,
    consequent).  NULL baskets/items are dropped on both sides."""
    from netml_ray.partition import partition_map

    def _partial(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        if not t.num_rows:
            return _empty_partial()
        bk = t[basket_col].to_numpy(zero_copy_only=False)
        items, codes = np.unique(
            np.asarray(t[item_col].to_pylist(), dtype=object),
            return_inverse=True)
        order = np.lexsort((codes, bk))
        bs, cs = bk[order], codes[order]
        keep = np.r_[True, (bs[1:] != bs[:-1]) | (cs[1:] != cs[:-1])]
        bs, cs = bs[keep], cs[keep]
        first = np.r_[True, bs[1:] != bs[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, len(bs)])
        n_baskets = len(starts)
        # per-item distinct-basket counts (over ALL baskets, incl. big)
        item_n = np.bincount(cs, minlength=len(items))
        big = lens > max_basket
        if big.any():
            logging.getLogger(__name__).warning(
                "association_rules: skipping pair expansion for %d "
                "basket(s) larger than max_basket=%d",
                int(big.sum()), max_basket)
            keep_rows = np.repeat(~big, lens)
            cs2 = cs[keep_rows]
            starts = np.flatnonzero(np.r_[
                True, bs[keep_rows][1:] != bs[keep_rows][:-1]]) \
                if keep_rows.any() else np.empty(0, np.int64)
            lens = np.diff(np.r_[starts, len(cs2)])
        else:
            cs2 = cs
        # vectorized within-basket unordered pair expansion
        if len(cs2):
            m = np.arange(len(cs2)) - np.repeat(starts, lens)
            cnt_i = lens[np.repeat(np.arange(len(lens)), lens)] - 1 - m
            total = int(cnt_i.sum())
        else:
            total = 0
        if total:
            i_row = np.repeat(np.arange(len(cs2)), cnt_i)
            j_off = np.arange(total) - np.repeat(
                np.r_[0, np.cumsum(cnt_i)[:-1]], cnt_i)
            pa_, pb_ = cs2[i_row], cs2[i_row + 1 + j_off]
            lo = np.minimum(pa_, pb_)
            hi = np.maximum(pa_, pb_)
            pair = lo.astype(np.int64) * len(items) + hi
            u, n = np.unique(pair, return_counts=True)
            pair_a = items[(u // len(items))]
            pair_b = items[(u % len(items))]
        else:
            pair_a = pair_b = np.empty(0, dtype=object)
            n = np.empty(0, dtype=np.int64)
        nz = item_n > 0
        return pa.table({
            "kind": pa.array(
                np.r_[np.ones(len(n), np.int8),
                      np.full(int(nz.sum()), 2, np.int8),
                      np.zeros(1, np.int8)]),
            "a": pa.array(
                list(pair_a) + list(items[nz]) + [""], pa.string()),
            "b": pa.array(
                list(pair_b) + [""] * int(nz.sum()) + [""], pa.string()),
            "n": pa.array(
                np.r_[n, item_n[nz], [n_baskets]].astype(np.int64)),
        })

    cols = [basket_col, item_col]
    partials = partition_map(ds.select_columns(cols), basket_col,
                             _partial)
    folded = pa.concat_tables(
        [b for b in partials.iter_batches(batch_size=None,
                                          batch_format="pyarrow")],
        promote_options="none") \
        .group_by(["kind", "a", "b"]).aggregate([("n", "sum")])

    kind = folded["kind"].to_numpy()
    n = folded["n_sum"].to_numpy().astype(np.int64)
    a = np.asarray(folded["a"].to_pylist(), dtype=object)
    b = np.asarray(folded["b"].to_pylist(), dtype=object)
    n_baskets = int(n[kind == 0].sum())
    item_count = dict(zip(a[kind == 2], n[kind == 2]))
    pm = kind == 1
    pa_i, pb_i, pn = a[pm], b[pm], n[pm]
    ok = pn >= min_joint
    pa_i, pb_i, pn = pa_i[ok], pb_i[ok], pn[ok]
    # directed rules: both orientations of every unordered pair
    ante = np.r_[pa_i, pb_i]
    cons = np.r_[pb_i, pa_i]
    nj = np.r_[pn, pn].astype(np.float64)
    na = np.array([item_count[x] for x in ante], dtype=np.float64)
    nc = np.array([item_count[x] for x in cons], dtype=np.float64)
    out = pa.table({
        "antecedent": pa.array(ante.tolist(), pa.string()),
        "consequent": pa.array(cons.tolist(), pa.string()),
        "n_joint": pa.array(nj.astype(np.int64)),
        "n_ante": pa.array(na.astype(np.int64)),
        "n_cons": pa.array(nc.astype(np.int64)),
        "support": pa.array(np.round(nj / n_baskets, round_to)),
        "confidence": pa.array(np.round(nj / na, round_to)),
        "lift": pa.array(np.round(nj * n_baskets / (na * nc),
                                  round_to)),
    })
    order = np.lexsort((cons, ante))
    return out.take(pa.array(order.tolist(), pa.int64()))
