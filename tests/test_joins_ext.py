"""Co-partitioned hash join + range (interval) join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray.joins import hash_join, range_join


def _mk(ds_dict):
    import ray.data as rd

    # from_arrow (not from_pandas): partition_map2 needs an Arrow schema
    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(ds_dict),
                                              preserve_index=False))


def test_hash_join_matches_pandas(ray_session):
    rng = np.random.default_rng(0)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500),
                         "x": rng.normal(size=500)})
    right = pd.DataFrame({"k": rng.integers(0, 60, 80),
                          "y": rng.normal(size=80)})
    for how in ("inner", "left"):
        got = hash_join(_mk(left), _mk(right), "k", how=how,
                        num_partitions=8).to_pandas()
        exp = left.merge(right, on="k", how=how)
        key = ["k", "x", "y"]
        g = got.sort_values(key).reset_index(drop=True)[key]
        e = exp.sort_values(key).reset_index(drop=True)[key]
        pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_hash_join_rejects_unknown_how(ray_session):
    with pytest.raises(ValueError):
        hash_join(_mk({"k": [1]}), _mk({"k": [1]}), "k", how="outer")


def test_range_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(1)
    left = pd.DataFrame({"k": rng.integers(0, 10, 200),
                         "lid": np.arange(200),
                         "t": rng.uniform(0, 1000, 200)})
    right = pd.DataFrame({"k": rng.integers(0, 12, 300),
                          "rid": np.arange(300),
                          "rt": rng.uniform(0, 1000, 300)})
    lo, hi = -50.0, 25.0
    got = range_join(_mk(left), _mk(right), "k", left_ts="t", right_ts="rt",
                     lo=lo, hi=hi, num_partitions=8).to_pandas()
    # brute force
    exp_rows = []
    for _, lrow in left.iterrows():
        m = right[(right["k"] == lrow["k"])
                  & (right["rt"] >= lrow["t"] + lo)
                  & (right["rt"] <= lrow["t"] + hi)]
        for _, rrow in m.iterrows():
            exp_rows.append((lrow["k"], lrow["lid"], rrow["rid"]))
    exp = pd.DataFrame(exp_rows, columns=["k", "lid", "rid"])
    key = ["k", "lid", "rid"]
    g = got.sort_values(key).reset_index(drop=True)[key]
    e = exp.sort_values(key).reset_index(drop=True)[key]
    assert len(g) == len(e) and len(g) > 0
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_hash_join_list_payload_and_left_dtypes(ray_session):
    """Arrow-native merge: list columns pass through and unmatched left
    rows keep the right side's int64 type (typed NULLs, no float64
    upcast — ADVICE r2)."""
    left = pa.table({"k": pa.array([1, 2, 3, 4], type=pa.int64()),
                     "v": pa.array([[1.0, 2.0], [3.0], [], [4.0, 5.0]],
                                   type=pa.list_(pa.float64()))})
    right = pa.table({"k": pa.array([1, 3], type=pa.int64()),
                      "y": pa.array([10, 30], type=pa.int64()),
                      "w": pa.array([["a"], ["b", "c"]],
                                    type=pa.list_(pa.string()))})
    import ray.data as rd

    got = hash_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                    how="left", num_partitions=4)
    t = pa.concat_tables(
        got.iter_batches(batch_format="pyarrow")).sort_by("k")
    assert t["k"].to_pylist() == [1, 2, 3, 4]
    # schema is uniform across partitions: int64 preserved, nulls where unmatched
    assert t.schema.field("y").type == pa.int64()
    assert t.schema.field("w").type == pa.list_(pa.string())
    assert t["y"].to_pylist() == [10, None, 30, None]
    assert t["v"].to_pylist() == [[1.0, 2.0], [3.0], [], [4.0, 5.0]]
    assert t["w"].to_pylist() == [["a"], None, ["b", "c"], None]


def test_hash_join_null_keys_never_match(ray_session):
    """SQL semantics: NULL keys join nothing (inner drops them, left
    emits them with null right columns)."""
    left = pa.table({"k": pa.array([1, None, 2], type=pa.int64()),
                     "x": pa.array([10, 20, 30], type=pa.int64())})
    right = pa.table({"k": pa.array([1, None], type=pa.int64()),
                      "y": pa.array([100, 200], type=pa.int64())})
    import ray.data as rd

    inner = hash_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                      how="inner", num_partitions=4).to_pandas()
    assert list(inner.sort_values("k")["y"]) == [100]
    lj = hash_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                   how="left", num_partitions=4).to_pandas()
    assert len(lj) == 3
    assert lj["y"].notna().sum() == 1


def test_hash_join_full_outer_matches_pandas(ray_session):
    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 40, 300),
                         "x": rng.normal(size=300)})
    right = pd.DataFrame({"k": rng.integers(20, 70, 120),
                          "y": rng.normal(size=120)})
    got = hash_join(_mk(left), _mk(right), "k", how="full",
                    num_partitions=8).to_pandas()
    exp = left.merge(right, on="k", how="outer")
    key = ["k", "x", "y"]
    g = got.sort_values(key).reset_index(drop=True)[key]
    e = exp.sort_values(key).reset_index(drop=True)[key]
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    # both sides must contribute unmatched rows
    assert got["x"].isna().any() and got["y"].isna().any()
    # key column is coalesced: never null for int keys
    assert got["k"].notna().all()


def test_weighted_sample_matches_per_key_rates(ray_session):
    from netml_ray.curation import hash_sample_batch, weighted_sample_batch

    t = pa.table({
        "doc_id": pa.array(np.arange(4000), type=pa.int64()),
        "source": pa.array((["a", "b", "c", "d"] * 1000)),
    })
    w = {"a": 100, "b": 50, "c": 0}
    out = weighted_sample_batch(t, weights=w, default_pct=25)
    df = out.to_pandas()
    counts = df["source"].value_counts().to_dict()
    assert counts.get("a") == 1000           # 100% kept
    assert counts.get("c", 0) == 0           # 0% kept
    assert 350 < counts.get("b", 0) < 650    # ~50%
    assert 150 < counts.get("d", 0) < 350    # default 25%
    # consistent with the single-rate sampler on a uniform weight map
    uni = weighted_sample_batch(t, weights={}, default_pct=25)
    flat = hash_sample_batch(t, pct=25)
    assert uni["doc_id"].to_pylist() == flat["doc_id"].to_pylist()


def test_semi_anti_join(ray_session):
    """EXISTS/NOT EXISTS vs pandas brute force, incl. NULL keys (never
    match: dropped by semi, kept by anti) and duplicate right keys
    (no row multiplication)."""
    import ray.data as rd

    from netml_ray.joins import anti_join, semi_join

    left = pa.table({
        "k": pa.array([1, 2, 3, None, 5, 2], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 60], type=pa.int64())})
    right = pa.table({
        "k": pa.array([2, 2, 4, None], type=pa.int64()),
        "w": pa.array([1.0, 2.0, 3.0, 4.0])})
    r_keys = pa.table({"k": right["k"]})

    semi = (semi_join(rd.from_arrow(left), rd.from_arrow(r_keys), "k",
                      num_partitions=4).to_pandas()
            .sort_values("v").reset_index(drop=True))
    assert list(semi["v"]) == [20, 60]          # k=2 rows, no dup blowup
    anti = (anti_join(rd.from_arrow(left), rd.from_arrow(r_keys), "k",
                      num_partitions=4).to_pandas()
            .sort_values("v").reset_index(drop=True))
    assert list(anti["v"]) == [10, 30, 40, 50]  # NULL key kept by anti


def test_rank_features(ray_session):
    import duckdb
    import ray.data as rd

    from netml_ray.windows import add_rank_features

    rng = np.random.default_rng(17)
    n = 3000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 61, n)),
        "ts": pa.array(np.sort(rng.uniform(0, 1000, n))),
        "event_id": pa.array(np.arange(n, dtype=np.int64))})
    got = (add_rank_features(rd.from_arrow(t), "user_id", "ts", ntile=4,
                             tiebreak="event_id", num_partitions=6)
           .to_pandas()[["event_id", "row_num", "pct_rank", "tile"]]
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("ev", t)
    exp = con.execute("""
        SELECT event_id, row_number() OVER w AS row_num,
               percent_rank() OVER w AS pct_rank,
               CAST(ntile(4) OVER w AS BIGINT) AS tile
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_join_tolerance(ray_session):
    """tolerance (merge_asof parity): matches further back than the
    window are nulled; within-window matches unchanged; negative
    tolerance rejected."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from netml_ray.asof import asof_join

    left = pa.table({
        "k": pa.array([1, 1, 1, 2], type=pa.int64()),
        "lts": pa.array([10.0, 25.0, 100.0, 5.0]),
        "lid": pa.array([0, 1, 2, 3], type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "rts": pa.array([8.0, 20.0, 50.0]),
        "v": pa.array([1.0, 2.0, 3.0]),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    key="k", left_ts="lts", right_ts="rts",
                    left_tiebreak="lid", tolerance=10.0).to_pandas()
    out = out.sort_values("lid").reset_index(drop=True)
    # lid0: rts 8 within 2 → 1.0; lid1: rts 20 within 5 → 2.0;
    # lid2: rts 20 but 80 back → null; lid3: no prior → null
    np.testing.assert_array_equal(
        out["v"].to_numpy(), np.array([1.0, 2.0, np.nan, np.nan]))
    assert out["rts"].isna().tolist() == [False, False, True, True]
    with pytest.raises(ValueError):
        asof_join(rd.from_arrow(left), rd.from_arrow(right), key="k",
                  left_ts="lts", right_ts="rts", tolerance=-1.0)


def test_target_encode_matches_formula(ray_session):
    """Smoothed mean encoding equals the closed-form computed from
    pandas, and unseen categories at transform time get the global
    mean (m-blend degenerate case)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.mlprep import target_encode

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "i": np.arange(4000, dtype=np.int64),
        "cat": rng.choice(list("abcde"), 4000),
        "y": rng.normal(size=4000).round(3),
    })
    out = target_encode(rd.from_arrow(pa.Table.from_pandas(df)),
                        "cat", "y", m=10.0).to_pandas()
    out = out.sort_values("i").reset_index(drop=True)
    g = df.groupby("cat")["y"].agg(["sum", "count"])
    gm = df["y"].sum() / len(df)
    enc = ((g["sum"] + 10 * gm) / (g["count"] + 10)).round(9)
    exp = df["cat"].map(enc).to_numpy()
    np.testing.assert_allclose(out["cat_te"].to_numpy(), exp,
                               rtol=0, atol=1e-9)


def test_interval_overlap_join_vs_brute(ray_session):
    """Overlap join == the O(n²) nested-loop reference for random
    intervals (including zero-length and long-lived stale intervals
    that exercise the running-max-end low cut), any partitioning."""
    import ray.data as rd

    from netml_ray.joins import interval_overlap_join

    rng = np.random.default_rng(41)
    nl, nr, nkeys = 900, 800, 25
    lt = pa.table({
        "k": pa.array(rng.integers(0, nkeys, nl)),
        "a_id": pa.array(np.arange(nl, dtype=np.int64)),
        "s": pa.array(rng.integers(0, 10_000, nl)),
    })
    dur = rng.integers(0, 400, nl)
    lt = lt.append_column("e", pa.array(lt["s"].to_numpy() + dur))
    rt = pa.table({
        "k": pa.array(rng.integers(0, nkeys, nr)),
        "b_id": pa.array(np.arange(nr, dtype=np.int64)),
        "s": pa.array(rng.integers(0, 10_000, nr)),
    })
    # mix of short intervals and a few VERY long ones (stale-interval
    # case: early start, late end — the low cut must not drop them)
    rdur = np.where(rng.random(nr) < 0.05,
                    rng.integers(5_000, 9_000, nr),
                    rng.integers(0, 300, nr))
    rt = rt.append_column("e", pa.array(rt["s"].to_numpy() + rdur))

    ldf, rdf = lt.to_pandas(), rt.to_pandas()
    m = ldf.merge(rdf, on="k", suffixes=("", "_r"))
    m = m[(m["s_r"] <= m["e"]) & (m["e_r"] >= m["s"])]
    exp = set(zip(m["a_id"], m["b_id"]))
    assert len(exp) > 100           # fixture actually overlaps
    for parts in (1, 7):
        got = interval_overlap_join(
            rd.from_arrow(lt).repartition(parts),
            rd.from_arrow(rt).repartition(max(1, parts - 2)), "k",
            left_start="s", left_end="e",
            right_start="s", right_end="e").to_pandas()
        assert set(zip(got["a_id"], got["b_id"])) == exp
        assert len(got) == len(exp)


def test_asof_directions_vs_pandas(ray_session):
    """forward / nearest as-of == pandas merge_asof (per key, with
    and without tolerance); nearest exact tie -> backward."""
    import ray.data as rd

    from netml_ray.asof import asof_join

    rng = np.random.default_rng(13)
    nl, nr = 1200, 700
    left = pa.table({
        "k": pa.array(rng.integers(0, 20, nl)),
        "t": pa.array(np.sort(rng.integers(0, 10_000, nl))
                      .astype(np.int64)),
        "lid": pa.array(np.arange(nl, dtype=np.int64)),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 20, nr)),
        "t": pa.array(np.sort(rng.choice(10_000, size=nr,
                                         replace=False)).astype(np.int64)),
        "val": pa.array(rng.uniform(0, 1, nr).round(6)),
    })
    # drop duplicate (k, t) on the right for deterministic matches
    rdf = (right.to_pandas().drop_duplicates(["k", "t"])
           .sort_values("t").reset_index(drop=True))
    ldf = left.to_pandas().sort_values("t").reset_index(drop=True)
    rt = pa.Table.from_pandas(rdf, preserve_index=False)

    for direction, tol in (("forward", None), ("forward", 800),
                           ("nearest", None), ("nearest", 500),
                           ("backward", 300)):
        exp = pd.merge_asof(ldf, rdf.rename(columns={"t": "rt"}),
                            left_on="t", right_on="rt", by="k",
                            direction=direction,
                            tolerance=tol)
        got = (asof_join(rd.from_arrow(left).repartition(5),
                         rd.from_arrow(rt).repartition(3),
                         key="k", left_ts="t", right_ts="t",
                         left_tiebreak="lid", direction=direction,
                         tolerance=tol, suffix="_r")
               .to_pandas().sort_values("lid")
               .reset_index(drop=True))
        exps = exp.sort_values("lid").reset_index(drop=True)
        lhs = got["val"].to_numpy()
        rhs = exps["val"].to_numpy()
        both_nan = np.isnan(lhs) & np.isnan(rhs)
        assert (both_nan | (lhs == rhs)).all(), direction
    # exact tie -> backward: left at t=100, right at 50 and 150 won't
    # tie; craft 90/110
    lt = pa.table({"k": pa.array([1]), "t": pa.array([100],
                                                     type=pa.int64()),
                   "lid": pa.array([0], type=pa.int64())})
    rtt = pa.table({"k": pa.array([1, 1]),
                    "t": pa.array([90, 110], type=pa.int64()),
                    "val": pa.array([1.0, 2.0])})
    got = asof_join(rd.from_arrow(lt), rd.from_arrow(rtt), key="k",
                    left_ts="t", right_ts="t", left_tiebreak="lid",
                    direction="nearest").to_pandas()
    assert got["val"].tolist() == [1.0]     # 10 vs 10 -> backward
