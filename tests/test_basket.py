"""association_rules vs a pandas brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _brute(df, min_joint=1):
    m = df.drop_duplicates(["basket", "item"])
    n_baskets = m["basket"].nunique()
    ones = m.groupby("item")["basket"].nunique()
    rows = []
    items = sorted(ones.index)
    sets = {i: set(m.loc[m["item"] == i, "basket"]) for i in items}
    for a in items:
        for b in items:
            if a == b:
                continue
            nj = len(sets[a] & sets[b])
            if nj < min_joint or nj == 0:
                continue
            rows.append((a, b, nj, ones[a], ones[b],
                         nj / n_baskets, nj / ones[a],
                         nj * n_baskets / (ones[a] * ones[b])))
    return pd.DataFrame(rows, columns=[
        "antecedent", "consequent", "n_joint", "n_ante", "n_cons",
        "support", "confidence", "lift"]).sort_values(
        ["antecedent", "consequent"]).reset_index(drop=True)


def test_association_rules_vs_brute(ray_session):
    import ray.data as rd

    from netml_ray.basket import association_rules

    rng = np.random.default_rng(21)
    n = 8000
    t = pa.table({
        "basket": pa.array(rng.integers(0, 300, n)),
        "item": pa.array(rng.choice(
            ["view", "click", "cart", "buy", "share", "rare1", "rare2"],
            n, p=[0.3, 0.25, 0.15, 0.1, 0.1, 0.05, 0.05])),
    })
    out = association_rules(rd.from_arrow(t).repartition(8),
                            "basket", "item").to_pandas()
    exp = _brute(t.to_pandas())
    out = out.sort_values(["antecedent", "consequent"]) \
        .reset_index(drop=True)
    assert len(out) == len(exp)
    assert (out["antecedent"] == exp["antecedent"]).all()
    assert (out["consequent"] == exp["consequent"]).all()
    for c in ["n_joint", "n_ante", "n_cons"]:
        assert (out[c] == exp[c]).all()
    for c in ["support", "confidence", "lift"]:
        assert np.allclose(out[c], exp[c], atol=2e-9)


def test_association_rules_semantics(ray_session):
    """Hand-built baskets: distinct-membership counting, lift
    direction, min_joint filter."""
    import ray.data as rd

    from netml_ray.basket import association_rules

    t = pa.table({
        # basket 1: a,a,b  basket 2: a,b  basket 3: a  basket 4: c,b
        "basket": pa.array([1, 1, 1, 2, 2, 3, 4, 4]),
        "item": pa.array(["a", "a", "b", "a", "b", "a", "c", "b"]),
    })
    out = association_rules(rd.from_arrow(t), "basket", "item") \
        .to_pandas().set_index(["antecedent", "consequent"])
    # n_a=3, n_b=3, n_ab=2 (dup membership counted once), N=4
    assert out.loc[("a", "b"), "n_joint"] == 2
    assert np.isclose(out.loc[("a", "b"), "support"], 0.5)
    assert np.isclose(out.loc[("a", "b"), "confidence"], 2 / 3)
    assert np.isclose(out.loc[("a", "b"), "lift"], 2 * 4 / 9)
    # b->a confidence differs from a->b only via the antecedent count
    assert np.isclose(out.loc[("b", "a"), "confidence"], 2 / 3)
    # c co-occurs only with b, once
    assert out.loc[("c", "b"), "n_joint"] == 1
    assert np.isclose(out.loc[("c", "b"), "confidence"], 1.0)
    assert ("c", "a") not in out.index
    # min_joint prunes the c-b pair
    out2 = association_rules(rd.from_arrow(t), "basket", "item",
                             min_joint=2).to_pandas()
    assert set(zip(out2["antecedent"], out2["consequent"])) == {
        ("a", "b"), ("b", "a")}


def test_association_rules_max_basket_guard(ray_session):
    """A basket over the cap is skipped for pairs but still counts in
    N and the per-item counts."""
    import ray.data as rd

    from netml_ray.basket import association_rules

    rows_b = [(1, x) for x in ["a", "b", "c", "d", "e"]]  # big basket
    rows_s = [(2, "a"), (2, "b"), (3, "a")]
    t = pa.table({
        "basket": pa.array([r[0] for r in rows_b + rows_s]),
        "item": pa.array([r[1] for r in rows_b + rows_s]),
    })
    out = association_rules(rd.from_arrow(t), "basket", "item",
                            max_basket=4).to_pandas() \
        .set_index(["antecedent", "consequent"])
    # only basket 2 contributes pairs; N=3, n_a=3 (all baskets), n_b=2
    assert out.loc[("a", "b"), "n_joint"] == 1
    assert out.loc[("a", "b"), "n_ante"] == 3
    assert out.loc[("a", "b"), "n_cons"] == 2
    assert np.isclose(out.loc[("a", "b"), "support"], 1 / 3)
