"""CLI parity (reference tests/cli_tests/test_learn.py style):
end-to-end learn/classify runs + arg-validation errors."""

import os
import pickle

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from netml_ray.cli import main
from netml_ray.corpus import corpus_path


@pytest.fixture(scope="module")
def corpus_file():
    return corpus_path(6000, seed=7, cache_dir="/tmp/netml_ray_test_corpus")


def test_learn_unlabeled_end_to_end(ray_session, corpus_file, tmp_path, capsys):
    fo = str(tmp_path / "feat.parquet")
    mo = str(tmp_path / "model.pkl")
    rc = main(["learn", "--corpus", corpus_file, "--feature-type", "STATS",
               "--features-out", fo, "--model-out", mo])
    assert rc == 0
    t = pq.read_table(fo)
    assert t.num_rows > 20
    assert set(t.column_names) == {"url", "session_id", "features", "label"}
    with open(mo, "rb") as f:
        art = pickle.load(f)
    assert art["feature_type"] == "STATS" and hasattr(art["model"], "decision_function")
    out = capsys.readouterr().out
    assert "trained (unlabeled" in out


def test_learn_labeled_then_classify(ray_session, corpus_file, tmp_path, capsys):
    # build a label CSV over the corpus urls
    urls = pq.read_table(corpus_file, columns=["url"])["url"].to_pylist()
    uniq = sorted(set(urls))
    labels = pd.DataFrame({
        "url": uniq,
        "label_raw": ["BENIGN" if i % 4 else "BOT" for i in range(len(uniq))],
    })
    lp = str(tmp_path / "labels.csv")
    labels.to_csv(lp, index=False)
    mo = str(tmp_path / "model.pkl")
    rc = main(["learn", "--corpus", corpus_file, "--labels", lp,
               "--feature-type", "STATS", "--algorithm", "PCA",
               "--params", '{"n_components": 3}', "--model-out", mo])
    assert rc == 0
    assert "train AUC:" in capsys.readouterr().out

    so = str(tmp_path / "scores.parquet")
    rc = main(["classify", "--corpus", corpus_file, "--model", mo, "--out", so])
    assert rc == 0
    sdf = pd.read_parquet(so)
    assert len(sdf) > 20 and {"url", "session_id", "score"} <= set(sdf.columns)


def test_cli_arg_validation(ray_session, corpus_file):
    with pytest.raises(SystemExit):  # missing required --corpus
        main(["learn"])
    with pytest.raises(SystemExit):  # bad hyperparameter name
        main(["learn", "--corpus", corpus_file, "--feature-type", "STATS",
              "--params", '{"nope": 1}'])


def test_cli_curate(ray_session, tmp_path):
    from netml_ray.cli import main
    from netml_ray.corpus import documents_path

    corpus = documents_path(5000, seed=13)
    out = str(tmp_path / "kept")
    rc = main(["curate", "--corpus", corpus, "--out", out])
    assert rc == 0
    import glob

    import pyarrow.parquet as pq

    n = sum(pq.read_metadata(f).num_rows for f in glob.glob(f"{out}/*.parquet"))
    assert 1000 < n < 4000  # ~45% kept

    # resumable variant produces the identical keep-set
    out2 = str(tmp_path / "kept2")
    rc = main(["curate", "--corpus", corpus, "--out", out2,
               "--resume-dir", str(tmp_path / "ckpt")])
    assert rc == 0
    import pandas as pd

    a = pd.concat([pq.read_table(f).to_pandas()
                   for f in glob.glob(f"{out}/*.parquet")]).sort_values(
        "doc_id").reset_index(drop=True)
    b = pd.concat([pq.read_table(f).to_pandas()
                   for f in glob.glob(f"{out2}/*.parquet")]).sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_cli_index_and_search(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from netml_ray.cli import main

    corpus = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["red fox jumps", "red dog", "blue fox"])}),
        corpus)
    idx_dir = str(tmp_path / "idx")
    assert main(["index", "--corpus", str(corpus),
                 "--index", idx_dir, "--num-shards", "2"]) == 0
    capsys.readouterr()
    assert main(["search", "--index", idx_dir,
                 "--terms", "red,fox", "--mode", "and"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["1"]
    assert main(["search", "--index", idx_dir,
                 "--terms", "red,fox", "--mode", "or"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["1", "2", "3"]


def test_cli_curate_scorer_flags(ray_session, tmp_path):
    """--max-lm-bits / --max-dup-span-frac reach curate_corpus and
    actually drop docs; they are rejected with --resume-dir."""
    import sys

    import pyarrow.parquet as pq
    import pytest

    from netml_ray.cli import main
    from netml_ray.corpus import documents_path

    corpus = documents_path(3000, seed=7)
    out = str(tmp_path / "kept")
    rc = main(["curate", "--corpus", corpus, "--out", out,
               "--max-dup-2gram", "1.0", "--max-top-2gram", "1.0",
               "--max-dup-span-frac", "0.5"])
    assert rc == 0
    import glob
    n_flag = sum(pq.read_metadata(f).num_rows
                 for f in glob.glob(f"{out}/*.parquet"))
    out2 = str(tmp_path / "kept_noflag")
    assert main(["curate", "--corpus", corpus, "--out", out2,
                 "--max-dup-2gram", "1.0", "--max-top-2gram", "1.0"]) == 0
    n_noflag = sum(pq.read_metadata(f).num_rows
                   for f in glob.glob(f"{out2}/*.parquet"))
    assert 0 < n_flag <= n_noflag
    with pytest.raises(SystemExit):
        main(["curate", "--corpus", corpus, "--out", str(tmp_path / "x"),
              "--resume-dir", str(tmp_path / "ckpt"),
              "--max-lm-bits", "5.0"])


def test_cli_stats(ray_session, tmp_path):
    """stats subcommand writes one parquet per requested keyed stat
    and the values match the library ops."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from netml_ray.cli import main

    rng = np.random.default_rng(7)
    n = 800
    t = pa.table({
        "k": pa.array(rng.integers(0, 12, n)),
        "c": pa.array(rng.choice(list("xyz"), n)),
        "v": pa.array(rng.normal(3, 1, n)),
        "o": pa.array(np.arange(n, dtype=np.int64)),
    })
    src = tmp_path / "in.parquet"
    pq.write_table(t, src)
    out = tmp_path / "stats"
    rc = main(["stats", "--corpus", str(src), "--out", str(out),
               "--key", "k", "--stats", "entropy,mode,moments,autocorr",
               "--cat", "c", "--value", "v",
               "--order-by", "o", "--tiebreak", "o"])
    assert rc == 0
    ent = pq.read_table(out / "entropy.parquet")
    assert ent.num_rows == 12 and "entropy" in ent.column_names
    mom = pq.read_table(out / "moments.parquet").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("SELECT k, round(avg(v), 9) AS m FROM t "
                  "GROUP BY k ORDER BY k").df()
    got = mom.sort_values("k")["mean_v"].to_numpy()
    np.testing.assert_allclose(got, exp["m"].to_numpy(), atol=2e-9)
    ac = pq.read_table(out / "autocorr.parquet")
    assert ac.num_rows == 12
    mo = pq.read_table(out / "mode.parquet")
    assert set(mo["mode_c"].to_pylist()) <= {"x", "y", "z"}
