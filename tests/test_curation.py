"""Curation ops: PII redaction on planted PII, repetition vs a
brute-force reference, per-key caps, deterministic sampling, and
benchmark decontamination with planted contamination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray.curation import (
    collect_benchmark_gram_hashes,
    collect_snippets,
    decontaminate_ngrams,
    decontaminate_substring,
    hash_sample_batch,
    limit_per_key,
    normalize_batch,
    pii_scan_batch,
    repetition_batch,
)


def test_normalize_batch():
    t = pa.table({"text": ["  A\t\tB  c ", "", "x", " \n "]})
    out = normalize_batch(t)["text_norm"].to_pylist()
    assert out == ["a b c", "", "x", ""]


def test_pii_redaction_planted():
    t = pa.table({"text": [
        "email me: jane.doe+spam@sub.example.co.uk thanks",
        "server at 192.168.001.1 then call +44 20 7946 0958",
        "ssn is 123-45-6789; backup 987-65-4321",
        "no pii here at all",
    ]})
    out = pii_scan_batch(t)
    assert out["n_email"].to_pylist() == [1, 0, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 1, 0, 0]
    assert out["n_ssn"].to_pylist() == [0, 0, 2, 0]
    red = out["text_redacted"].to_pylist()
    assert red[0] == "email me: <EMAIL> thanks"
    assert "<IP>" in red[1] and "<PHONE>" in red[1]
    assert red[2] == "ssn is <SSN>; backup <SSN>"
    assert red[3] == "no pii here at all"


def _brute_repetition(text: str, n: int = 2):
    words = text.strip().split()
    grams = [tuple(words[i:i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return 0, 0.0, 0.0
    total = len(grams)
    from collections import Counter

    c = Counter(grams)
    return total, 1.0 - len(c) / total, max(c.values()) / total


def test_repetition_vs_bruteforce():
    rng = np.random.default_rng(7)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    texts = [" ".join(rng.choice(vocab, size=k)) for k in
             rng.integers(0, 30, size=200)] + ["", "solo", "x y x y x y"]
    t = pa.table({"text": texts})
    out = repetition_batch(t, round_to=None)
    for i, s in enumerate(texts):
        tg, dup, top = _brute_repetition(s)
        assert out["n_2grams"][i].as_py() == tg
        assert out["dup_2gram_frac"][i].as_py() == pytest.approx(dup)
        assert out["top_2gram_frac"][i].as_py() == pytest.approx(top)


def test_hash_sample_deterministic_and_partition_invariant():
    ids = np.arange(1000, dtype=np.int64)
    t = pa.table({"doc_id": ids})
    a = hash_sample_batch(t, pct=10)["doc_id"].to_pylist()
    # per-batch application over any split yields the same set
    b = (hash_sample_batch(t.slice(0, 300), pct=10)["doc_id"].to_pylist()
         + hash_sample_batch(t.slice(300), pct=10)["doc_id"].to_pylist())
    assert a == b
    assert 50 < len(a) < 200  # ~10%


def test_limit_per_key(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "k": rng.choice([f"s{i}" for i in range(40)], size=n),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.normal(size=n),
    })
    ds = rd.from_pandas(df).map_batches(lambda t: t, batch_format="pyarrow")
    got = limit_per_key(ds, "k", 7, order_by=["id"]).to_pandas()
    exp = df.sort_values(["k", "id"]).groupby("k").head(7)
    got = got.sort_values(["k", "id"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "id", "v"]], exp[["k", "id", "v"]])


def test_decontaminate_planted(ray_session):
    import ray.data as rd

    bench_text = " ".join(f"w{i}" for i in range(40))  # doc_id 0 → benchmark
    copier = "intro words " + bench_text + " trailing"  # contains 13-grams AND substring
    clean = " ".join(f"z{i}" for i in range(40))
    texts = [bench_text, copier, clean, "short"]
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "text": texts})
    ds = rd.from_arrow(t)

    snips = collect_snippets(ds, every=97)  # only doc 0 qualifies
    assert len(snips) == 1 and snips[0] == bench_text[7:39]
    got = decontaminate_substring(ds, snips).to_pandas().sort_values("doc_id")
    assert got["contaminated"].tolist() == [True, True, False, False]

    bench = collect_benchmark_gram_hashes(ds, every=97, n=13)
    assert len(bench) == 40 - 12
    got = decontaminate_ngrams(ds, bench, n=13).to_pandas().sort_values("doc_id")
    assert got["contaminated_13g"].tolist() == [True, True, False, False]


def test_curate_corpus_planted(ray_session):
    """Each curation stage proves itself on a planted document."""
    import ray.data as rd

    from netml_ray.curation import curate_corpus

    good = ("the quick brown fox jumps over the lazy dog and runs far "
            "with many other friendly animals that have fun today")
    # ids 10..15: none ≡ 0 (mod 97), so the benchmark side is empty
    texts = {
        10: good,                                   # survives
        11: good + "  ",                            # exact dup after normalize → dropped (min id wins)
        12: "the be to of and " + "spam ham " * 40,  # repetitive → dropped
        13: good.replace("fox", "renard"),          # survives (distinct)
        14: "kurz",                                 # too few words → dropped
        15: "I sent mail to a@b.com today " + good,  # survives, PII-redacted
    }
    t = pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": [texts[k] for k in sorted(texts)],
        "lang": ["en", "en", "en", "en", "en", "en"],
        "source": ["s"] * 6,
    })
    out = curate_corpus(rd.from_arrow(t), max_dup_2gram=0.5,
                        max_top_2gram=0.5).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [10, 13, 15]
    # PII redacted before digesting: doc 15's digest differs from its
    # normalized-but-unredacted text
    import hashlib

    clean15 = out.loc[out.doc_id == 15, "clean_md5"].iloc[0]
    norm15 = "i sent mail to a@b.com today " + good
    assert clean15 != hashlib.md5(norm15.encode()).hexdigest()
    assert clean15 == hashlib.md5(
        ("i sent mail to <EMAIL> today " + good).encode()).hexdigest()
    assert (out["n_tokens"] > 10).all()


def test_decontaminate_ngram_no_false_positive_on_shared_words(ray_session):
    import ray.data as rd

    # shares 12-word (but not 13-word) runs with the benchmark doc
    bench_text = " ".join(f"w{i}" for i in range(26))
    partial = " ".join(f"w{i}" for i in range(12)) + " DIFFERENT " + \
        " ".join(f"w{i}" for i in range(14, 26))
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": [bench_text, partial]})
    ds = rd.from_arrow(t)
    bench = collect_benchmark_gram_hashes(ds, every=97, n=13)
    got = decontaminate_ngrams(ds, bench, n=13).to_pandas().sort_values("doc_id")
    assert got["contaminated_13g"].tolist() == [True, False]


def test_chunk_batch_matches_bruteforce():
    from netml_ray.curation import chunk_batch

    rng = np.random.default_rng(11)
    texts = [" ".join(f"t{rng.integers(0, 50)}" for _ in range(k))
             for k in rng.integers(0, 300, size=100)] + ["", "  ", "solo"]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
                  "text": texts})
    out = chunk_batch(t, size=64, overlap=16).to_pandas()

    def ref(words, size=64, overlap=16):
        step = size - overlap
        n = len(words)
        if n == 0:
            return []
        k = max(1, -(-(n - overlap) // step))
        return [" ".join(words[i * step:min(i * step + size, n)])
                for i in range(k)]

    exp = [(i, k, c) for i, s in enumerate(texts)
           for k, c in enumerate(ref(s.split()))]
    got = list(zip(out.doc_id, out.chunk_id, out.chunk_text))
    assert got == exp
    assert (out.chunk_words == out.chunk_text.str.split().str.len()).all()


def test_chunk_batch_rejects_bad_overlap():
    from netml_ray.curation import chunk_batch

    with pytest.raises(ValueError):
        chunk_batch(pa.table({"doc_id": [1], "text": ["x"]}),
                    size=10, overlap=10)


def test_pack_sequences_next_fit(ray_session):
    import ray.data as rd

    from netml_ray.curation import pack_sequences

    rng = np.random.default_rng(21)
    n = 2000
    toks = rng.integers(1, 300, size=n).astype(np.int64)
    toks[::97] = 900  # oversized docs (> budget) get their own bin
    t = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                  "n_tokens": pa.array(toks)})
    budget = 512
    out = pack_sequences(rd.from_arrow(t), budget=budget,
                         num_partitions=8).to_pandas()
    assert len(out) == n and out["doc_id"].is_unique
    # bin token totals are consistent and within budget unless singleton
    g = out.groupby("bin_id").agg(total=("n_tokens", "sum"),
                                  count=("n_tokens", "count"),
                                  rep=("bin_tokens", "first"))
    assert (g.total == g.rep).all()
    over = g[g.total > budget]
    assert (over["count"] == 1).all()
    # single-partition run equals the pure-python next-fit reference
    out1 = pack_sequences(rd.from_arrow(t), budget=budget,
                          num_partitions=1).to_pandas().sort_values("doc_id")
    bins_ref, cur, tot = [], 0, 0
    for x in toks:
        if tot + x > budget and tot > 0:
            cur += 1
            tot = 0
        bins_ref.append(cur)
        tot += x
    assert out1["bin_id"].tolist() == bins_ref


def test_curate_checkpointed_resume(ray_session, tmp_path):
    import glob
    import shutil

    import ray.data as rd

    from netml_ray.corpus import gen_documents
    from netml_ray.curation import curate_corpus, curate_corpus_checkpointed

    t = gen_documents(3000, seed=5)

    def _sorted(df):
        return df.sort_values("doc_id").reset_index(drop=True)

    plain = _sorted(curate_corpus(rd.from_arrow(t)).to_pandas())
    out = str(tmp_path / "curate_ckpt")
    got = _sorted(curate_corpus_checkpointed(rd.from_arrow(t), out).to_pandas())
    pd.testing.assert_frame_equal(got, plain)

    # kill-and-resume: delete a few phase-A partitions, rerun → identical
    parts = sorted(glob.glob(f"{out}/phaseA/part=*"))
    assert len(parts) >= 8
    for p in parts[::5]:
        shutil.rmtree(p)
    got2 = _sorted(
        curate_corpus_checkpointed(rd.from_arrow(t), out).to_pandas())
    pd.testing.assert_frame_equal(got2, plain)

    # changed params cannot silently mix with checkpointed partitions
    with pytest.raises(Exception):
        curate_corpus_checkpointed(rd.from_arrow(t), out, lang="de")


def test_langid_batch_equals_rowwise():
    from netml_ray.textops import LangId

    li = LangId()
    texts = ["", "一", "x 一", "der the le el", "the der", "à÷ÿ",
             "don't und nicht der die das", "一" * 300, " ", "THE AND",
             "le chat et le chien", "el perro y la gata es una vida",
             "x" * 1500 + " und der die das"]
    t = pa.table({"text": texts})
    got = li(t)["pred_lang"].to_pylist()
    assert got == [li._one(s) for s in texts]


def test_groupby_quantiles_vs_numpy(ray_session):
    import ray.data as rd

    from netml_ray.windows import groupby_quantiles

    rng = np.random.default_rng(9)
    n = 8000
    df = pd.DataFrame({"k": rng.choice(list("abcdefgh"), size=n),
                       "v": rng.normal(size=n)})
    got = groupby_quantiles(rd.from_pandas(df), "k", "v", [0.1, 0.5, 0.99],
                            round_to=None, num_partitions=6).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    for q, col in [(0.1, "q01_v"), (0.5, "q05_v"), (0.99, "q099_v")]:
        exp = df.groupby("k")["v"].apply(lambda s: np.quantile(s, q))
        np.testing.assert_allclose(got[col].to_numpy(),
                                   exp.sort_index().to_numpy(), rtol=1e-12)
    # singleton groups: quantile == the single value
    one = pd.DataFrame({"k": ["z"], "v": [3.25]})
    g1 = groupby_quantiles(rd.from_pandas(one), "k", "v", [0.5],
                           round_to=None).to_pandas()
    assert g1["q05_v"].iloc[0] == 3.25


def test_curation_ops_empty_batch_robust():
    """Every curation batch op handles a zero-row batch (mid-stream
    empty blocks are a fact of Ray plans) with stable schemas."""
    from netml_ray.curation import (_ngram_mark, chunk_batch,
                                    hash_sample_batch, normalize_batch,
                                    pii_scan_batch, repetition_batch)
    from netml_ray.textops import Tokenized, gopher_quality_batch

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    assert normalize_batch(t).num_rows == 0
    assert pii_scan_batch(t).num_rows == 0
    assert repetition_batch(t).num_rows == 0
    assert gopher_quality_batch(t).num_rows == 0
    assert hash_sample_batch(t).num_rows == 0
    out = chunk_batch(t)
    assert out.num_rows == 0 and out.column_names == [
        "doc_id", "chunk_id", "chunk_text", "chunk_words"]
    assert _ngram_mark(t, np.array([1], dtype=np.uint64),
                       "text", 13, "c")["c"].to_pylist() == []
    tok = Tokenized(t["text"])
    assert len(tok.word_hashes()) == 0


def test_pivot_agg_vs_pandas(ray_session):
    import ray.data as rd

    from netml_ray.windows import pivot_agg

    rng = np.random.default_rng(23)
    n = 6000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, size=n),
        "c": rng.choice(["a", "b", "c", "zzz"], size=n),
        "v": rng.normal(size=n),
    })
    cats = ["a", "b", "c"]  # 'zzz' deliberately excluded
    for agg in ("sum", "count", "mean"):
        got = pivot_agg(rd.from_pandas(df), "k", "c", "v",
                        categories=cats, agg=agg,
                        num_partitions=6).to_pandas()
        got = got.sort_values("k").reset_index(drop=True)
        piv = df[df.c.isin(cats)].pivot_table(
            index="k", columns="c", values="v", aggfunc=agg, dropna=False)
        piv = piv.reindex(columns=cats)
        if agg in ("sum", "count"):
            piv = piv.fillna(0)
        exp = piv.reindex(sorted(df.k.unique())).reset_index()
        for c in cats:
            np.testing.assert_allclose(
                got[f"{agg}_{c}"].to_numpy(dtype=np.float64),
                exp[c].to_numpy(dtype=np.float64), rtol=1e-12,
                equal_nan=True, err_msg=f"{agg}/{c}")


def test_curation_funnel_consistent_with_pipeline(ray_session):
    """Funnel counts are monotone and the deduped stage equals the
    actual pipeline output row count."""
    import ray.data as rd

    from netml_ray.corpus import gen_documents
    from netml_ray.curation import curate_corpus, curation_funnel

    t = gen_documents(4000, seed=9)
    f = curation_funnel(rd.from_arrow(t)).to_pandas()
    assert f["stage"].tolist() == ["input", "lang", "quality",
                                   "repetition", "decontaminated",
                                   "deduped"]
    n = f["n_docs"].tolist()
    assert n[0] == 4000
    assert all(a >= b for a, b in zip(n, n[1:]))  # monotone funnel
    kept = curate_corpus(rd.from_arrow(t)).count()
    assert n[-1] == kept

def test_curation_funnel_distributed_distinct_path(ray_session):
    """Forcing the distributed deduped-count path (threshold 0: hash
    blobs explode into a narrow int64 shuffle, per-partition unique
    counts sum) yields the exact same funnel as the driver-union path."""
    import ray.data as rd

    from netml_ray.corpus import gen_documents
    from netml_ray.curation import curation_funnel

    t = gen_documents(3000, seed=11)
    driver = curation_funnel(rd.from_arrow(t)).to_pandas()
    dist = curation_funnel(rd.from_arrow(t),
                           distinct_driver_threshold=0).to_pandas()
    assert driver.equals(dist)


def test_duplicate_span_stats(ray_session):
    """Planted shared 5-gram spans are counted per position; unique
    docs report zero; short docs report zero grams."""
    import ray.data as rd

    from netml_ray.curation import duplicate_span_stats

    shared = "alpha beta gamma delta epsilon"          # one 5-gram
    docs = [
        shared + " zeta",                              # grams: 2 (1 shared)
        "prefix " + shared,                            # grams: 2 (1 shared)
        "totally unique words never repeated anywhere ok",  # 0 dup
        "tiny doc",                                    # <5 tokens: 0 grams
        shared,                                        # exactly the gram
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}))
    out = (duplicate_span_stats(ds, n=5, min_count=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["n_grams"]) == [2, 2, 3, 0, 1]
    assert list(out["n_dup_spans"]) == [1, 1, 0, 0, 1]
    assert out.loc[4, "dup_span_frac"] == 1.0
    assert out.loc[3, "dup_span_frac"] == 0.0


def test_remove_duplicate_spans(ray_session):
    """Words covered by corpus-duplicated 5-grams are dropped; overlap
    of two duplicated spans is dropped once; unique and short docs
    survive untouched."""
    import ray.data as rd

    from netml_ray.curation import remove_duplicate_spans

    shared = "alpha beta gamma delta epsilon"
    docs = [
        "pre " + shared + " post",            # middle 5 words covered
        shared,                               # fully covered
        "one two three four five six seven",  # unique: untouched
        "tiny doc",                           # <5 tokens: untouched
        shared + " zeta " + shared,           # two covered spans
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}))
    out = (remove_duplicate_spans(ds, n=5, min_count=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["text_clean"]) == [
        "pre post", "", "one two three four five six seven",
        "tiny doc", "zeta"]
    assert list(out["n_dropped_words"]) == [5, 5, 0, 0, 10]


def test_broadcast_budget_guard(ray_session):
    """A mis-pointed 'benchmark' side fails loudly instead of silently
    broadcasting a corpus (r4 verdict #9)."""
    import ray.data as rd

    from netml_ray.curation import (
        collect_benchmark_gram_hashes,
        decontaminate_ngrams,
        decontaminate_substring,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["hello world"])}))

    with pytest.raises(ValueError, match="too large to broadcast"):
        decontaminate_substring(docs, ["x" * 64] * 4,
                                max_broadcast_bytes=100)
    with pytest.raises(ValueError, match="too large to broadcast"):
        decontaminate_ngrams(docs, np.arange(100, dtype=np.uint64),
                             max_broadcast_bytes=100)
    # exercised via the tiny budget — the real default is 256 MiB
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(0, 97 * 30, 97, dtype=np.int64)),
        "text": pa.array([" ".join(f"w{i}{j}" for j in range(20))
                          for i in range(30)])}))
    with pytest.raises(ValueError, match="too large to broadcast"):
        collect_benchmark_gram_hashes(bench, max_broadcast_bytes=16)
    # and the normal path still works under the default budget
    got = collect_benchmark_gram_hashes(bench)
    assert len(got) > 0


def test_curate_corpus_lm_and_span_flags(ray_session):
    """The optional LM-quality and duplicated-span stages (r4 verdict
    #7) drop exactly the docs the standalone scorers flag: with-flags
    output == default output filtered to ids passing bigram_lm_bits /
    duplicate_span_stats thresholds."""
    import ray.data as rd

    from netml_ray.curation import curate_corpus, duplicate_span_stats
    from netml_ray.textstats import bigram_lm_bits

    rng = np.random.default_rng(5)
    vocab = ("the be to of and that have with fox dog run jump lazy "
             "quick brown river stone cloud light dark".split())
    boiler = "subscribe to our newsletter for daily updates and offers"
    texts, n = [], 60
    for i in range(n):
        words = list(rng.choice(vocab, 30))
        if i % 6 == 0:      # boilerplate-heavy docs → high span coverage
            words = (boiler + " ").split() * 5 + words[:5]
        texts.append(" ".join(words))
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64) + 1),
        "text": texts,
        "lang": ["en"] * n,
        "source": ["s"] * n,
    })
    kw = dict(max_dup_2gram=1.0, max_top_2gram=1.0)
    base = curate_corpus(rd.from_arrow(t), **kw).to_pandas()

    lm = bigram_lm_bits(rd.from_arrow(t), alpha=0.5).to_pandas()
    sp = duplicate_span_stats(rd.from_arrow(t), n=5,
                              min_count=2).to_pandas()
    thresh_bits = float(np.nanmedian(lm["lm_bits"]))
    ok_lm = set(lm.loc[~(np.round(lm["lm_bits"], 6) > thresh_bits),
                       "doc_id"])
    ok_sp = set(sp.loc[sp["dup_span_frac"] <= 0.5, "doc_id"])

    out = curate_corpus(rd.from_arrow(t), max_lm_bits=thresh_bits,
                        max_dup_span_frac=0.5, **kw).to_pandas()
    expect = base[base["doc_id"].isin(ok_lm & ok_sp)]
    assert sorted(out["doc_id"]) == sorted(expect["doc_id"])
    # the flags actually bite in this fixture
    assert 0 < len(out) < len(base)


def test_weighted_reservoir_topk_vs_brute(ray_session):
    """E-S A-Res top-k == the brute global argsort of ln(u)/w for any
    partitioning; weights must be strictly positive; heavier rows are
    sampled more often than lighter ones in aggregate."""
    import hashlib

    import ray.data as rd

    from netml_ray.curation import weighted_reservoir_topk

    rng = np.random.default_rng(3)
    n, k = 3000, 150
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 1000, n).astype(np.int64)
    t = pa.table({"id": pa.array(ids), "w": pa.array(w)})
    u = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                  for i in ids], dtype=np.float64) / float(1 << 60)
    key = np.log(u) / w
    exp = set(ids[np.argsort(-key)][:k].tolist())
    for parts in (1, 11):
        got = weighted_reservoir_topk(
            rd.from_arrow(t).repartition(parts), "id", "w", k)
        assert got.num_rows == k
        assert set(got["id"].to_pylist()) == exp
        np.testing.assert_allclose(
            np.sort(got["es_key"].to_numpy()),
            np.round(np.sort(key[np.argsort(-key)][:k]), 9),
            atol=1e-12)
    # weight-proportional in aggregate: the heavy half dominates
    heavy = (w[np.argsort(-key)][:k] > np.median(w)).mean()
    assert heavy > 0.6
    # nonpositive weights fail loudly
    bad = pa.table({"id": pa.array([1, 2]), "w": pa.array([5, 0])})
    with pytest.raises(Exception, match="strictly positive"):
        weighted_reservoir_topk(rd.from_arrow(bad), "id", "w", 1)


def test_segment_dedup_brute(ray_session):
    """segment_dedup vs a brute-force driver reference: global
    first-occurrence keep per distinct segment, rebuild in ordinal
    order, fully-deduped docs come back empty."""
    import ray.data as rd

    from netml_ray.curation import segment_dedup

    rng = np.random.default_rng(11)
    vocab = list("abcdefg")
    texts = [" ".join(rng.choice(vocab, int(k)))
             for k in rng.integers(0, 20, 120)]
    texts[5] = texts[3]            # full-doc dup → doc 5 empties
    texts[7] = ""                  # empty doc survives with n_total=0
    t = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                  "text": pa.array(texts)})
    size = 3
    # brute force
    seen: dict[str, tuple[int, int]] = {}
    segs = {}
    for d, tx in enumerate(texts):
        ws = tx.split()
        chunks = [" ".join(ws[i * size:(i + 1) * size])
                  for i in range(-(-len(ws) // size))]
        segs[d] = chunks
        for i, c in enumerate(chunks):
            if c not in seen:
                seen[c] = (d, i)
    exp = {}
    for d, chunks in segs.items():
        kept = [c for i, c in enumerate(chunks) if seen[c] == (d, i)]
        exp[d] = (" ".join(kept), len(kept), len(chunks))

    out = segment_dedup(rd.from_arrow(t), size=size).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 120
    for _, r in out.iterrows():
        e = exp[int(r.doc_id)]
        assert (r.text, int(r.n_kept), int(r.n_total)) == e
    assert out.loc[5, "text"] == "" and out.loc[5, "n_kept"] == 0
    assert out.loc[7, "n_total"] == 0


def test_temperature_sample_rates(ray_session):
    """α=0.5 mixing: rare sources keep a higher fraction than
    dominant ones, overall keep ≈ frac, deterministic across
    repartitioning."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.curation import temperature_sample

    rng = np.random.default_rng(3)
    src = np.r_[np.zeros(8000, int), np.ones(1500, int),
                np.full(500, 2, int)]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(src), dtype=np.int64)),
        "source": pa.array([f"s{i}" for i in src])})
    out = temperature_sample(rd.from_arrow(t), "source", "doc_id",
                             frac=0.5).to_pandas()
    n = t.to_pandas().groupby("source").size()
    kept = out.groupby("source").size().reindex(n.index, fill_value=0)
    rate = kept / n
    # upweighted tail, downweighted head
    assert rate["s2"] > rate["s1"] > rate["s0"]
    assert 0.35 < len(out) / len(src) < 0.65
    # expected thresholds: min(1, sqrt share) rule
    c = n.to_numpy().astype(float)
    r = np.minimum(1.0, np.sqrt(c) / np.sqrt(c).sum()
                   * 0.5 * c.sum() / c)
    for s, exp in zip(n.index, r):
        assert abs(rate[s] - np.floor(1000 * exp) / 1000) < 0.03

    again = temperature_sample(rd.from_arrow(t).repartition(6),
                               "source", "doc_id",
                               frac=0.5).to_pandas()
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


def test_decontaminate_jaccard_planted(ray_session):
    """exact-copy and near-copy of a benchmark doc flag; unrelated
    docs don't; max_jaccard matches a set-based brute."""
    import pyarrow as pa
    import ray.data as rd

    from netml_ray.curation import decontaminate_jaccard

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(300)]
    mk = lambda k: " ".join(rng.choice(vocab, k))
    bench = [mk(40), mk(35)]
    near = bench[0].split()
    near[5] = "zzz"                      # 1-word mutation → high jacc
    docs = [bench[0], " ".join(near), mk(50), mk(8), ""]
    t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "text": pa.array(docs)})
    out = decontaminate_jaccard(rd.from_arrow(t), bench, n=3,
                                tau=0.5).to_pandas() \
        .set_index("doc_id").sort_index()

    def gset(s):
        ws = s.split()
        return {tuple(ws[i:i + 3]) for i in range(len(ws) - 2)}

    bsets = [gset(b) for b in bench]
    for d, txt in enumerate(docs):
        gs = gset(txt)
        mj = max((len(gs & b) / len(gs | b) for b in bsets
                  if gs | b), default=0.0)
        assert abs(out.loc[d, "max_jaccard"] - round(mj, 9)) < 1e-9
        assert out.loc[d, "contaminated"] == (mj >= 0.5)
    assert bool(out.loc[0, "contaminated"])       # exact copy
    assert bool(out.loc[1, "contaminated"])       # near copy
    assert not out.loc[2, "contaminated"]
