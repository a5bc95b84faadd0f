"""Benchmark harness.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line::

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "crawl_docs_per_sec": ...}

``--scaling``: runs the same suite in fresh processes at num_cpus=8
(best of 3) and num_cpus=32 (best of 2) on the same 4M-doc input and
reports throughputs plus scaling efficiency (the sandbox stand-in for
N vs 4N nodes).

``--scaling-curation``: two-level (8 vs 32 cpus) measurement of the
curation family alone — the string-heavy ``curate_corpus`` chain AND
the simhash signature stage over the same corpus.  Measured r5: both
are bus-bound on this host (0.585 / 0.306 at 2M docs even in a
normal-or-better window — the 8-cpu side already runs near the VM's
throttled shared-memory-bus limit, so extra cores add little; the
Arrow-tokenized SimHasher fast path made the stage MORE
bandwidth-bound, not less).  Reported for transparency next to the
flagship criterion; on multi-node hardware each node brings its own
memory controllers, so the per-node byte ceiling scales WITH nodes
(BASELINE r5 section).

Env knobs: ``GRAFT_SF_DIR`` (input dir), ``RAY_GRAFT_CPUS``,
``GRAFT_CRAWL_ROWS`` / ``GRAFT_CRAWL_TOKENS`` (flagship corpus size),
``GRAFT_SCALING_ROWS`` (scaling corpus), ``GRAFT_CURATION_ROWS``,
``GRAFT_SKIP_SKEW=1`` (skip the 50%-hot skew section),
``GRAFT_ONLY_CURATION=1`` (curation+simhash sections only).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline suite: the crawl flagship (extract→sessionize→features→as-of)
# plus representative operators from each family
BENCH_QUERIES = [
    "crawl_flagship",
    "events_flagship",
    "q1_pricing",
    "sessionize_events",
    "rolling_events",
    "tumbling_window_events",
    "asof_purchase_signup",
    "dedup_exact_docs",
    "minhash_pairs",
    "knn_cosine",
]


def _consume(res, name: str) -> int:
    """Force execution without a driver bottleneck: Datasets are written
    to partitioned parquet (the realistic terminal op — parallel, no
    single-threaded driver iteration); row count comes from the written
    file metadata."""
    import glob

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    # RAM-backed sink: single-node disk bandwidth is shared across all
    # CPUs and would otherwise dominate the scaling measurement (the
    # guide's "measure compute + shuffle, not disk" rule); on a real
    # cluster the sink bandwidth scales with nodes.
    base = "/dev/shm/netml_bench_out" if os.path.isdir("/dev/shm") else "/tmp/netml_bench_out"
    out = f"{base}/{name}"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    res.write_parquet(out)
    n = sum(pq.read_metadata(f).num_rows for f in glob.glob(f"{out}/*.parquet"))
    shutil.rmtree(out, ignore_errors=True)
    return n


def crawl_rows_for(sf_dir: str) -> tuple[int, int]:
    """(rows, avg_tokens) of the synthetic crawl corpus per scale."""
    if "0.001" in sf_dir:
        base = (6000, 12)
    elif "0.01" in sf_dir:
        base = (60000, 12)
    else:
        base = (1500000, 60)
    return (int(os.environ.get("GRAFT_CRAWL_ROWS", base[0])),
            int(os.environ.get("GRAFT_CRAWL_TOKENS", base[1])))


class _EmptySchemaNoiseFilter:
    """Ray's sort-based exchanges emit zero-column RefBundles for empty
    partitions; streaming_executor_state.py warns once per bundle
    (``… new schema: .``).  Our own empty blocks are schema-stamped
    (pipeline empty-branch tables carry full schemas; materialized
    boundaries run ``drop_empty_blocks``), so the remaining spam is
    Ray-internal.  Drop ONLY that exact variant — real schema
    divergences still log.

    Reviewed r5 against Ray 2.49.2 (the pinned version here): sort
    exchanges still emit zero-column empties, so the filter stays.
    Drop it when a Ray upgrade stamps schemas on sort-exchange empties
    (r3 verdict #10 / r4 #10 carry-over)."""

    def filter(self, record) -> bool:  # logging.Filter protocol
        m = record.getMessage()
        return not ("RefBundle with a different schema" in m
                    and "new schema: ." in m)


def run_suite() -> dict:
    import logging

    import ray

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaNoiseFilter())
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    from netml_ray.corpus import corpus_path

    # pre-generate the synthetic crawl corpus (input materialization, not
    # pipeline work) and warm the page cache with one untimed read
    crawl_rows, crawl_tok = crawl_rows_for(SF_DIR)
    cp = corpus_path(crawl_rows, seed=7, avg_tokens=crawl_tok)
    cp_files = [os.path.join(cp, x) for x in os.listdir(cp)] if os.path.isdir(cp) else [cp]
    for fp in cp_files:
        with open(fp, "rb") as f:
            while f.read(1 << 24):
                pass
    for t in ["events", "lineitem", "documents", "embeddings", "orders"]:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            with open(p, "rb") as f:
                while f.read(1 << 24):
                    pass

    # warm the Ray worker pool INCLUDING library imports (a worker's
    # first netml_ray import costs ~1.5s; unwarmed, the first real
    # execution pays it 32x) — fixed per-process cost, not pipeline work
    import ray.data as rd

    def _warm(t):
        import sys as _s
        import time as _t

        _s.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import numpy as _np
        import pyarrow as _pa

        import netml_ray.kernels  # noqa: F401
        import netml_ray.textops  # noqa: F401

        _t.sleep(0.5)  # hold the slot so all NUM_CPUS workers spawn
        # push ~64MB/task through plasma: first-touch page faults on the
        # object-store mapping otherwise tax the first real execution
        return _pa.table({"x": _pa.array(_np.zeros(8 << 20, dtype=_np.float64))})

    rd.range(NUM_CPUS, override_num_blocks=NUM_CPUS).map_batches(
        _warm, batch_format="pyarrow", batch_size=None
    ).materialize()

    only_curation = os.environ.get("GRAFT_ONLY_CURATION") == "1"

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    flagship_reps: list[float] = []
    if not only_curation:
        # untimed mini-flagship: the first end-to-end execution in a
        # fresh session pays per-worker lazy extractor state,
        # reader/plasma first-touch beyond _warm's 2GB, and
        # shuffle-path code imports — all fixed per-process costs
        # (measured ~1.5x on the first 4M-doc flagship), not pipeline
        # work.  A 100k-doc pass warms every code path end-to-end.
        from netml_ray.pipeline import crawl_feature_pipeline as _cfp

        _wcp = corpus_path(100_000, seed=11, avg_tokens=crawl_tok)
        _wj, _ = _cfp(_wcp, feat_type="STATS")
        for _b in _wj.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
            pass

        qs = entrymod.queries()
        for name in BENCH_QUERIES:
            t0 = time.time()
            n = _consume(qs[name](SF_DIR), name)
            times[name] = round(time.time() - t0, 3)
            rows[name] = n
            if name == "crawl_flagship":
                # steady-state flagship: a fresh session's FIRST
                # execution pays ~1.35x in per-process warm costs
                # (plasma allocator, worker heaps, extractor state)
                # that a long run amortizes away — report best-of-N
                # in-session reps, all reps shown.  Applied identically
                # at every num_cpus, so scaling efficiency compares
                # steady states.
                flagship_reps.append(times[name])
                for _ in range(int(os.environ.get("GRAFT_FLAGSHIP_REPS", "2")) - 1):
                    t0 = time.time()
                    _consume(qs[name](SF_DIR), name)
                    flagship_reps.append(round(time.time() - t0, 3))
                times[name] = min(flagship_reps)
    total = round(sum(times.values()), 3)

    # skew resilience: 50%-hot corpus, plain key-partition plan vs the
    # hot_threshold salted plan — identical results (pinned by tests);
    # the salted time must not cliff as the hot key grows (at 10^12
    # rows the plain plan's hot partition is unrunnable, so this ratio
    # is the single-node proxy for the straggler criterion)
    skew = {}
    if os.environ.get("GRAFT_SKIP_SKEW") != "1" and not only_curation:
        from netml_ray.pipeline import crawl_feature_pipeline

        hot_cp = corpus_path(crawl_rows, seed=7, avg_tokens=crawl_tok,
                             hot_frac=0.5)
        t0 = time.time()
        j, _ = crawl_feature_pipeline(hot_cp, feat_type="STATS")
        _consume(j, "skew_plain")
        skew["skew_hot50_plain_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        j, _ = crawl_feature_pipeline(
            hot_cp, feat_type="STATS",
            hot_threshold=max(10_000, crawl_rows // 20))
        _consume(j, "skew_salted")
        skew["skew_hot50_salted_sec"] = round(time.time() - t0, 3)

    # curation throughput: the end-to-end curate_corpus chain over a
    # synthetic documents table at volume (planted dups/PII/junk/
    # contamination so every stage does real work)
    curation = {}
    if os.environ.get("GRAFT_SKIP_CURATION") != "1":
        from netml_ray.corpus import documents_path
        from netml_ray.curation import curate_corpus

        cur_rows = int(os.environ.get("GRAFT_CURATION_ROWS", "500000"))
        dp = documents_path(cur_rows, seed=13)
        cols = ["doc_id", "text", "lang", "source"]
        # benchmark/eval-set gram hashes are FIXED input in production
        # (computed once, reused every run) — derive them untimed, like
        # the corpus itself
        from netml_ray.curation import collect_benchmark_gram_hashes

        grams = collect_benchmark_gram_hashes(
            rd.read_parquet(dp, columns=["doc_id", "text"]))
        docs = rd.read_parquet(dp, columns=cols)
        reps = 2 if only_curation else 1
        if only_curation:
            # per-process warm for the curation code paths (analog of
            # the mini-flagship): one untimed 50k-doc pass
            _wdp = documents_path(50_000, seed=17)
            _wg = collect_benchmark_gram_hashes(
                rd.read_parquet(_wdp, columns=["doc_id", "text"]))
            _consume(curate_corpus(
                rd.read_parquet(_wdp, columns=cols), bench_grams=_wg),
                "curation_warm")
        cur_reps, kept = [], 0
        for _ in range(reps):
            t0 = time.time()
            kept = _consume(curate_corpus(docs, bench_grams=grams),
                            "curation")
            cur_reps.append(round(time.time() - t0, 3))
        curation = {
            "curation_sec": min(cur_reps),
            "curation_reps": cur_reps,
            "curation_docs": cur_rows,
            "curation_docs_kept": kept,
        }
        curation["curation_docs_per_sec"] = round(
            cur_rows / max(curation["curation_sec"], 1e-9), 1)

        # compute-heavy curation stage (VERDICT r3 #8): the simhash
        # signature pass is blake2b + cache-resident bit math, not a
        # string-bandwidth scan, so its two-level efficiency shows the
        # scaling the string stages reach when the shared memory bus
        # isn't the cap.  Same corpus, narrow (doc_id, simhash) output.
        from netml_ray.dedup import SimHasher
        from netml_ray.partition import auto_concurrency

        sim_reps = []
        for _ in range(reps):
            t0 = time.time()
            _consume(
                docs.map_batches(SimHasher, batch_format="pyarrow",
                                 concurrency=auto_concurrency())
                .select_columns(["doc_id", "simhash"]), "simhash")
            sim_reps.append(round(time.time() - t0, 3))
        curation["simhash_sec"] = min(sim_reps)
        curation["simhash_reps"] = sim_reps
        curation["simhash_docs_per_sec"] = round(
            cur_rows / max(curation["simhash_sec"], 1e-9), 1)

    # round-4 corpus-statistics scorers over the same synthetic corpus
    # (two-pass shape: narrow count exchange + broadcast scoring)
    textstats = {}
    if os.environ.get("GRAFT_SKIP_TEXTSTATS") != "1" \
            and os.environ.get("GRAFT_SKIP_CURATION") != "1" \
            and not only_curation:
        from netml_ray.corpus import documents_path
        from netml_ray.textstats import bigram_lm_bits, tfidf_top_terms

        ts_rows = int(os.environ.get("GRAFT_CURATION_ROWS", "500000"))
        tdocs = rd.read_parquet(documents_path(ts_rows, seed=13),
                                columns=["doc_id", "text"])
        t0 = time.time()
        _consume(bigram_lm_bits(tdocs), "lm_bits")
        textstats["lm_bits_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        _consume(tfidf_top_terms(tdocs, k=5), "tfidf")
        textstats["tfidf_sec"] = round(time.time() - t0, 3)
        textstats["textstats_docs"] = ts_rows
        textstats["lm_bits_docs_per_sec"] = round(
            ts_rows / max(textstats["lm_bits_sec"], 1e-9), 1)
        textstats["tfidf_docs_per_sec"] = round(
            ts_rows / max(textstats["tfidf_sec"], 1e-9), 1)
        # r5 continuation-5: the gram-pair exchange (novelty) — the
        # heaviest textstat shape (distinct (gram, doc) pairs move)
        from netml_ray.textstats import gram_novelty

        nv_rows = int(os.environ.get("GRAFT_NOVELTY_ROWS", "200000"))
        ndocs = rd.read_parquet(documents_path(nv_rows, seed=13),
                                columns=["doc_id", "text"])
        t0 = time.time()
        _consume(gram_novelty(ndocs, "text", "doc_id"), "novelty")
        textstats["novelty_sec"] = round(time.time() - t0, 3)
        textstats["novelty_docs"] = nv_rows
        textstats["novelty_docs_per_sec"] = round(
            nv_rows / max(textstats["novelty_sec"], 1e-9), 1)
        # r5 continuation-6: segment-level dedup — explode + TWO keyed
        # exchanges (segment string, then doc rebuild) + one join; the
        # heaviest new-op shape this round
        from netml_ray.curation import segment_dedup, temperature_sample

        sd_rows = int(os.environ.get("GRAFT_SEGDEDUP_ROWS", "200000"))
        sdocs = rd.read_parquet(documents_path(sd_rows, seed=13),
                                columns=["doc_id", "text"])
        t0 = time.time()
        _consume(segment_dedup(sdocs, size=16), "segment_dedup")
        textstats["segdedup_sec"] = round(time.time() - t0, 3)
        textstats["segdedup_docs"] = sd_rows
        textstats["segdedup_docs_per_sec"] = round(
            sd_rows / max(textstats["segdedup_sec"], 1e-9), 1)
        # temperature mixing: count partial + filter, narrow both ways
        tdocs2 = rd.read_parquet(documents_path(ts_rows, seed=13),
                                 columns=["doc_id", "source"])
        t0 = time.time()
        _consume(temperature_sample(tdocs2, "source", "doc_id",
                                    frac=0.5), "temp_sample")
        textstats["tempsample_sec"] = round(time.time() - t0, 3)
        textstats["tempsample_docs_per_sec"] = round(
            ts_rows / max(textstats["tempsample_sec"], 1e-9), 1)
        # the per-doc feature-matrix capstone: bigram model trained in
        # one narrow count exchange, then ONE fused pass scoring all
        # six signals per batch (zero joins)
        import ray as _ray

        from netml_ray.curation import repetition_batch
        from netml_ray.partition import auto_concurrency
        from netml_ray.textops import (LangId, char_entropy_batch,
                                       quality_score_batch,
                                       token_count_batch)
        from netml_ray.textstats import (lm_bits_arrays,
                                         train_bigram_model)

        fm_rows = int(os.environ.get("GRAFT_FEATMATRIX_ROWS",
                                     "200000"))
        fdocs = rd.read_parquet(documents_path(fm_rows, seed=13),
                                columns=["doc_id", "text"])
        t0 = time.time()
        mref = _ray.put(train_bigram_model(fdocs))

        class _FusedDocFeat:
            def __init__(self):
                self._lang = LangId()
                self._m = _ray.get(mref)

            def __call__(self, t):
                import pyarrow as _pa

                _, bits = lm_bits_arrays(self._m, t["text"])
                t = quality_score_batch(t)
                t = token_count_batch(t)
                t = char_entropy_batch(t)
                t = repetition_batch(t)
                t = self._lang(t)
                t = t.append_column("lm_bits",
                                    _pa.array(bits, type=_pa.float64()))
                return t.drop_columns(["text"])

        _consume(fdocs.map_batches(_FusedDocFeat,
                                   batch_format="pyarrow",
                                   concurrency=auto_concurrency()),
                 "doc_feature_matrix")
        textstats["featmatrix_sec"] = round(time.time() - t0, 3)
        textstats["featmatrix_docs"] = fm_rows
        textstats["featmatrix_docs_per_sec"] = round(
            fm_rows / max(textstats["featmatrix_sec"], 1e-9), 1)
        # trigram stupid-backoff: the multi-order gram exchange
        # (min_count=2 prunes the hapax-trigram tail before the
        # driver collect — the documented scale knob)
        from netml_ray.textstats import trigram_sb_bits

        t0 = time.time()
        _consume(trigram_sb_bits(fdocs, min_count=2), "sb_bits")
        textstats["sbbits_sec"] = round(time.time() - t0, 3)
        textstats["sbbits_docs_per_sec"] = round(
            fm_rows / max(textstats["sbbits_sec"], 1e-9), 1)

    # r5 keyed-statistics / sequence-analytics family: volume
    # throughput for the grouped-stat and sweep operators over a
    # deterministic synthetic event stream (hash-derived fields from
    # the row id — no rng state, identical at any parallelism)
    seqstats = {}
    if os.environ.get("GRAFT_SKIP_SEQSTATS") != "1" \
            and not only_curation:
        import numpy as _np
        import pyarrow as _pa

        from netml_ray.mlprep import group_entropy, target_encode_oof
        from netml_ray.sequences import funnel_stages, interval_sweep

        sq_rows = int(os.environ.get("GRAFT_SEQSTATS_ROWS", "5000000"))

        def _gen(t: _pa.Table) -> _pa.Table:
            i = t["id"].to_numpy()
            h = (i * 2654435761) % (1 << 31)
            ts = ((i * 1103515245 + 12345) % (1 << 31)).astype(_np.int64)
            et = _pa.array(_np.array(["view", "click", "purchase",
                                      "signup", "error"])[h % 5])
            return _pa.table({
                "user_id": _pa.array((h % 50000).astype(_np.int64)),
                "ts": _pa.array(ts * 1000),
                "event_id": _pa.array(i.astype(_np.int64)),
                "event_type": et,
                "value": _pa.array((h % 10007).astype(_np.float64)),
            })

        sev = (rd.range(sq_rows, override_num_blocks=NUM_CPUS * 4)
               .map_batches(_gen, batch_format="pyarrow").materialize())
        for label, fn in [
            ("entropy", lambda: group_entropy(sev, "user_id",
                                              "event_type")),
            ("funnel", lambda: funnel_stages(
                sev, "user_id", "ts", "event_type",
                ["view", "click", "purchase"], tiebreak="event_id")),
            ("sweep", lambda: interval_sweep(
                sev.map_batches(
                    lambda t: _pa.table(
                        {"event_type": t["event_type"], "s": t["ts"],
                         "e": _pa.compute.add(t["ts"], 10_000_000)}),
                    batch_format="pyarrow"),
                "event_type", "s", "e")),
            ("te_oof", lambda: target_encode_oof(
                sev, "event_type", "value", "event_id")),
            ("tte", lambda: __import__(
                "netml_ray.windows", fromlist=["add_time_to_event"])
                .add_time_to_event(sev, "user_id", "ts", "event_type",
                                   "purchase", tiebreak="event_id")),
            ("fwd_window", lambda: __import__(
                "netml_ray.windows", fromlist=["add_forward_window"])
                .add_forward_window(sev, "user_id", "ts", "value",
                                    horizon_sec=50_000_000.0,
                                    tiebreak="event_id")),
            ("rollup", lambda: __import__(
                "netml_ray.windows", fromlist=["rollup_agg"])
                .rollup_agg(sev, "event_type", "user_id", "value")),
            # r5 final-session distributional family (featstats.py)
            ("decayed", lambda: __import__(
                "netml_ray.featstats", fromlist=["decayed_agg"])
                .decayed_agg(sev, "user_id", "ts", "value",
                             half_life_s=10_000.0)),
            ("burstiness", lambda: __import__(
                "netml_ray.featstats", fromlist=["burstiness"])
                .burstiness(sev, "user_id", "ts", bucket_s=1_000.0)),
            ("psi", lambda: __import__(
                "netml_ray.featstats", fromlist=["psi"])
                .psi(sev, "value", "ts", n_bins=10)),
            # r5 continuation-2 keyed-feature family
            ("cusum", lambda: __import__(
                "netml_ray.featstats", fromlist=["cusum_stat"])
                .cusum_stat(sev, "user_id", "ts", "value",
                            tiebreak_col="event_id")),
            ("spearman", lambda: __import__(
                "netml_ray.featstats", fromlist=["spearman_corr"])
                .spearman_corr(sev, "user_id", "ts", "value")),
            ("rfm", lambda: __import__(
                "netml_ray.featstats", fromlist=["rfm_segment"])
                .rfm_segment(sev, "user_id", "ts", "value")),
            # r5 continuation-3 gaps-and-islands / sequence family
            ("streaks", lambda: __import__(
                "netml_ray.sequences", fromlist=["streaks"])
                .streaks(sev, "user_id", "ts")),
            ("scd2", lambda: __import__(
                "netml_ray.sequences", fromlist=["scd2_intervals"])
                .scd2_intervals(sev, "user_id", "ts", "event_type",
                                tiebreak="event_id")),
            ("twa", lambda: __import__(
                "netml_ray.sequences", fromlist=["time_weighted_avg"])
                .time_weighted_avg(sev, "user_id", "ts", "value",
                                   tiebreak="event_id")),
            ("debounce", lambda: __import__(
                "netml_ray.sequences", fromlist=["debounce"])
                .debounce(sev, ["user_id", "event_type"], "ts",
                          5_000_000, tiebreak="event_id")),
            ("paths", lambda: __import__(
                "netml_ray.sequences", fromlist=["event_paths"])
                .event_paths(sev, "user_id", "ts", "event_type",
                             tiebreak="event_id", max_len=50)),
            # r5 closing-session growth-accounting / geo family
            ("hhi", lambda: __import__(
                "netml_ray.featstats", fromlist=["hhi_concentration"])
                .hhi_concentration(sev, "event_type", "user_id")),
            ("new_ret", lambda: __import__(
                "netml_ray.sequences", fromlist=["new_returning"])
                .new_returning(sev, "user_id", "ts")),
            ("nearest_poi", lambda: __import__(
                "netml_ray.geo", fromlist=["nearest_poi"])
                .nearest_poi(sev, "user_id")),
            ("geo_grid", lambda: __import__(
                "netml_ray.geo", fromlist=["grid_stats"])
                .grid_stats(sev, "user_id", "value")),
        ]:
            t0 = time.time()
            _consume(fn(), label)
            seqstats[f"{label}_sec"] = round(time.time() - t0, 3)
            seqstats[f"{label}_rows_per_sec"] = round(
                sq_rows / max(seqstats[f"{label}_sec"], 1e-9), 1)
        seqstats["seqstats_rows"] = sq_rows

        # graph family: PageRank over a deterministic synthetic edge
        # stream (2M parallel-edge rows, 100k nodes, 3 iterations —
        # one dedup exchange + 4 narrow passes)
        if os.environ.get("GRAFT_SKIP_GRAPH") != "1":
            from netml_ray.graph import pagerank as _pagerank

            g_rows = int(os.environ.get("GRAFT_GRAPH_ROWS", "2000000"))

            def _edges(t: _pa.Table) -> _pa.Table:
                i = t["id"].to_numpy()
                h1 = (i * 2654435761) % (1 << 31)
                h2 = (i * 1103515245 + 12345) % (1 << 31)
                return _pa.table({
                    "src": _pa.array((h1 % 100_000).astype(_np.int64)),
                    "dst": _pa.array((h2 % 100_000).astype(_np.int64))})

            eds = (rd.range(g_rows, override_num_blocks=NUM_CPUS * 4)
                   .map_batches(_edges, batch_format="pyarrow"))
            t0 = time.time()
            pr = _pagerank(eds, iters=3, num_partitions=NUM_CPUS * 2)
            seqstats["pagerank_sec"] = round(time.time() - t0, 3)
            seqstats["pagerank_edges_per_sec"] = round(
                g_rows / max(seqstats["pagerank_sec"], 1e-9), 1)
            seqstats["pagerank_nodes"] = pr.num_rows

    crawl_docs = crawl_rows
    result = {
        "metric": "headline pipelines wall time (crawl flagship + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "rows": rows,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl_docs": crawl_docs,
        # GRAFT_ONLY_CURATION skips the flagship entirely
        "crawl_docs_per_sec": round(
            crawl_docs / max(times["crawl_flagship"], 1e-9), 1)
        if "crawl_flagship" in times else None,
        "flagship_reps": flagship_reps,
        **skew,
        **curation,
        **textstats,
        **seqstats,
    }
    ray.shutdown()
    return result


SCALING_ROWS = int(os.environ.get("GRAFT_SCALING_ROWS", "4000000"))


def run_child(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
    if "--scaling" in sys.argv:
        # the scaling criterion needs a job large enough that parallel
        # compute dominates the fixed single-node orchestration floor;
        # the skew section is measured separately (suite run), not here
        env["GRAFT_CRAWL_ROWS"] = str(SCALING_ROWS)
        env["GRAFT_SKIP_SKEW"] = "1"
        env["GRAFT_SKIP_CURATION"] = "1"
        env["GRAFT_SKIP_SEQSTATS"] = "1"
    if "--scaling-curation" in sys.argv:
        env["GRAFT_ONLY_CURATION"] = "1"
        env.setdefault("GRAFT_CURATION_ROWS", "2000000")
    out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                         capture_output=True, text=True, check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    if "--scaling-curation" in sys.argv:
        lo, hi = 8, 32
        r_lo = run_child(lo)
        r_hi = run_child(hi)

        def _effs(key):
            tl = r_lo["curation_docs"] / r_lo[key]
            th = r_hi["curation_docs"] / r_hi[key]
            return round(tl, 1), round(th, 1), round((th / tl) / (hi / lo), 3)

        c8, c32, ceff = _effs("curation_sec")
        s8, s32, seff = _effs("simhash_sec")
        print(json.dumps({
            "metric": "curation scaling (docs/sec, num_cpus 8 vs 32): "
                      "string-heavy curate_corpus + compute-heavy simhash",
            "curation_docs": r_lo["curation_docs"],
            "curation_sec_8": r_lo["curation_sec"],
            "curation_sec_32": r_hi["curation_sec"],
            "curation_reps_8": r_lo["curation_reps"],
            "curation_reps_32": r_hi["curation_reps"],
            "curation_docs_per_sec_8": c8,
            "curation_docs_per_sec_32": c32,
            "curation_scaling_efficiency": ceff,
            "simhash_sec_8": r_lo["simhash_sec"],
            "simhash_sec_32": r_hi["simhash_sec"],
            "simhash_reps_8": r_lo["simhash_reps"],
            "simhash_reps_32": r_hi["simhash_reps"],
            "simhash_docs_per_sec_8": s8,
            "simhash_docs_per_sec_32": s32,
            "simhash_scaling_efficiency": seff,
        }))
        return
    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        # INTERLEAVE the per-level children (lo,hi,lo,hi,lo) instead of
        # running all of one side then all of the other: this VM's
        # bandwidth throttle swings on ~10-minute scales, and a
        # side-ordered sequence can measure the two sides in DIFFERENT
        # windows — r5 runs 2/3 caught one side normal and the other
        # hard-throttled, in both directions (0.584 with the best
        # 8-side ever; 0.461 with a normal 8-side and a 152k 32-side
        # minutes after a 238k probe).  Interleaving makes best-of per
        # side span the same window envelope; reps stay 3x8 + 2x32 and
        # every rep is still reported.
        runs: dict[int, list] = {lo: [], hi: []}
        for n in (lo, hi, lo, hi, lo):
            runs[n].append(run_child(n))

        def _best(n):
            best = min(runs[n], key=lambda r: r["queries"]["crawl_flagship"])
            return best, [r["queries"]["crawl_flagship"] for r in runs[n]]

        r_lo, reps_lo = _best(lo)
        r_hi, reps_hi = _best(hi)
        tput_lo = r_lo["crawl_docs"] / r_lo["queries"]["crawl_flagship"]
        tput_hi = r_hi["crawl_docs"] / r_hi["queries"]["crawl_flagship"]
        eff = (tput_hi / tput_lo) / (hi / lo)
        print(json.dumps({
            "metric": "scaling efficiency (crawl flagship docs/sec, num_cpus 8 vs 32)",
            "sec_8": r_lo["queries"]["crawl_flagship"],
            "sec_32": r_hi["queries"]["crawl_flagship"],
            "reps_sec_8": reps_lo,
            "reps_sec_32": reps_hi,
            "docs_per_sec_8": round(tput_lo, 1),
            "docs_per_sec_32": round(tput_hi, 1),
            "scaling_efficiency": round(eff, 3),
            # the non-flagship suite queries run on FIXED sf0.1 inputs
            # that do not scale with the job, so a suite-level
            # efficiency is not meaningful; the flagship docs/sec
            # efficiency above is the scaling criterion
            "suite_sec_8": r_lo["value"],
            "suite_sec_32": r_hi["value"],
            "sf": SF_DIR,
        }))
        return
    print(json.dumps(run_suite()))


if __name__ == "__main__":
    main()
