"""CLI mirroring the reference's ``netml learn`` / ``netml classify``
entry points (src/netml/cli.py:371-454 learn, cli.py:187-239 classify)
on the Ray engine::

    python -m netml_ray.cli learn --corpus DIR_OR_FILE [--labels CSV]
        [--feature-type IAT] [--algorithm PCA] [--params JSON]
        --features-out PATH.parquet --model-out PATH.pkl
    python -m netml_ray.cli classify --corpus DIR_OR_FILE
        --model PATH.pkl [--out PATH.parquet]

Pipeline-step selection (extract / train / both) follows cli.py:248-250;
hyperparameters come as a JSON dict validated against the algorithm's
``__init__`` signature (cli.py:345-349, 533-553).  Artifacts: features
as Parquet (the engine's pickle-sink recast), model as a small driver
pickle (models are post-aggregation small, cli.py:574).
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import pickle
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")


def _bind_params(cls, params: dict) -> dict:
    """Validate params against the ctor signature (cli.py:541-547)."""
    sig = inspect.signature(cls.__init__)
    unknown = [k for k in params if k not in sig.parameters]
    if unknown:
        raise SystemExit(f"unknown parameter(s) for {cls.__name__}: {unknown}")
    return params


def _check_corpus(path: str) -> None:
    import os

    if not os.path.exists(path):
        raise SystemExit(f"error: corpus path does not exist: {path}")


def cmd_learn(args) -> int:
    _check_corpus(args.corpus)
    _ensure_ray()
    from netml_ray import models
    from netml_ray.api import CrawlCorpus

    cc = CrawlCorpus(args.corpus, min_rows=args.min_rows)
    cc.corpus2sessions(q_interval=args.q_interval)
    if args.labels:
        cc.label_sessions(pd.read_csv(args.labels), label_col=args.label_col)
    cc.sessions2features(args.feature_type, fft=args.fft, header=args.header)

    n, d = cc.features.shape
    print(f"extracted features: {n} sessions x {d} dims "
          f"(interval={cc.interval:.6g}, dim={cc.meta.dim})")
    if args.features_out:
        t = pa.table({
            "url": pa.array(cc.keys, type=pa.string()),
            "session_id": pa.array(cc.session_ids),
            "features": pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * d),
                pa.array(cc.features.ravel()),
            ),
            "label": pa.array(
                cc.labels if cc.labels is not None else [None] * n,
                type=pa.int64(),
            ),
        })
        pq.write_table(t, args.features_out)
        print(f"features -> {args.features_out}")

    if args.action in ("train", "both"):
        params = _bind_params(models.ALGORITHMS[args.algorithm.upper()],
                              json.loads(args.params) if args.params else {})
        X = cc.features
        y = cc.labels
        if y is not None and len(y) and y.any():
            # fit on normal, report AUC (cli.py:501-519, 563-569 analog)
            model = models.fit(args.algorithm, X[y == 0], **params)
            auc = models.auc_score(y, model.decision_function(X))
            print(f"train AUC: {auc:.4f}")
        else:
            model = models.fit(args.algorithm, X, **params)
            print("trained (unlabeled; no AUC)")
        if args.model_out:
            with open(args.model_out, "wb") as f:
                pickle.dump({"model": model, "algorithm": args.algorithm,
                             "feature_type": args.feature_type,
                             "interval": cc.interval, "dim": cc.meta.dim}, f)
            print(f"model -> {args.model_out}")
    return 0


def cmd_classify(args) -> int:
    _check_corpus(args.corpus)
    _ensure_ray()
    from netml_ray import models
    from netml_ray.api import CrawlCorpus

    with open(args.model, "rb") as f:
        art = pickle.load(f)
    cc = CrawlCorpus(args.corpus, min_rows=args.min_rows)
    cc.corpus2sessions(q_interval=args.q_interval)
    cc.sessions2features(art["feature_type"])
    scores = art["model"].decision_function(cc.features)
    out = pd.DataFrame({"url": cc.keys, "session_id": cc.session_ids, "score": scores})
    if args.out:
        out.to_parquet(args.out)
        print(f"scores -> {args.out}")
    else:
        for _, r in out.head(20).iterrows():  # per-flow report (cli.py:204-239)
            print(f"{r['url']}\tsession={int(r['session_id'])}\tscore={r['score']:.4f}")
    print(f"classified {len(out)} sessions")
    return 0


def cmd_curate(args) -> int:
    """Run the web-corpus curation flagship over a documents-shaped
    parquet corpus (columns: doc_id, text, lang, source) and write the
    digested keep-list as parquet.  ``--resume-dir`` switches to the
    checkpointed plan (atomic per-partition commits; killed runs
    resume)."""
    _check_corpus(args.corpus)
    _ensure_ray()
    import ray.data as rd

    from netml_ray.curation import curate_corpus, curate_corpus_checkpointed

    docs = rd.read_parquet(args.corpus,
                           columns=["doc_id", "text", "lang", "source"])
    mix = json.loads(args.mix_weights) if args.mix_weights else None
    if args.resume_dir:
        if args.max_lm_bits is not None or \
                args.max_dup_span_frac is not None:
            raise SystemExit(
                "--max-lm-bits/--max-dup-span-frac are not yet wired "
                "into the checkpointed plan; re-run without --resume-dir")
        if mix is not None or args.max_per_source is not None:
            raise SystemExit(
                "mixing/caps run on the digested output; re-run without "
                "--resume-dir or apply them downstream")
        out = curate_corpus_checkpointed(
            docs, args.resume_dir, lang=args.lang,
            max_dup_2gram=args.max_dup_2gram,
            max_top_2gram=args.max_top_2gram)
    else:
        out = curate_corpus(
            docs, lang=args.lang, max_dup_2gram=args.max_dup_2gram,
            max_top_2gram=args.max_top_2gram, mix_weights=mix,
            max_per_source=args.max_per_source,
            max_lm_bits=args.max_lm_bits,
            max_dup_span_frac=args.max_dup_span_frac)
    out.write_parquet(args.out)
    import glob

    n = sum(pq.read_metadata(f).num_rows
            for f in glob.glob(f"{args.out}/*.parquet"))
    print(f"curated keep-list -> {args.out} ({n} docs kept)")
    return 0


def cmd_index(args) -> int:
    """Build (or rebuild) a sharded inverted index over a documents
    corpus."""
    import ray.data as rd

    from netml_ray.invindex import InvertedIndex

    docs = rd.read_parquet(args.corpus, columns=[args.id_col, args.text_col])
    idx = InvertedIndex.build(docs, args.index, text_col=args.text_col,
                              id_col=args.id_col,
                              num_shards=args.num_shards)
    print(f"index -> {idx.index_dir} ({idx.meta['n_docs']} docs, "
          f"{len(idx.meta['files'])} shards)")
    return 0


def cmd_search(args) -> int:
    """Boolean keyword search against a built index (reads only the
    query terms' shards)."""
    from netml_ray.invindex import InvertedIndex

    idx = InvertedIndex.load(args.index)
    hits = idx.search([t for t in args.terms.split(",") if t],
                      mode=args.mode)
    for h in hits[:args.limit]:
        print(int(h))
    print(f"# {len(hits)} match(es)", file=sys.stderr)
    return 0


def cmd_stats(args) -> int:
    """Keyed statistics over a parquet table: one narrow-exchange op
    per requested stat (entropy/mode for a categorical, moments/
    autocorr for a numeric) written as one parquet file per stat —
    the new keyed-statistics family behind a user surface."""
    _ensure_ray()
    import ray.data as rd

    from netml_ray.mlprep import group_entropy, group_mode, group_moments
    from netml_ray.sequences import group_autocorr

    cols = [args.key]
    if args.cat:
        cols.append(args.cat)
    if args.value:
        cols.append(args.value)
    if args.order_by and args.order_by not in cols:
        cols.append(args.order_by)
    if args.tiebreak and args.tiebreak not in cols:
        cols.append(args.tiebreak)
    ds = rd.read_parquet(args.corpus, columns=cols)
    os.makedirs(args.out, exist_ok=True)
    wanted = [s for s in args.stats.split(",") if s]
    for s in wanted:
        if s == "entropy":
            if not args.cat:
                raise SystemExit("entropy needs --cat")
            out = group_entropy(ds, args.key, args.cat)
        elif s == "mode":
            if not args.cat:
                raise SystemExit("mode needs --cat")
            out = group_mode(ds, args.key, args.cat)
        elif s == "moments":
            if not args.value:
                raise SystemExit("moments needs --value")
            out = group_moments(ds, args.key, args.value)
        elif s == "autocorr":
            if not (args.value and args.order_by and args.tiebreak):
                raise SystemExit(
                    "autocorr needs --value, --order-by and --tiebreak")
            out = group_autocorr(ds, args.key, args.order_by,
                                 args.value, lag=args.lag,
                                 tiebreak=args.tiebreak)
        else:
            raise SystemExit(f"unknown stat {s!r}")
        dest = os.path.join(args.out, f"{s}.parquet")
        t = out if isinstance(out, pa.Table) else \
            pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                              batch_size=None))
        pq.write_table(t, dest)
        print(f"{s}: {t.num_rows} rows -> {dest}", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="netml_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    l = sub.add_parser("learn", help="extract features and/or train a model")
    l.add_argument("--corpus", required=True)
    l.add_argument("--labels")
    l.add_argument("--label-col", default="label_raw")
    l.add_argument("--feature-type", default="IAT",
                   choices=["IAT", "SIZE", "IAT_SIZE", "STATS", "SAMP_NUM", "SAMP_SIZE"])
    l.add_argument("--fft", action="store_true")
    l.add_argument("--header", action="store_true")
    l.add_argument("--algorithm", default="PCA")
    l.add_argument("--params", help="JSON dict of model hyperparameters")
    l.add_argument("--q-interval", type=float, default=0.9)
    l.add_argument("--min-rows", type=int, default=2)
    l.add_argument("--action", choices=["extract", "train", "both"], default="both")
    l.add_argument("--features-out")
    l.add_argument("--model-out")
    l.set_defaults(func=cmd_learn)

    c = sub.add_parser("classify", help="score a corpus with a trained model")
    c.add_argument("--corpus", required=True)
    c.add_argument("--model", required=True)
    c.add_argument("--out")
    c.add_argument("--q-interval", type=float, default=0.9)
    c.add_argument("--min-rows", type=int, default=2)
    c.set_defaults(func=cmd_classify)

    u = sub.add_parser("curate", help="curate a documents corpus "
                       "(quality/repetition/lang filters, PII redaction, "
                       "13-gram decontamination, exact dedup)")
    u.add_argument("--corpus", required=True,
                   help="parquet file/dir with doc_id,text,lang,source")
    u.add_argument("--out", required=True, help="output parquet dir")
    u.add_argument("--lang", default="en")
    u.add_argument("--max-dup-2gram", type=float, default=0.06)
    u.add_argument("--max-top-2gram", type=float, default=0.12)
    u.add_argument("--max-lm-bits", type=float, default=None,
                   help="drop docs above this bigram-LM bits/bigram "
                        "(CCNet-style quality stage)")
    u.add_argument("--max-dup-span-frac", type=float, default=None,
                   help="drop docs whose duplicated-5-gram coverage "
                        "exceeds this fraction (boilerplate stage)")
    u.add_argument("--mix-weights", help="JSON {source: keep_pct}")
    u.add_argument("--max-per-source", type=int)
    u.add_argument("--resume-dir",
                   help="checkpoint dir: resumable phase-A partitions")
    u.set_defaults(func=cmd_curate)

    ix = sub.add_parser("index", help="build a sharded inverted index")
    ix.add_argument("--corpus", required=True)
    ix.add_argument("--index", required=True, help="index output dir")
    ix.add_argument("--text-col", default="text")
    ix.add_argument("--id-col", default="doc_id")
    ix.add_argument("--num-shards", type=int)
    ix.set_defaults(func=cmd_index)

    se = sub.add_parser("search", help="boolean keyword search "
                        "against a built index")
    se.add_argument("--index", required=True)
    se.add_argument("--terms", required=True, help="comma-separated")
    se.add_argument("--mode", choices=["and", "or"], default="and")
    se.add_argument("--limit", type=int, default=20)
    se.set_defaults(func=cmd_search)

    st = sub.add_parser("stats", help="keyed statistics over a "
                        "parquet table (entropy/mode/moments/autocorr)")
    st.add_argument("--corpus", required=True, help="parquet path")
    st.add_argument("--out", required=True, help="output dir")
    st.add_argument("--key", required=True)
    st.add_argument("--stats", required=True,
                    help="comma list of entropy,mode,moments,autocorr")
    st.add_argument("--cat", help="categorical column (entropy/mode)")
    st.add_argument("--value", help="numeric column (moments/autocorr)")
    st.add_argument("--order-by", help="ordering column (autocorr)")
    st.add_argument("--tiebreak", help="unique tiebreak col (autocorr)")
    st.add_argument("--lag", type=int, default=1)
    st.set_defaults(func=cmd_stats)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
