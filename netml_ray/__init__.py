"""netml_ray — a Ray-Data-native windowed feature-engineering engine.

A from-scratch re-expression of the capabilities of noise-lab/netml
(reference at /root/reference, netml 0.7.1) as an idiomatic Ray Data
pipeline over Parquet corpora of Common-Crawl-style web pages
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``:

- gap-cut sessionization per entity key with the reference's exact
  trailing-discard / min-count semantics
  (ref: src/netml/pparser/parser.py:141-206, 209-299)
- windowed feature vectors per session: IAT, SIZE, IAT_SIZE, STATS,
  SAMP_NUM, SAMP_SIZE, FFT, pad/truncate
  (ref: parser.py:354-652, 762-834)
- lag/lead / inter-arrival / rolling window functions
- a point-in-time (backward as-of) join with zero temporal leakage
- dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  search over embeddings, text quality / language-id / token stats

Execution model: ``ray.data.Dataset`` end-to-end — ``read_parquet`` →
``map_batches`` over zero-copy Arrow batches (actor pools for stateful
stages) → hash-partition by key → per-partition sort → segmented numpy
kernels → ``write_parquet``.  No code is ported from the reference; the
reference is cited for *semantics* only.
"""

from netml_ray.partition import partition_map, partition_map2  # noqa: F401
from netml_ray.sessionize import (  # noqa: F401
    sessionize_simple,
    sessionize_netml,
    netml_session_pipeline,
)
from netml_ray.asof import asof_join  # noqa: F401
from netml_ray.joins import (  # noqa: F401
    broadcast_join,
    hash_join,
    interval_overlap_join,
    label_join,
    range_join,
    semi_join,
    semi_join_broadcast,
)
from netml_ray.dedup import (  # noqa: F401
    dedup_exact,
    minhash_dedup_keep,
    minhash_lsh_duplicates,
    simhash_duplicates,
)
from netml_ray.similarity import (  # noqa: F401
    IVFIndex,
    embedding_near_duplicates,
    knn_cosine,
    knn_cosine_ivf,
)
from netml_ray.bloom import BloomFilter, bloom_prefilter, build_bloom  # noqa: F401
from netml_ray.featstats import (  # noqa: F401
    benford_digits,
    burstiness,
    chi2_independence,
    cusum_stat,
    decayed_agg,
    gini,
    kaplan_meier,
    psi,
    rfm_segment,
    spearman_corr,
    trend_slope,
    winsorized_group_stats,
    zipf_slope,
)
from netml_ray.sketches import KLLSketch, kll_quantiles  # noqa: F401
from netml_ray.basket import association_rules  # noqa: F401
from netml_ray.sequences import (  # noqa: F401
    active_users, scd2_intervals, streaks, temporal_pairs,
    time_weighted_avg)
from netml_ray.skyline import pareto_front  # noqa: F401
from netml_ray.bpe import apply_bpe, bpe_token_counts, learn_bpe  # noqa: F401
from netml_ray.textstats import (  # noqa: F401
    readability_profile,
    source_divergence,
    vocab_richness,
)
from netml_ray.urlops import add_url_features, url_feature_table  # noqa: F401

__version__ = "0.1.0"
