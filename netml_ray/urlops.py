"""Vectorized URL feature extraction.

The north-star corpus is url-keyed Common-Crawl-style records
(BASELINE.json north_star: "sessionizes crawl records per url"), so a
feature engine over it needs structural URL features: scheme, host,
registrable-ish domain, TLD, path depth, query-parameter count, and
length.  netml's closest analog is its per-flow 5-tuple key parsing
(reference pparser/parser.py flow keys); this recasts that "split the
identifier into typed feature columns" step for web identifiers.

Everything is RE2 via ``pyarrow.compute.extract_regex`` /
``count_substring`` — zero-copy Arrow in, Arrow out, no Python-level
row loop, so the stage is a plain narrow ``map_batches`` over
streaming blocks (no shuffle, no state; scale-free).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["url_feature_table", "add_url_features", "url_feature_profile",
           "canonicalize_urls"]

_URL_RE = (r"^(?P<scheme>[a-z][a-z0-9+.-]*)://"
           r"(?P<host>[^/?#]*)(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?")
_TLD_RE = r"\.(?P<tld>[a-z0-9-]+)$"


def url_feature_table(urls: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Structural features for a string column of absolute URLs.

    Returns columns: ``scheme``, ``host``, ``domain`` (host with one
    leading ``www.`` stripped), ``tld`` (last dot-label of the host;
    null when the host has no dot), ``path_depth`` (number of non-empty
    ``/``-separated path segments), ``n_params`` (number of ``=`` in
    the query string), ``is_https`` (bool), ``url_len``.  Rows that do
    not parse as absolute URLs get null scheme/host/domain/tld, depth 0
    and 0 params — callers can filter on ``scheme IS NULL``.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, _URL_RE)
    ok = parts.is_valid()
    scheme = pc.if_else(ok, pc.struct_field(parts, "scheme"),
                        pa.scalar(None, pa.string()))
    host = pc.if_else(ok, pc.struct_field(parts, "host"),
                      pa.scalar(None, pa.string()))
    path = pc.if_else(ok, pc.struct_field(parts, "path"), pa.scalar("", pa.string()))
    query = pc.if_else(ok, pc.struct_field(parts, "query"), pa.scalar("", pa.string()))
    domain = pc.replace_substring_regex(host, r"^www\.", "", max_replacements=1)
    tld_m = pc.extract_regex(host, _TLD_RE)
    tld = pc.if_else(tld_m.is_valid(), pc.struct_field(tld_m, "tld"),
                     pa.scalar(None, pa.string()))
    # non-empty path segments: '/a//b/' -> 2
    depth = pc.count_substring_regex(path, r"[^/]+")
    n_params = pc.count_substring(query, "=")
    return pa.table({
        "scheme": scheme,
        "host": host,
        "domain": domain,
        "tld": tld,
        "path_depth": depth.cast(pa.int64()),
        "n_params": n_params.cast(pa.int64()),
        "is_https": pc.equal(scheme, "https"),
        "url_len": pc.utf8_length(urls).cast(pa.int64()),
    })


def add_url_features(ds, url_col: str, *, prefix: str = "url_"):
    """Append URL feature columns (prefixed) to a Dataset — one narrow
    vectorized ``map_batches`` pass, streaming, no shuffle."""

    def _f(t: pa.Table) -> pa.Table:
        feats = url_feature_table(t[url_col])
        for name in feats.column_names:
            t = t.append_column(prefix + name, feats[name])
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


def url_feature_profile(ds, url_col: str, *, round_to: int = 9) -> pa.Table:
    """Corpus profile over URL structure: for each ``(tld, path_depth,
    n_params, is_https)`` group, the row count, number of distinct
    domains, and mean URL length.

    Scale shape: per-batch vectorized extraction + a partial group-by
    over the 5-tuple INCLUDING domain (bounded: O(tlds x depths x
    params x domains) rows per batch, independent of batch size), then
    a driver-side Arrow group-by over the tiny partial union.  No
    shuffle."""
    import numpy as np

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "tld": pa.array([], pa.string()),
            "path_depth": pa.array([], pa.int64()),
            "n_params": pa.array([], pa.int64()),
            "is_https": pa.array([], pa.int64()),
            "domain": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "sum_len": pa.array([], pa.int64())})
        if not t.num_rows:
            return empty
        f = url_feature_table(t[url_col])
        g = pa.table({
            "tld": f["tld"], "path_depth": f["path_depth"],
            "n_params": f["n_params"],
            "is_https": f["is_https"].cast(pa.int64()),
            "domain": f["domain"], "url_len": f["url_len"]})
        out = (g.group_by(["tld", "path_depth", "n_params", "is_https",
                           "domain"])
               .aggregate([([], "count_all"), ("url_len", "sum")]))
        return out.rename_columns(["tld", "path_depth", "n_params",
                                   "is_https", "domain", "n", "sum_len"])

    parts = pa.concat_tables(
        [b for b in ds.map_batches(_partial, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")],
        promote_options="none")
    agg = (parts.group_by(["tld", "path_depth", "n_params", "is_https"])
           .aggregate([("n", "sum"), ("sum_len", "sum"),
                       ("domain", "count_distinct")]))
    n = agg["n_sum"].to_numpy().astype("float64")
    avg_len = pc.round(
        pa.array(agg["sum_len_sum"].to_numpy().astype("float64") / n),
        ndigits=round_to)
    out = pa.table({
        "tld": agg["tld"], "path_depth": agg["path_depth"],
        "n_params": agg["n_params"], "is_https": agg["is_https"],
        "n": agg["n_sum"].cast(pa.int64()),
        "n_domains": agg["domain_count_distinct"].cast(pa.int64()),
        "avg_len": avg_len})
    order = np.lexsort((
        out["is_https"].to_numpy(zero_copy_only=False),
        out["n_params"].to_numpy(zero_copy_only=False),
        out["path_depth"].to_numpy(zero_copy_only=False),
        np.asarray(out["tld"].to_pylist(), dtype=object)))
    return out.take(pa.array(order.tolist(), pa.int64()))


def canonicalize_urls(ds, url_col: str, *,
                      out_col: str = "canon_url",
                      param_pattern: str = "utm_[a-z]+|fbclid"):
    """URL canonicalization — the CommonCrawl-style dedup-key
    normalizer: strip the fragment, then strip trailing tracking
    parameters matching ``param_pattern`` (utm_*, fbclid by default).
    Pure streamed map stage (no shuffle): two RE2
    ``replace_substring_regex`` passes per batch, the same engine
    DuckDB's ``regexp_replace`` uses, so oracle parity is exact —
    the PII-redaction precedent.

    The result is the canonical dedup key for exact URL dedup /
    per-URL sessionization upstream of the flagship (north_star:
    sessionize crawl records per url)."""
    frag_re = "#.*$"
    trail_re = r"([?&](?:%s)=[^&#]*)+$" % param_pattern

    def _f(t: pa.Table) -> pa.Table:
        u = t[url_col]
        u = pc.replace_substring_regex(u, pattern=frag_re,
                                       replacement="")
        u = pc.replace_substring_regex(u, pattern=trail_re,
                                       replacement="")
        return t.append_column(out_col, u)

    return ds.map_batches(_f, batch_format="pyarrow")
