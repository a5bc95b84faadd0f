"""Deduplication operators for large-scale training-data pipelines.

All run as Ray Data stages, and all shuffle NARROW: document payloads
never enter an all-to-all exchange —

- exact: content hash in ``map_batches`` → one shuffle of
  ``(hash, id)`` → vectorized sorted-run min-id per partition →
  anti-filter the original rows against the (small) loser-id set
- MinHash + LSH near-dup: shingle → minhash signature per doc
  (vectorized numpy, stateful actor) → explode ``(id, band,
  band_hash, signature)`` rows (fixed bytes/doc, independent of text
  size) → band-bucket shuffle → per-bucket pairwise signature
  agreement in ONE numpy broadcast compare → optional exact-Jaccard
  re-verify shipping text for candidate ids only
- SimHash: 64-bit signature; one ``(id, simhash)`` shuffle +
  sorted-run reduction finds hamming-0 buckets
- n-gram Jaccard: exact verify kernel, exposed standalone
- embedding cosine near-dup: cosine-similarity buckets over an
  embedding column (see ``similarity.py`` for the ANN machinery)

Patterns follow the public LSH literature (Broder '97 shingling /
MinHash; Charikar '02 SimHash) and the ray_guide dedup sketch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _sha64(texts: list[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        out[i] = int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big", signed=True)
    return out


def add_text_hash(ds, text_col: str = "text", out: str = "text_hash"):
    def _f(t: pa.Table) -> pa.Table:
        return t.append_column(out, pa.array(_sha64(t[text_col].to_pylist())))

    return ds.map_batches(_f, batch_format="pyarrow")


def _run_starts(*cols: np.ndarray) -> np.ndarray:
    """Boolean first-of-run mask for sorted parallel key arrays."""
    n = len(cols[0])
    if n == 0:
        return np.zeros(0, dtype=bool)
    change = np.zeros(n - 1, dtype=bool)
    for c in cols:
        change |= c[1:] != c[:-1]
    return np.r_[True, change]


def dedup_exact(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_partitions: int | None = None,
    broadcast_threshold: int = 2_000_000,
    narrow_collect_threshold: int | None = 4_000_000,
    keep_max_col: str | None = None,
):
    """Exact dedup, scale-safe: keep the min-id row per content hash.

    ``keep_max_col``: curation keep-policy — keep the row with the
    LARGEST value of that column instead (ties → min id), e.g. hash
    the NORMALIZED text but keep the longest RAW document.  The policy
    column rides the narrow (hash, id, keep) shuffle; the payload
    still never moves.

    Only ``(text_hash, id)`` travels through the shuffle — the payload
    never moves.  Per partition, losers (every non-min id of a hash)
    fall out of one vectorized sorted-run reduction; the original rows
    are then anti-filtered against the loser ids — broadcast
    (``ray.put`` + ``pc.is_in``) when the loser set is small, else a
    co-partitioned anti join keyed by id (one payload shuffle, no
    driver materialization).  Returns the surviving rows with a
    ``text_hash`` column appended.
    """
    import ray

    from netml_ray.partition import partition_map, partition_map2

    try:
        has_hash = "text_hash" in (ds.schema().names or [])
    except Exception:
        has_hash = False
    # reuse a caller-precomputed (e.g. pre-materialize) hash column so a
    # materialized input isn't re-hashed once per consumer
    hashed = ds if has_hash else add_text_hash(ds, text_col)
    nar_cols = [id_col, "text_hash"] + (
        [keep_max_col] if keep_max_col else [])
    narrow = hashed.select_columns(nar_cols)

    # small-input fast path (same pattern as sessionize.exact_quantiles):
    # below the threshold the narrow (hash, id) side streams to the
    # driver (16 B/row) and the loser set falls out of ONE lexsort —
    # no shuffle at all, which on modest inputs is otherwise pure
    # fixed overhead.  NOTE: counting a LAZY dataset executes it; pass
    # narrow_collect_threshold=None (or materialize first) if the
    # upstream chain is expensive.
    n_rows = ds.count() if narrow_collect_threshold else None
    if n_rows is not None and n_rows <= narrow_collect_threshold:
        ids_l, hs_l, ks_l = [], [], []
        for b in narrow.iter_batches(batch_format="pyarrow",
                                     batch_size=1 << 16):
            ids_l.append(np.asarray(b[id_col].to_numpy(
                zero_copy_only=False)))
            hs_l.append(np.asarray(b["text_hash"].to_numpy(
                zero_copy_only=False)))
            if keep_max_col:
                ks_l.append(np.asarray(b[keep_max_col].to_numpy(
                    zero_copy_only=False)))
        ids = np.concatenate(ids_l) if ids_l else np.empty(0, np.int64)
        hs = np.concatenate(hs_l) if hs_l else np.empty(0, np.int64)
        if keep_max_col:
            kv = np.concatenate(ks_l) if ks_l else np.empty(0, np.int64)
            order = np.lexsort((ids, -kv, hs))
        else:
            order = np.lexsort((ids, hs))
        first = _run_starts(hs[order])
        loser_ids = ids[order][~first]
        if not len(loser_ids):
            return hashed
        drop_ref = ray.put(loser_ids)

        def _anti_fast(t: pa.Table) -> pa.Table:
            drop = ray.get(drop_ref)
            return t.filter(
                pa.array(~np.isin(t[id_col].to_numpy(), drop)))

        return hashed.map_batches(_anti_fast, batch_format="pyarrow")

    def _losers(t: pa.Table) -> pa.Table:
        keys = [("text_hash", "ascending")]
        if keep_max_col:
            keys.append((keep_max_col, "descending"))
        keys.append((id_col, "ascending"))
        t = t.sort_by(keys)
        first = _run_starts(t["text_hash"].to_numpy())
        return t.filter(pa.array(~first)).select([id_col])

    losers = partition_map(narrow, "text_hash", _losers,
                           num_partitions=num_partitions).materialize()
    n_losers = losers.count()
    if n_losers == 0:
        return hashed
    if n_losers <= broadcast_threshold:
        drop_ref = ray.put(losers.to_pandas()[id_col].to_numpy())

        def _anti(t: pa.Table) -> pa.Table:
            drop = ray.get(drop_ref)
            return t.filter(pa.array(~np.isin(t[id_col].to_numpy(), drop)))

        return hashed.map_batches(_anti, batch_format="pyarrow")

    def _anti_part(lt: pa.Table, rt: pa.Table) -> pa.Table:
        return lt.filter(
            pa.array(~np.isin(lt[id_col].to_numpy(), rt[id_col].to_numpy()))
        )

    return partition_map2(hashed, losers, id_col, _anti_part,
                          num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# shingles / MinHash / LSH
# ---------------------------------------------------------------------------

_MIX = (np.uint64(0x9E3779B185EBCA87), np.uint64(0xC2B2AE3D27D4EB4F),
        np.uint64(0x165667B19E3779F9), np.uint64(0x27D4EB2F165667C5),
        np.uint64(0x85EBCA77C2B2AE63))


def _token_hash(tok: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")


class MinHasher:
    """Stateful minhash stage: permutation parameters generated once per
    actor in ``__init__`` (same seed everywhere → identical), and a
    per-actor token-hash cache so blake2b runs once per UNIQUE token —
    shingle hashes are a vectorized mix of consecutive token hashes
    (k ≤ 5), so the per-document hot path is a handful of cache-sized
    numpy calls."""

    def __init__(self, num_perm: int = 64, k: int = 3, text_col: str = "text", seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        if k > len(_MIX):
            raise ValueError(f"k={k} > {len(_MIX)} (extend _MIX for wider shingles)")
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col
        self._tok_cache: dict[str, int] = {}

    def _shingles(self, text: str) -> np.ndarray:
        toks = text.split()
        if len(toks) < self.k:  # short doc: one gram = the whole text
            return np.array([_token_hash(" ".join(toks))], dtype=np.uint64)
        cache = self._tok_cache
        if len(cache) > 2_000_000:  # bound actor memory
            cache.clear()
        th = np.empty(len(toks), dtype=np.uint64)
        for j, w in enumerate(toks):
            v = cache.get(w)
            if v is None:
                v = _token_hash(w)
                cache[w] = v
            th[j] = v
        g = th[: len(toks) - self.k + 1] * _MIX[0]
        for d in range(1, self.k):
            g = g ^ (th[d : len(toks) - self.k + 1 + d] * _MIX[d])
        return g

    def signature(self, text: str) -> np.ndarray:
        h = self._shingles(text)
        # (a*h + b) mod p per permutation, rowwise min.  NOTE: the
        # product wraps mod 2^64 BEFORE the Mersenne mod (uint64
        # arithmetic), so this is a deterministic mixing family, not a
        # textbook universal hash — fine for MinHash banding, where
        # only hash-family independence-in-practice matters.
        vals = (np.outer(h % _MERSENNE, self.a) + self.b) % _MERSENNE
        return vals.min(axis=0).astype(np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(s) for s in t[self.text_col].to_pylist()])
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel().astype(np.uint64)), self.num_perm
        )
        return t.append_column("minhash", col)


def jaccard_ngrams(a: str, b: str, k: int = 3) -> float:
    sa = set(map(tuple, zip(*[a.split()[i:] for i in range(k)]))) if len(a.split()) >= k else {tuple(a.split())}
    sb = set(map(tuple, zip(*[b.split()[i:] for i in range(k)]))) if len(b.split()) >= k else {tuple(b.split())}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_duplicates(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    jaccard_threshold: float = 0.8,
    verify: str = "signature",
    max_bucket: int = 1024,
    num_partitions: int | None = None,
    cand_id_broadcast: int = 20_000_000,
    bucket_collect_threshold: int = 2_000_000,
):
    """MinHash-LSH near-duplicate pairs, scale-safe.

    Returns a Dataset of pairs ``(id_a, id_b, jaccard)`` with
    ``id_a < id_b`` and jaccard ≥ threshold, CLUSTER-EQUIVALENT to the
    full near-dup pair graph: within an identical-signature group
    (exact-duplicate classes — a million copies of the same boilerplate
    would otherwise emit O(g²) pairs) each member pairs with the group
    min id, and cross-signature pairs connect group representatives;
    connected components are identical to the full graph's because the
    estimate between members depends only on their signatures.

    Shuffle accounting (the r2 verdict's ~8× cut): the band exchange
    carries ONLY ``(id, band, band_hash, sig_hash)`` = 32 bytes per
    band row (512 B/doc at 16 bands) — the full signature (8·num_perm
    = 512 B) no longer rides every band row (was ~8.6 KB/doc).
    ``sig_hash`` is an 8-byte digest of the whole signature: equal
    digests ⟹ equal signatures (distinct signatures collide with
    probability ~2⁻⁶⁴ per pair — below any practical corpus size), so
    star compression still works without the signature itself.
    Cross-digest candidate pairs (candidates ≪ docs after banding) get
    their Jaccard estimate in a second pass that joins ONLY the
    candidate ids' signatures (see ``_estimate_pairs_from_sigs``).

    Verification (``verify``):

    - ``"signature"`` (default): jaccard is the unbiased MinHash
      estimate ``mean(sig_a == sig_b)`` (Broder '97), vectorized per
      candidate batch — no per-pair Python, no re-tokenization.
    - ``"text"``: signature-estimated candidates are re-verified with
      exact n-gram Jaccard, shipping text for candidate ids only
      (broadcast below a threshold, co-partitioned join above).

    Hot buckets (low-entropy shingles) are capped at ``max_bucket``
    distinct signatures — reported in worker logs, not silent.
    """
    import ray

    rows_per_band = num_perm // bands
    # the signature stage is the cpu-heavy leg — make sure it can fan
    # out (a driver-built Dataset arrives as ONE block, which would pin
    # the whole stage to one task regardless of the actor pool size)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    try:
        nb = ds.num_blocks()
    except Exception:
        nb = None
    if nb is not None and nb < ncpu:
        ds = ds.repartition(2 * ncpu)
    # materialized once: consumed by the band explode AND the candidate
    # estimate pass (n × ~8·num_perm bytes in the object store — spills
    # if needed; recomputing the signatures would cost more)
    sig_ds = ds.map_batches(
        MinHasher, fn_constructor_kwargs={"num_perm": num_perm, "k": k, "text_col": text_col},
        batch_format="pyarrow", concurrency=(1, ncpu), batch_size=1024,
    ).select_columns([id_col, "minhash"]).materialize()

    _FNV = np.uint64(1099511628211)

    def _explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sigs = np.asarray(t["minhash"].combine_chunks().flatten()).reshape(n, num_perm)
        band_hash = np.empty((n, bands), dtype=np.int64)
        for bi in range(bands):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            # order-dependent mix of the band's minhash values
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * _FNV + seg[:, c]
            band_hash[:, bi] = h.astype(np.int64)
        # 8-byte digest of the FULL signature (see docstring)
        sh = np.zeros(n, dtype=np.uint64)
        for c in range(num_perm):
            sh = sh * _FNV + sigs[:, c]
        rep = np.repeat(np.arange(n, dtype=np.int64), bands)
        return pa.table(
            {
                id_col: pc.take(t[id_col], pa.array(rep)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "band_hash": pa.array(band_hash.ravel()),
                "sig_hash": pa.array(np.repeat(sh.astype(np.int64), bands)),
            }
        )

    exploded = sig_ds.map_batches(_explode, batch_format="pyarrow")

    # one hash partition holds MANY (band, band_hash) buckets — stars
    # and candidate pairs fall out of vectorized sorted-run reductions
    # (no signatures here; only the 8-byte digests)
    def _bucket_cands_part(t: pa.Table) -> pa.Table:
        t = t.sort_by([("band", "ascending"), ("band_hash", "ascending"),
                       ("sig_hash", "ascending"), (id_col, "ascending")])
        n = t.num_rows
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "star": pa.array([], type=pa.bool_())})
        if n == 0:
            return empty
        bnd = t["band"].to_numpy()
        hashes = t["band_hash"].to_numpy()
        sh = t["sig_hash"].to_numpy()
        ids = t[id_col].to_numpy()
        out_a, out_b, out_s = [], [], []
        bstart = _run_starts(bnd, hashes)
        gstart = _run_starts(bnd, hashes, sh)
        # stars: within an identical-digest group each member pairs
        # with the group's first (= min id; sorted) — est exactly 1.0.
        # Identical signatures ⟹ identical band hashes in EVERY band,
        # so the group (and its pairs) recurs in all ``bands`` buckets;
        # emitting from band 0 only yields each star pair exactly once
        # — no downstream dedup shuffle needed for stars.
        grun = np.cumsum(gstart) - 1
        gfirst = np.flatnonzero(gstart)
        rep_per_pos = ids[gfirst][grun]
        nonrep = ~gstart & (bnd == 0)
        if nonrep.any():
            out_a.append(rep_per_pos[nonrep])
            out_b.append(ids[nonrep])
            out_s.append(np.ones(int(nonrep.sum()), dtype=bool))
        # cross-digest candidates: one representative per group
        rep_ids = ids[gfirst]
        brun = np.cumsum(bstart) - 1
        rep_bucket = brun[gfirst]
        kcounts = np.bincount(rep_bucket, minlength=brun[-1] + 1)
        rstart = np.r_[0, np.cumsum(kcounts)]
        # fast path: buckets with exactly 2 distinct signatures (the
        # overwhelming majority) — fully vectorized
        two_b = np.flatnonzero(kcounts == 2)
        if len(two_b):
            i0 = rstart[two_b]
            a, b = rep_ids[i0], rep_ids[i0 + 1]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_s.append(np.zeros(len(two_b), dtype=bool))
        n_capped = 0
        for bidx in np.flatnonzero(kcounts > 2):
            s, e = rstart[bidx], rstart[bidx + 1]
            reps = rep_ids[s:e]
            m = e - s
            if m > max_bucket:
                n_capped += 1
                reps = np.sort(reps)[:max_bucket]
                m = max_bucket
            iu, ju = np.triu_indices(m, 1)
            ra, rb = reps[iu], reps[ju]
            out_a.append(np.minimum(ra, rb))
            out_b.append(np.maximum(ra, rb))
            out_s.append(np.zeros(len(ra), dtype=bool))
        if n_capped:
            print(f"minhash_lsh: capped {n_capped} hot buckets at "
                  f"{max_bucket} distinct signatures (raise max_bucket "
                  f"or bands)")
        if not out_a:
            return empty
        return pa.table({"id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                         "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                         "star": pa.array(np.concatenate(out_s))})

    from netml_ray.partition import partition_map

    # stars are unique by construction (band-0-only emission);
    # cross-digest candidates can recur across bands and are deduped
    # inside the estimate pass where the pairs are already driver- or
    # co-partition-local — no standalone dedup shuffle.
    # Small-corpus fast path (same pattern as dedup_exact): below ~2M
    # band rows (32 B each) the exploded narrow table streams to the
    # driver and the bucket fn — a pure pa.Table→pa.Table kernel —
    # runs once locally, skipping the groupby shuffle that at this
    # size is pure fixed overhead.
    import ray.data as rd

    n_docs = sig_ds.count()
    if n_docs * bands <= bucket_collect_threshold:
        parts = [b for b in exploded.iter_batches(batch_format="pyarrow",
                                                  batch_size=1 << 18)]
        whole = (pa.concat_tables(parts) if parts else
                 pa.table({id_col: pa.array([], type=pa.int64()),
                           "band": pa.array([], type=pa.int64()),
                           "band_hash": pa.array([], type=pa.int64()),
                           "sig_hash": pa.array([], type=pa.int64())}))
        cand = rd.from_arrow(_bucket_cands_part(whole))
    else:
        cand = partition_map(exploded, "band_hash", _bucket_cands_part,
                             num_partitions=num_partitions).materialize()

    def _mk_stars(t: pa.Table) -> pa.Table:
        t2 = t.filter(t["star"])
        return pa.table({"id_a": t2["id_a"], "id_b": t2["id_b"],
                         "jaccard": pa.array(np.ones(t2.num_rows))})

    stars = cand.map_batches(_mk_stars, batch_format="pyarrow")
    xs = cand.map_batches(
        lambda t: t.filter(pc.invert(t["star"].combine_chunks())).drop_columns(["star"]),
        batch_format="pyarrow")
    est = _estimate_pairs_from_sigs(
        xs, sig_ds, id_col=id_col, num_perm=num_perm,
        jaccard_threshold=jaccard_threshold, num_partitions=num_partitions,
        cand_id_broadcast=cand_id_broadcast)
    pairs = stars.union(est)
    if verify == "text":
        pairs = verify_pairs_text(pairs, ds, text_col=text_col, id_col=id_col,
                                  k=k, jaccard_threshold=jaccard_threshold)
    return pairs


def _dedup_pairs_part(t: pa.Table) -> pa.Table:
    """Keep the first row per (id_a, id_b) in a sorted partition."""
    t = t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
    first = _run_starts(t["id_a"].to_numpy(), t["id_b"].to_numpy())
    return t.filter(pa.array(first))


def _estimate_pairs_from_sigs(
    xs,
    sig_ds,
    *,
    id_col: str,
    num_perm: int,
    jaccard_threshold: float,
    num_partitions: int | None,
    cand_id_broadcast: int = 20_000_000,
):
    """Jaccard-estimate candidate pairs from the signature table.

    Candidates ≪ docs after banding, so the signature table is first
    narrowed to candidate ids — via a broadcast id set (map-side, no
    shuffle) when the candidate set is small, else a co-partitioned
    semi join.  Tiering: when the candidate signatures themselves fit
    a modest broadcast (≤256 MB) the estimate is ONE broadcast map
    over the pairs; otherwise the signatures are attached with two
    co-partitioned searchsorted joins.  Pairs with
    ``mean(sig_a == sig_b) ≥ threshold`` survive.
    """
    import ray
    import ray.data as rd

    from netml_ray.partition import partition_map, partition_map2

    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "jaccard": pa.array([], type=pa.float64())})
    n_x = xs.count()
    if n_x == 0:
        return rd.from_arrow(empty)

    if 2 * n_x <= cand_id_broadcast:
        pdf = xs.select_columns(["id_a", "id_b"]).to_pandas()
        # candidates recur when signatures agree on several bands —
        # dedup here on the (already driver-resident) pair frame
        # instead of paying a standalone pair shuffle upstream
        pdf = pdf.drop_duplicates(["id_a", "id_b"], ignore_index=True)
        xs = rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))
        if len(pdf) > (1 << 18):  # fan the single driver block back out
            xs = xs.repartition(-(-len(pdf) // (1 << 17)))
        cand_ids = np.unique(np.r_[pdf["id_a"].to_numpy(),
                                   pdf["id_b"].to_numpy()])
        id_ref = ray.put(cand_ids)

        def _filter_sigs(t: pa.Table) -> pa.Table:
            keep = np.isin(t[id_col].to_numpy(), ray.get(id_ref))
            return t.filter(pa.array(keep))

        csigs = sig_ds.map_batches(_filter_sigs,
                                   batch_format="pyarrow").materialize()

        if len(cand_ids) * num_perm * 8 <= 256 << 20:
            # small-candidate fast tier: broadcast the candidate
            # signatures once and estimate in a single map — skips two
            # co-partitioned shuffles (the common case: pairs ≪ docs)
            sids_l, smat_l = [], []
            for b in csigs.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 16):
                sids_l.append(b[id_col].to_numpy())
                smat_l.append(np.asarray(
                    b["minhash"].combine_chunks().flatten()).reshape(
                        b.num_rows, num_perm))
            sids = np.concatenate(sids_l)
            smat = np.concatenate(smat_l)
            order = np.argsort(sids)
            sig_ref = ray.put((sids[order], np.ascontiguousarray(smat[order])))

            def _est_bcast(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return empty
                sids2, smat2 = ray.get(sig_ref)
                a = t["id_a"].to_numpy()
                b = t["id_b"].to_numpy()
                ia = np.searchsorted(sids2, a)
                ib = np.searchsorted(sids2, b)
                if not ((sids2[ia] == a).all() and (sids2[ib] == b).all()):
                    raise RuntimeError(
                        "candidate id missing from signature table")
                j = (smat2[ia] == smat2[ib]).mean(axis=1)
                keep = j >= jaccard_threshold
                return pa.table({"id_a": pa.array(a[keep]),
                                 "id_b": pa.array(b[keep]),
                                 "jaccard": pa.array(j[keep])})

            return xs.map_batches(_est_bcast, batch_format="pyarrow")
    else:
        # co-partitioned semi join: candidate ids (narrow) against the
        # signature table — no driver materialization of the id set
        def _pair_ids(t: pa.Table) -> pa.Table:
            ids = np.unique(np.r_[t["id_a"].to_numpy(), t["id_b"].to_numpy()])
            return pa.table({id_col: pa.array(ids)})

        ids_ds = xs.map_batches(_pair_ids, batch_format="pyarrow")

        def _semi(lt: pa.Table, rt: pa.Table) -> pa.Table:
            keep = np.isin(lt[id_col].to_numpy(), rt[id_col].to_numpy())
            return lt.filter(pa.array(keep))

        csigs = partition_map2(sig_ds, ids_ds, id_col, _semi,
                               num_partitions=num_partitions).materialize()

    def _attach(out_name: str, keyname: str, dedup_lt: bool = False):
        def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
            if lt.num_rows == 0:
                return lt.append_column(
                    out_name, pa.nulls(0, type=rt.schema.field("__sig").type))
            if dedup_lt:
                # cross-band duplicate candidates co-locate here (the
                # join partitions by id_a) — drop them before attaching
                lt = lt.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
                first = _run_starts(lt["id_a"].to_numpy(),
                                    lt["id_b"].to_numpy())
                lt = lt.filter(pa.array(first))
            rk = rt[keyname].to_numpy()
            lk = lt[keyname].to_numpy()
            order = np.argsort(rk, kind="stable")
            pos = np.searchsorted(rk[order], lk)
            pos = np.clip(pos, 0, max(len(rk) - 1, 0))
            if len(rk) == 0 or not (rk[order][pos] == lk).all():
                raise RuntimeError("candidate id missing from signature table")
            sig = pc.take(rt["__sig"], pa.array(order[pos]))
            return lt.append_column(out_name, sig)

        return _fn

    def _rename(keyname: str):
        return lambda t: pa.table({keyname: t[id_col], "__sig": t["minhash"]})

    j1 = partition_map2(
        xs, csigs.map_batches(_rename("id_a"), batch_format="pyarrow"),
        "id_a", _attach("__sig_a", "id_a", dedup_lt=True),
        num_partitions=num_partitions)
    j2 = partition_map2(
        j1, csigs.map_batches(_rename("id_b"), batch_format="pyarrow"),
        "id_b", _attach("__sig_b", "id_b"), num_partitions=num_partitions)

    def _est(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty
        sa = np.asarray(t["__sig_a"].combine_chunks().flatten()).reshape(n, num_perm)
        sb = np.asarray(t["__sig_b"].combine_chunks().flatten()).reshape(n, num_perm)
        j = (sa == sb).mean(axis=1)
        keep = j >= jaccard_threshold
        return pa.table({"id_a": pa.array(t["id_a"].to_numpy()[keep]),
                         "id_b": pa.array(t["id_b"].to_numpy()[keep]),
                         "jaccard": pa.array(j[keep])})

    return j2.map_batches(_est, batch_format="pyarrow")


def _pair_shingle_jaccard(a: np.ndarray, b: np.ndarray, texts, k: int,
                          cache: dict | None = None):
    """Exact n-gram Jaccard per pair; shingle sets built once per
    unique id — in the per-call dict, or in a caller-owned ``cache``
    that persists across batches (ids recur between candidate batches,
    so an actor-held cache skips repeat tokenization)."""
    shingles: dict[int, frozenset] = cache if cache is not None else {}

    def _sh(i: int) -> frozenset:
        s = shingles.get(i)
        if s is None:
            toks = texts[i].split()
            if len(toks) < k:
                s = frozenset([tuple(toks)])
            else:
                s = frozenset(zip(*[toks[j:] for j in range(k)]))
            shingles[i] = s
        return s

    return np.fromiter(
        (len(_sh(int(x)) & _sh(int(y))) / max(1, len(_sh(int(x)) | _sh(int(y))))
         for x, y in zip(a, b)),
        dtype=np.float64, count=len(a),
    )


def verify_pairs_text(pairs, ds, *, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      jaccard_threshold: float = 0.8,
                      broadcast_threshold: int = 2_000_000,
                      broadcast_byte_budget: int = 256 * 2**20,
                      num_partitions: int | None = None):
    """Re-verify candidate pairs with exact n-gram Jaccard, shipping
    text for the CANDIDATE ids only (candidates ≪ docs after banding).

    The broadcast path needs BOTH gates: at most
    ``broadcast_threshold`` candidate ids (cheap early exit before any
    text is touched) AND at most ``broadcast_byte_budget`` of
    candidate text — an id count alone would let 2M multi-KB docs ride
    through ``ray.put`` as GBs.  The byte check measures the actual
    filtered candidate texts (materialized in the object store, never
    on the driver) before collecting.  Above either limit — a
    pathological corpus or mis-set LSH params — the distributed path
    kicks in (r2 verdict #7): candidate texts are attached to each
    pair with two co-partitioned joins, so nothing is driver-collected
    and the exact-Jaccard kernel runs where the pairs land.
    """
    import ray

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pairs

    if 2 * n_pairs > broadcast_threshold:
        return _verify_pairs_text_distributed(
            pairs, ds, text_col=text_col, id_col=id_col, k=k,
            jaccard_threshold=jaccard_threshold,
            num_partitions=num_partitions)

    pdf = pairs.select_columns(["id_a", "id_b"]).to_pandas()
    cand_ids = np.unique(np.r_[pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy()])
    id_ref = ray.put(cand_ids)

    def _filter_cand(t: pa.Table) -> pa.Table:
        keep = np.isin(t[id_col].to_numpy(), ray.get(id_ref))
        return t.filter(pa.array(keep)).select([id_col, text_col])

    cand_ds = ds.map_batches(_filter_cand, batch_format="pyarrow").materialize()
    if cand_ds.size_bytes() > broadcast_byte_budget:
        return _verify_pairs_text_distributed(
            pairs, ds, text_col=text_col, id_col=id_col, k=k,
            jaccard_threshold=jaccard_threshold,
            num_partitions=num_partitions)
    cand_docs = cand_ds.to_pandas()
    text_ref = ray.put(dict(zip(cand_docs[id_col], cand_docs[text_col])))

    from netml_ray.partition import auto_concurrency

    class _Verify:
        """Stateful verify stage: the broadcast text dict is fetched
        once per actor, and shingle sets persist across batches (ids
        recur between candidate batches)."""

        def __init__(self):
            self.texts = ray.get(text_ref)
            self.shingles: dict[int, frozenset] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(self.shingles) > 500_000:  # bound actor memory
                self.shingles.clear()
            a = t["id_a"].to_numpy()
            b = t["id_b"].to_numpy()
            jac = _pair_shingle_jaccard(a, b, self.texts, k,
                                        cache=self.shingles)
            keep = jac >= jaccard_threshold
            return pa.table({"id_a": pa.array(a[keep]),
                             "id_b": pa.array(b[keep]),
                             "jaccard": pa.array(jac[keep])})

    return pairs.map_batches(_Verify, batch_format="pyarrow",
                             concurrency=auto_concurrency())


def _verify_pairs_text_distributed(pairs, ds, *, text_col: str,
                                   id_col: str, k: int,
                                   jaccard_threshold: float,
                                   num_partitions: int | None):
    """Co-partitioned exact-text verify: semi-join the corpus down to
    candidate ids (narrow id shuffle), then attach each side's text to
    the pair rows with two co-partitioned searchsorted joins — output
    identical to the broadcast path (pinned by tests)."""
    from netml_ray.partition import partition_map2

    def _pair_ids(t: pa.Table) -> pa.Table:
        ids = np.unique(np.r_[t["id_a"].to_numpy(), t["id_b"].to_numpy()])
        return pa.table({id_col: pa.array(ids)})

    ids_ds = pairs.map_batches(_pair_ids, batch_format="pyarrow")

    def _semi(lt: pa.Table, rt: pa.Table) -> pa.Table:
        keep = np.isin(lt[id_col].to_numpy(), rt[id_col].to_numpy())
        return lt.filter(pa.array(keep))

    ctexts = partition_map2(
        ds.select_columns([id_col, text_col]), ids_ds, id_col, _semi,
        num_partitions=num_partitions).materialize()

    def _attach(out_name: str, keyname: str):
        def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
            if lt.num_rows == 0:
                return lt.append_column(
                    out_name, pa.nulls(0, type=rt.schema.field("__txt").type))
            rk = rt[keyname].to_numpy()
            lk = lt[keyname].to_numpy()
            order = np.argsort(rk, kind="stable")
            pos = np.searchsorted(rk[order], lk)
            pos = np.clip(pos, 0, max(len(rk) - 1, 0))
            if len(rk) == 0 or not (rk[order][pos] == lk).all():
                raise RuntimeError("candidate id missing from corpus")
            txt = pc.take(rt["__txt"], pa.array(order[pos]))
            return lt.append_column(out_name, txt)

        return _fn

    def _rename(keyname: str):
        return lambda t: pa.table({keyname: t[id_col], "__txt": t[text_col]})

    j1 = partition_map2(
        pairs.select_columns(["id_a", "id_b"]),
        ctexts.map_batches(_rename("id_a"), batch_format="pyarrow"),
        "id_a", _attach("__txt_a", "id_a"), num_partitions=num_partitions)
    j2 = partition_map2(
        j1, ctexts.map_batches(_rename("id_b"), batch_format="pyarrow"),
        "id_b", _attach("__txt_b", "id_b"), num_partitions=num_partitions)

    from netml_ray.partition import auto_concurrency

    class _Verify:
        """Stateful verify stage: texts arrive attached per batch, but
        ids recur across batches — a per-actor shingle cache (text per
        id is constant) skips repeat tokenization (r3 queue #6)."""

        def __init__(self):
            self.shingles: dict[int, frozenset] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(self.shingles) > 500_000:  # bound actor memory
                self.shingles.clear()
            a = t["id_a"].to_numpy()
            b = t["id_b"].to_numpy()
            # per-batch id→text map (texts already co-located with pairs)
            texts = {}
            ta = t["__txt_a"].to_pylist()
            tb = t["__txt_b"].to_pylist()
            for i, x in enumerate(a):
                texts[int(x)] = ta[i]
            for i, x in enumerate(b):
                texts[int(x)] = tb[i]
            jac = _pair_shingle_jaccard(a, b, texts, k,
                                        cache=self.shingles)
            keep = jac >= jaccard_threshold
            return pa.table({"id_a": pa.array(a[keep]),
                             "id_b": pa.array(b[keep]),
                             "jaccard": pa.array(jac[keep])})

    return j2.map_batches(_Verify, batch_format="pyarrow",
                          concurrency=auto_concurrency())


def connected_components(pairs, *, max_iters: int = 50,
                         num_partitions: int | None = None):
    """Distributed connected components over an edge Dataset
    ``(id_a, id_b)`` by iterated min-label propagation — the at-scale
    replacement for driver-side union-find when the verified pair list
    itself is too large to collect.

    Each round: every node takes the minimum label among itself and its
    neighbors (two narrow (node, label) exchanges per round); stops
    when a round changes nothing.  Rounds needed = graph diameter —
    near-dup clusters are small/dense, so convergence is fast; a
    chain-shaped component longer than ``max_iters`` hops would NOT
    have converged, so non-convergence raises instead of silently
    returning wrong clusters (ADVICE r2).
    Returns a Dataset ``(doc_id, cluster)`` covering every node that
    appears in ``pairs`` (cluster = component's min id).
    """
    import ray
    from ray.data.aggregate import Min

    from netml_ray.partition import partition_map

    pairs = pairs.select_columns(["id_a", "id_b"]).materialize()

    # labels: every endpoint starts as its own label
    def _nodes(t: pa.Table) -> pa.Table:
        ids = np.unique(np.r_[t["id_a"].to_numpy(), t["id_b"].to_numpy()])
        return pa.table({"doc_id": pa.array(ids)})

    def _dedup_nodes(t: pa.Table) -> pa.Table:
        ids = np.unique(t["doc_id"].to_numpy())
        return pa.table({"doc_id": pa.array(ids),
                         "cluster": pa.array(ids)})

    from netml_ray.partition import drop_empty_blocks

    labels = drop_empty_blocks(partition_map(
        pairs.map_batches(_nodes, batch_format="pyarrow"),
        "doc_id", _dedup_nodes, num_partitions=num_partitions).materialize())

    prev_sum = labels.sum("cluster")
    converged = False
    for _ in range(max_iters):
        # propose: each edge sends each endpoint's label to the other
        lab_a = _attach_labels(pairs, labels, "id_a", "lab_a", num_partitions)
        both = _attach_labels(lab_a, labels, "id_b", "lab_b", num_partitions)

        def _proposals(t: pa.Table) -> pa.Table:
            la = t["lab_a"].to_numpy()
            lb = t["lab_b"].to_numpy()
            m = np.minimum(la, lb)
            return pa.table({
                "doc_id": pa.array(np.r_[t["id_a"].to_numpy(), t["id_b"].to_numpy()]),
                "cluster": pa.array(np.r_[m, m]),
            })

        prop = both.map_batches(_proposals, batch_format="pyarrow")
        # scrub schema-less empty blocks each round: they otherwise
        # accumulate through the union and have been observed to wedge
        # the streaming executor after ~10 rounds (see drop_empty_blocks)
        new_labels = drop_empty_blocks(
            prop.union(labels).groupby("doc_id").aggregate(
                Min("cluster", alias_name="cluster")).materialize())
        # labels only ever DECREASE, so the global label sum strictly
        # decreases iff anything changed — one cheap scalar aggregate
        # instead of a co-partitioned table compare
        new_sum = new_labels.sum("cluster")
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge after {max_iters} "
            f"rounds (a component's diameter exceeds max_iters); raise "
            f"max_iters")
    return labels


def _attach_labels(edges, labels, key_col: str, out_col: str,
                   num_partitions):
    """Co-partitioned join: edge rows pick up the label of ``key_col``."""
    from netml_ray.partition import partition_map2

    lab = labels.map_batches(
        lambda t: pa.table({key_col: t["doc_id"], "__lab": t["cluster"]}),
        batch_format="pyarrow")

    def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        lv = lt[key_col].to_numpy()
        rk = rt[key_col].to_numpy()
        rl = rt["__lab"].to_numpy()
        order = np.argsort(rk, kind="stable")
        pos = np.searchsorted(rk[order], lv)
        pos = np.clip(pos, 0, max(len(rk) - 1, 0))
        found = len(rk) > 0 and True
        lab = rl[order][pos] if len(rk) else np.zeros(len(lv), dtype=np.int64)
        ok = (rk[order][pos] == lv) if len(rk) else np.zeros(len(lv), bool)
        # every edge endpoint has a label by construction
        if not ok.all():
            raise RuntimeError("edge endpoint missing from label table")
        return lt.append_column(out_col, pa.array(lab))

    return partition_map2(edges, lab, key_col, _fn,
                          num_partitions=num_partitions)


def minhash_dedup_keep(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    jaccard_threshold: float = 0.8,
    components: str = "driver",
    verify: str = "signature",
):
    """Full near-dup dedup: LSH candidate pairs → connected components →
    keep each cluster's minimum id.  Returns (keep_ids_ds, clusters_df).

    ``components="driver"`` (default): union-find over the collected
    pair list — pairs ≪ docs after verification (ray_guide dedup note).
    ``components="distributed"``: iterated min-label propagation over
    the pair Dataset (``connected_components``) — the extreme-scale
    path where even the pair list is too large to collect; results are
    identical (pinned by tests).

    ``verify`` forwards to ``minhash_lsh_duplicates`` (ADVICE r2):
    ``"signature"`` (default) keeps the unbiased MinHash estimate —
    std ≈ 0.05 near threshold 0.8 at num_perm=64, so borderline docs
    (true Jaccard ~0.7) can be deleted; pass ``"text"`` to restore
    exact n-gram Jaccard verification before anything is dropped.
    """
    import ray

    pairs_ds = minhash_lsh_duplicates(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, k=k, jaccard_threshold=jaccard_threshold,
        verify=verify,
    )
    if components == "distributed":
        clusters = connected_components(pairs_ds).to_pandas()
        clusters = clusters.sort_values(["cluster", "doc_id"]).reset_index(drop=True)
        drop = clusters.loc[clusters["doc_id"] != clusters["cluster"],
                            "doc_id"].to_numpy().astype(np.int64)
        drop_ref = ray.put(drop)

        def _keep_d(t: pa.Table) -> pa.Table:
            d = ray.get(drop_ref)
            return t.filter(pa.array(~np.isin(t[id_col].to_numpy(), d)))

        return ds.map_batches(_keep_d, batch_format="pyarrow"), clusters

    pairs = pairs_ds.to_pandas()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = np.fromiter((x for x in parent if find(x) != x), dtype=np.int64)
    drop_ref = ray.put(drop)

    def _keep(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        return t.filter(pa.array(~np.isin(t[id_col].to_numpy(), d)))

    clusters = pd.DataFrame(
        {"doc_id": list(parent), "cluster": [find(x) for x in parent]}
    ).sort_values(["cluster", "doc_id"]).reset_index(drop=True)
    return ds.map_batches(_keep, batch_format="pyarrow"), clusters


class SimHasher:
    """64-bit SimHash over word features (Charikar '02).

    The hot path (``__call__``) hashes each UNIQUE token once — a
    per-actor token→hash cache (the ``MinHasher._tok_cache`` pattern)
    means blake2b runs only on vocabulary misses, and within a doc the
    ±1 bit votes are weighted by occurrence count instead of being
    re-summed per occurrence (``Σ_occurrences ±1 ≡ Σ_unique count·±1``,
    so the signature is bit-identical to the reference form).
    ``simhash64`` keeps the direct per-occurrence definition as the
    pinned reference (pytest asserts cached == reference)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self._tok_cache: dict[str, int] = {}

    _SHIFTS = np.arange(64, dtype=np.uint64)

    @classmethod
    def simhash64(cls, text: str) -> int:
        """Reference (uncached, per-occurrence) SimHash definition."""
        words = text.split()
        if not words:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
             for w in words),
            dtype=np.uint64, count=len(words),
        )
        bits = (hs[:, None] >> cls._SHIFTS[None, :]) & np.uint64(1)
        v = np.where(bits == 1, 1, -1).sum(axis=0)
        out = int(((v > 0).astype(np.uint64) << cls._SHIFTS).sum(dtype=np.uint64))
        return out - (1 << 64) if out >= (1 << 63) else out  # reinterpret as int64

    def simhash64_cached(self, text: str) -> int:
        """Cached equivalent: hash unique tokens (cache hits skip the
        digest), weight bit votes by token count."""
        words = text.split()
        if not words:
            return 0
        from collections import Counter
        cnt = Counter(words)
        cache = self._tok_cache
        if len(cache) > 2_000_000:  # bound actor memory
            cache.clear()
        n = len(cnt)
        hs = np.empty(n, dtype=np.uint64)
        w = np.empty(n, dtype=np.int64)
        for j, (tok, c) in enumerate(cnt.items()):
            v = cache.get(tok)
            if v is None:
                v = _token_hash(tok)
                cache[tok] = v
            hs[j] = v
            w[j] = c
        bits = (hs[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)
        v = (np.where(bits == 1, 1, -1) * w[:, None]).sum(axis=0)
        out = int(((v > 0).astype(np.uint64) << self._SHIFTS).sum(dtype=np.uint64))
        return out - (1 << 64) if out >= (1 << 63) else out

    _CHUNK = 128  # docs per numpy pass: temporaries stay L2-resident
    # (measured on the bench corpus: 128 → 1.99 s / 50k docs vs 512 →
    # 2.41 s and 3.68 s for the per-doc cached path; 44.2 s reference)

    def _sig_chunked(self, batch_texts: list) -> np.ndarray:
        """Batch path: the Python loop only tokenizes + resolves the
        token cache into flat (hash, count) arrays; ALL bit arithmetic
        runs once per ``_CHUNK`` docs.  ``v_b = Σ count·(±1) =
        2·Σ count·bit_b − Σ count``, so only the weighted bit sums and
        the occurrence totals are reduced (``np.add.reduceat`` at doc
        boundaries) — no ±1 expansion.  Bit-identical to ``simhash64``
        (pytest-pinned)."""
        from collections import Counter

        out = np.zeros(len(batch_texts), dtype=np.int64)
        cache = self._tok_cache
        for c0 in range(0, len(batch_texts), self._CHUNK):
            sub = batch_texts[c0:c0 + self._CHUNK]
            if len(cache) > 2_000_000:  # bound actor memory
                cache.clear()
            hs_l: list[int] = []
            w_l: list[int] = []
            starts = [0]
            for s in sub:
                for tok, cn in Counter(s.split()).items():
                    v = cache.get(tok)
                    if v is None:
                        v = _token_hash(tok)
                        cache[tok] = v
                    hs_l.append(v)
                    w_l.append(cn)
                starts.append(len(hs_l))
            if not hs_l:
                continue
            # trailing zero-weight sentinel row: a trailing empty doc's
            # start == len(hs_l) stays a VALID reduceat index (pointing
            # at the sentinel) without stealing the preceding segment's
            # last token.  Middle empty segments return a[start]
            # (garbage) per reduceat semantics — masked below; their
            # neighbors are unaffected.
            hs = np.array(hs_l + [0], dtype=np.uint64)
            w = np.array(w_l + [0], dtype=np.int64)
            bits = ((hs[:, None] >> self._SHIFTS[None, :])
                    & np.uint64(1)).view(np.int64)
            contrib = bits * w[:, None]
            starts_arr = np.array(starts[:-1])
            tot_w = np.add.reduceat(w, starts_arr)
            ones = np.add.reduceat(contrib, starts_arr, axis=0)
            empty = np.diff(starts) == 0
            v = 2 * ones - tot_w[:, None]
            sig = ((v > 0).astype(np.uint64)
                   << self._SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
            sig[empty] = np.uint64(0)
            out[c0:c0 + len(sub)] = sig.view(np.int64)
        return out

    def _hash_dictionary(self, dictionary) -> np.ndarray:
        """blake2b per UNIQUE dictionary token (per-actor cache makes
        repeat vocabulary free across batches) — the ONLY remaining
        Python loop in the vectorized path, and it runs over the
        batch's dictionary, not its token stream."""
        cache = self._tok_cache
        if len(cache) > 2_000_000:  # bound actor memory
            cache.clear()
        toks = dictionary.to_pylist()
        out = np.empty(len(toks), dtype=np.uint64)
        for j, tok in enumerate(toks):
            v = cache.get(tok)
            if v is None:
                v = _token_hash(tok)
                cache[tok] = v
            out[j] = v
        return out

    # tokens per bit-matrix slice: the unpacked (chunk, 64) int32 bits
    # must stay cache-resident — measured on the bench corpus (50k
    # docs, throttled window): 2^11 → 1.05 s, 2^13 → 1.84, 2^17 →
    # 4.04 vs 1.97 for the per-doc chunked path
    _TOK_CHUNK = 1 << 11

    def _sig_vectorized(self, col) -> np.ndarray:
        """Whitespace-safe batch path: ONE Arrow tokenization
        (split + dictionary encode), blake2b only on the dictionary,
        bit votes via np.unpackbits + one axis-0 reduceat per slice —
        no per-doc Python.  Bit-identical to ``simhash64``
        (pytest-pinned): v_b = Σ_occ (±1) = 2·Σ_occ bit_b − n_tok."""
        from netml_ray.textops import Tokenized

        tok = Tokenized(col)
        n = len(tok.n_words)
        out = np.zeros(n, dtype=np.int64)
        if n == 0 or not len(tok.codes):
            return out
        h = self._hash_dictionary(tok.dictionary)[tok.codes]
        doc_tok = np.diff(tok.offsets)
        d0 = 0
        while d0 < n:
            # largest doc prefix whose token total fits the slice
            # budget (a single over-budget doc goes alone)
            d1 = int(np.searchsorted(tok.offsets,
                                     tok.offsets[d0] + self._TOK_CHUNK,
                                     side="right")) - 1
            d1 = min(max(d1, d0 + 1), n)
            t0, t1 = int(tok.offsets[d0]), int(tok.offsets[d1])
            hs = np.ascontiguousarray(h[t0:t1])
            # little-endian byte view → column j == bit j of the hash
            bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8),
                                 axis=1, bitorder="little")
            starts = (tok.offsets[d0:d1] - t0).astype(np.int64)
            ones = np.add.reduceat(bits.astype(np.int32), starts, axis=0)
            # reduceat returns a[start] rows for empty segments —
            # masked below via n_words
            v = 2 * ones.astype(np.int64) - doc_tok[d0:d1, None]
            sig = ((v > 0).astype(np.uint64)
                   << self._SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
            out[d0:d1] = sig.view(np.int64)
            d0 = d1
        out[tok.n_words == 0] = 0
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        from netml_ray.textops import _WS_DANGER

        col = t[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # RE2 \s is ASCII-only while the reference tokenization is
        # Python str.split() (full Unicode) — rows containing any of
        # the difference set take the per-doc cached fallback (same
        # guard discipline as textops extraction)
        unsafe = np.asarray(pc.match_substring_regex(
            col, _WS_DANGER).to_numpy(zero_copy_only=False), dtype=bool)
        sigs = np.zeros(t.num_rows, dtype=np.int64)
        if (~unsafe).any():
            idx = np.flatnonzero(~unsafe)
            sigs[idx] = self._sig_vectorized(col.take(pa.array(idx)))
        if unsafe.any():
            idx = np.flatnonzero(unsafe)
            sigs[idx] = self._sig_chunked(col.take(pa.array(idx)).to_pylist())
        return t.append_column("simhash", pa.array(sigs))


def simhash_duplicates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                       num_partitions: int | None = None):
    """Docs sharing an identical 64-bit simhash (hamming-0 buckets).

    Scale-safe: only ``(id, simhash)`` is shuffled (hash-partitioned by
    simhash), and duplicate runs fall out of one vectorized sorted-run
    reduction per partition — no per-bucket Python dispatch, no text
    movement.
    """
    from netml_ray.partition import auto_concurrency, partition_map

    sig = ds.map_batches(SimHasher, fn_constructor_kwargs={"text_col": text_col},
                         batch_format="pyarrow", concurrency=auto_concurrency(),
                         ).select_columns([id_col, "simhash"])

    def _dups(t: pa.Table) -> pa.Table:
        t = t.sort_by([("simhash", "ascending"), (id_col, "ascending")])
        s = t["simhash"].to_numpy()
        first = _run_starts(s)
        run_id = np.cumsum(first) - 1
        counts = np.bincount(run_id, minlength=run_id[-1] + 1 if len(run_id) else 0)
        return t.filter(pa.array(counts[run_id] >= 2))

    return partition_map(sig, "simhash", _dups, num_partitions=num_partitions)


_POPLUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1).astype(np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (uint8-view + LUT; numpy<2 has no
    native bit_count ufunc)."""
    u = np.ascontiguousarray(x.astype(np.uint64))
    return _POPLUT[u.view(np.uint8)].reshape(len(u), 8).sum(
        axis=1).astype(np.int64)


def simhash_near_duplicates(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1024,
    num_partitions: int | None = None,
):
    """Near-duplicate pairs with ``hamming(simhash_a, simhash_b) ≤
    max_hamming``, scale-safe.

    Pigeonhole LSH (Charikar '02 signatures; banding per the public
    Manku/Jain/Sarma WWW'07 near-dup detection scheme): the 64-bit
    simhash splits into ``max_hamming + 1`` contiguous bands — any
    pair within hamming k must agree EXACTLY on at least one band
    (pigeonhole), so bucketing by (band, band_bits) has perfect
    recall.  The shuffle carries only ``(id, bkey, simhash)`` = 24 B
    per band row; per bucket, identical-simhash groups star-compress
    to their min id (hamming 0 — the cluster-equivalence argument of
    ``minhash_lsh_duplicates``) and distinct-signature
    representatives verify with ONE vectorized XOR-popcount block.
    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``, deduped
    across bands.  Hot buckets cap at ``max_bucket`` distinct
    signatures (logged, not silent).
    """
    from netml_ray.partition import auto_concurrency

    sig_ds = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", concurrency=auto_concurrency(),
    ).select_columns([id_col, "simhash"])
    return hamming_near_duplicates(
        sig_ds, id_col=id_col, hash_col="simhash",
        max_hamming=max_hamming, max_bucket=max_bucket,
        num_partitions=num_partitions)


def hamming_near_duplicates(
    sig_ds,
    *,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    max_bucket: int = 1024,
    num_partitions: int | None = None,
):
    """Banded-hamming near-duplicate pairs over ANY ``(id, 64-bit
    hash)`` signature Dataset — the generic core under
    :func:`simhash_near_duplicates` (text) and the image dHash dedup
    (``multimodal.ImageDHash``).  Same pigeonhole banding, star
    compression, XOR-popcount verification and hot-bucket cap; see
    the simhash docstring for the scheme and guarantees."""
    from netml_ray.partition import partition_map

    nb = max_hamming + 1
    if not 1 <= nb <= 64:
        raise ValueError(f"max_hamming={max_hamming} out of range")
    widths = [64 // nb + (1 if i < 64 % nb else 0) for i in range(nb)]
    shifts = np.cumsum([0] + widths[:-1])

    def _explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = t[hash_col].to_numpy().astype(np.uint64)
        bk = np.empty((n, nb), dtype=np.int64)
        for i in range(nb):
            bits = (s >> np.uint64(shifts[i])) & np.uint64((1 << widths[i]) - 1)
            # bucket key encodes (band, band_bits) in one int64
            bk[:, i] = (np.int64(i) << np.int64(48)) | bits.astype(np.int64)
        rep = np.repeat(np.arange(n, dtype=np.int64), nb)
        return pa.table({
            id_col: pc.take(t[id_col], pa.array(rep)),
            "bkey": pa.array(bk.ravel()),
            "h64": pa.array(np.repeat(t[hash_col].to_numpy(), nb)),
        })

    exploded = sig_ds.map_batches(_explode, batch_format="pyarrow")

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("bkey", "ascending"), ("h64", "ascending"),
                       (id_col, "ascending")])
        n = t.num_rows
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "hamming": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        bk = t["bkey"].to_numpy()
        sh = t["h64"].to_numpy()
        ids = t[id_col].to_numpy()
        out_a, out_b, out_h = [], [], []
        bstart = _run_starts(bk)
        gstart = _run_starts(bk, sh)
        # stars within identical-simhash groups (hamming 0 by identity)
        grun = np.cumsum(gstart) - 1
        gfirst = np.flatnonzero(gstart)
        rep_per_pos = ids[gfirst][grun]
        nonrep = ~gstart
        if nonrep.any():
            out_a.append(rep_per_pos[nonrep])
            out_b.append(ids[nonrep])
            out_h.append(np.zeros(int(nonrep.sum()), dtype=np.int64))
        # cross-signature candidates: reps only, verified by popcount
        rep_ids = ids[gfirst]
        rep_sigs = sh[gfirst]
        brun = np.cumsum(bstart) - 1
        rep_bucket = brun[gfirst]
        kcounts = np.bincount(rep_bucket, minlength=brun[-1] + 1)
        rstart = np.r_[0, np.cumsum(kcounts)]
        two_b = np.flatnonzero(kcounts == 2)
        if len(two_b):
            i0 = rstart[two_b]
            d = popcount64(rep_sigs[i0].astype(np.uint64)
                           ^ rep_sigs[i0 + 1].astype(np.uint64))
            hit = d <= max_hamming
            if hit.any():
                a, b = rep_ids[i0][hit], rep_ids[i0 + 1][hit]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
                out_h.append(d[hit])
        n_capped = 0
        for bidx in np.flatnonzero(kcounts > 2):
            s0, e0 = rstart[bidx], rstart[bidx + 1]
            reps, sigs = rep_ids[s0:e0], rep_sigs[s0:e0]
            m = e0 - s0
            if m > max_bucket:
                n_capped += 1
                keep = np.argsort(reps)[:max_bucket]
                keep = np.sort(keep)
                reps, sigs = reps[keep], sigs[keep]
                m = max_bucket
            iu, ju = np.triu_indices(m, 1)
            d = popcount64(sigs[iu].astype(np.uint64)
                           ^ sigs[ju].astype(np.uint64))
            hit = d <= max_hamming
            if hit.any():
                ra, rb = reps[iu[hit]], reps[ju[hit]]
                out_a.append(np.minimum(ra, rb))
                out_b.append(np.maximum(ra, rb))
                out_h.append(d[hit])
        if n_capped:
            print(f"simhash_near: capped {n_capped} hot buckets at "
                  f"{max_bucket} distinct signatures (raise max_bucket "
                  f"or max_hamming bands)")
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            "hamming": pa.array(np.concatenate(out_h).astype(np.int64)),
        })

    pairs = partition_map(exploded, "bkey", _bucket_pairs,
                          num_partitions=num_partitions)
    return partition_map(pairs, "id_a", _dedup_pairs_part,
                         num_partitions=num_partitions)


def ngram_jaccard_duplicates(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    jaccard_threshold: float = 0.8,
    block_col: str | None = None,
    block_prefix: int = 8,
    max_block: int = 4096,
    metric: str = "jaccard",
    num_partitions: int | None = None,
):
    """Exact word-``k``-gram Jaccard near-duplicate pairs within blocks.

    ``metric="containment"`` scores |A∩B| / min(|A|, |B|) instead —
    the asymmetric measure that catches SUBSET duplication (a snippet
    or section lifted into a larger page), which Jaccard dilutes
    toward 0 as the host document grows; the output column is then
    named ``containment``.  Threshold and all other semantics are
    shared.

    Unlike MinHash-LSH (an estimate, optionally re-verified), this
    computes the EXACT Jaccard for every within-block pair — the right
    tool when a cheap blocking key (domain, title prefix, cluster id)
    already bounds candidate sets, and cross-block pairs are excluded
    by contract.  The blocking column is the documented partitioning
    assumption: pairs in different blocks are never compared.  Pass
    ``block_col`` to block on an existing column; otherwise the first
    ``block_prefix`` codeunits of the text are used (invariant under
    suffix edits).

    Scale shape: ONE shuffle of ``(id, block, text)`` — text must
    travel here because exact gram sets are built per block; use
    MinHash-LSH when that is not affordable.  Per partition, gram sets
    are built once per doc and within-block pairs are compared
    set-wise; blocks wider than ``max_block`` docs are skipped with a
    logged warning (bound the O(width²), never silently explode).

    Gram semantics match ``jaccard_ngrams`` exactly: ``str.split()``
    tokens, fewer than ``k`` tokens collapse to one whole-token-tuple
    gram, and two gram-less docs are J=1.  Returns
    ``(id_a, id_b, jaccard)`` with ``id_a < id_b``.
    """
    import logging

    from netml_ray.partition import partition_map

    log = logging.getLogger("netml_ray.dedup")
    bcol = block_col or "__jblock"
    if block_col is None:
        def _add_block(t: pa.Table) -> pa.Table:
            return t.append_column(
                bcol, pc.utf8_slice_codeunits(
                    pc.cast(t[text_col], pa.string()), 0, block_prefix))

        ds = ds.map_batches(_add_block, batch_format="pyarrow")
    narrow = ds.select_columns([id_col, bcol, text_col])

    def _grams(s: str) -> frozenset:
        w = s.split()
        if len(w) >= k:
            return frozenset(zip(*[w[i:] for i in range(k)]))
        return frozenset([tuple(w)])

    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    score_col = metric

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          score_col: pa.array([], type=pa.float64())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([(bcol, "ascending"), (id_col, "ascending")])
        ids = t[id_col].to_numpy()
        texts = t[text_col].to_pylist()
        b = t[bcol].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        out_a, out_b, out_j = [], [], []
        for s, e in zip(starts, ends):
            w = e - s
            if w < 2:
                continue
            if w > max_block:
                log.warning(
                    "ngram_jaccard_duplicates: block %r has %d docs "
                    "(> max_block=%d) — skipped; use a finer block key",
                    b[s], w, max_block)
                continue
            gs = [_grams(texts[i]) for i in range(s, e)]
            # empty-token docs: a gram set of {()} (whole-token tuple of
            # nothing) compares equal to another empty doc -> J=1, and
            # shares nothing with any non-empty doc -> J=0
            for i in range(w - 1):
                gi = gs[i]
                for j in range(i + 1, w):
                    inter = len(gi & gs[j])
                    if metric == "containment":
                        den = min(len(gi), len(gs[j]))
                    else:
                        den = len(gi) + len(gs[j]) - inter
                    jac = inter / den if den else 1.0
                    if jac >= jaccard_threshold:
                        out_a.append(int(ids[s + i]))
                        out_b.append(int(ids[s + j]))
                        out_j.append(jac)
        if not out_a:
            return empty
        a = np.asarray(out_a, dtype=np.int64)
        bb = np.asarray(out_b, dtype=np.int64)
        lo, hi = np.minimum(a, bb), np.maximum(a, bb)
        return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi),
                         score_col: pa.array(np.asarray(out_j))})

    return partition_map(narrow, bcol, _pairs, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# edit-distance (Levenshtein) near-duplicates
# ---------------------------------------------------------------------------

def levenshtein_pairs_batch(a_texts, b_texts) -> np.ndarray:
    """Exact unit-cost Levenshtein distance for a BATCH of string
    pairs, vectorized across the pairs.

    The classic DP has a sequential dependency along each row
    (insertions); it falls to a prefix-min: with
    ``base[j] = min(prev[j] + 1, prev[j-1] + sub_cost)`` (vectorized
    over j and pairs), ``cur[j] = min_{m<=j}(base[m] + (j - m))`` =
    ``running_min(base - j) + j`` — one ``np.minimum.accumulate`` per
    DP row.  Total work is O(max_len × pairs × max_len) elementwise
    numpy, no Python loop over pairs or columns."""
    p = len(a_texts)
    if p == 0:
        return np.empty(0, dtype=np.int64)
    ab = [s.encode("utf-8") for s in a_texts]
    bb = [s.encode("utf-8") for s in b_texts]
    la = np.array([len(s) for s in ab], dtype=np.int64)
    lb = np.array([len(s) for s in bb], dtype=np.int64)
    L = max(1, int(lb.max()))
    A = np.zeros((p, max(1, int(la.max()))), dtype=np.uint8)
    B = np.zeros((p, L), dtype=np.uint8)
    for i, s in enumerate(ab):
        A[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    for i, s in enumerate(bb):
        B[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    jj = np.arange(L + 1, dtype=np.int32)
    prev = np.broadcast_to(jj, (p, L + 1)).astype(np.int32)
    for i in range(1, int(la.max()) + 1):
        cost = (A[:, i - 1][:, None] != B).astype(np.int32)
        base = np.empty((p, L + 1), dtype=np.int32)
        base[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=base[:, 1:])
        t_ = base - jj
        np.minimum.accumulate(t_, axis=1, out=t_)
        cur = t_ + jj
        alive = (i <= la)
        prev = np.where(alive[:, None], cur, prev)
    return prev[np.arange(p), lb].astype(np.int64)


def edit_distance_pairs(ds, *, id_col: str = "doc_id",
                        text_col: str = "text",
                        block_col: str | None = None,
                        max_dist: int = 12, prefix_len: int = 64,
                        bucket_width: int = 32):
    """Near-duplicate pairs by exact Levenshtein distance on the text
    PREFIX (first ``prefix_len`` code units), blocked for scale.

    Candidate rule (deterministic, stated identically by the SQL
    oracle): two docs are candidates iff they share ``block_col``
    (e.g. source/domain — optional) and their full-text lengths fall
    in the same or ADJACENT ``bucket_width``-wide length buckets.
    With ``bucket_width ≥ max_dist`` no pair within distance
    ``max_dist`` ON THE FULL TEXT can differ by more than one bucket,
    so blocking costs no recall for full-string matching; on prefixes
    it is the documented candidate semantics.

    Shape: each doc is emitted to its home bucket and the next one
    (2 rows of (bucket_key, home, id, prefix) — prefixes only, never
    full texts), ONE hash exchange on the bucket key, then an exact
    O(pairs × prefix_len²) vectorized DP per bucket with each pair
    counted once (emitted only in the bucket equal to the LARGER of
    the two home buckets).  Bucket population is bounded by the
    blocking key — no all-pairs stage.  Returns (id_a, id_b, dist)
    with id_a < id_b, dist ≤ max_dist."""
    from .partition import partition_map

    def _emit(t: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(t[text_col], 0, prefix_len)
        ln = pc.utf8_length(t[text_col]).to_numpy().astype(np.int64)
        home = ln // bucket_width
        blk = (t[block_col].to_pylist() if block_col is not None
               else [""] * t.num_rows)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        parts = []
        for shift in (0, 1):
            parts.append(pa.table({
                "bkey": pa.array([f"{b}|{h + shift}"
                                  for b, h in zip(blk, home)]),
                "home": pa.array(home, type=pa.int64()),
                id_col: pa.array(ids, type=pa.int64()),
                "pref": pref,
            }))
        return pa.concat_tables(parts)

    def _pairs(t: pa.Table) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        bkeys = t["bkey"].combine_chunks()
        m = t.num_rows
        starts = np.ones(m, dtype=bool)
        if m > 1:
            starts[1:] = np.asarray(pc.not_equal(
                bkeys.slice(1, m - 1), bkeys.slice(0, m - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)
        bounds = np.append(np.flatnonzero(starts), m)
        home = t["home"].to_numpy()
        ids = t[id_col].to_numpy()
        prefs = t["pref"].to_pylist()
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = e - s
            if g < 2:
                continue
            # this group's bucket number (tail of the key)
            bnum = int(bkeys[s].as_py().rsplit("|", 1)[1])
            ii, jj_ = np.triu_indices(g, k=1)
            ii += s
            jj_ += s
            # count each pair once: only in max(home_a, home_b)'s group
            keep = np.maximum(home[ii], home[jj_]) == bnum
            ii, jj_ = ii[keep], jj_[keep]
            if not len(ii):
                continue
            d = levenshtein_pairs_batch([prefs[x] for x in ii],
                                        [prefs[x] for x in jj_])
            ok = d <= max_dist
            a, b = ids[ii[ok]], ids[jj_[ok]]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_d.append(d[ok])
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "dist": pa.array([], type=pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "dist": pa.array(np.concatenate(out_d), type=pa.int64()),
        })

    emitted = ds.map_batches(_emit, batch_format="pyarrow")
    return partition_map(emitted, "bkey", _pairs,
                         sort_by=["bkey", id_col])


def jaro_winkler_pairs_batch(a_texts, b_texts) -> np.ndarray:
    """Jaro-Winkler similarity for a BATCH of string pairs, vectorized
    across pairs (DuckDB ``jaro_winkler_similarity`` parity, fuzz-
    pinned by pytest): classic Jaro with match window
    ``max(len)//2 - 1``, greedy first-unmatched matching, half-count
    transpositions, Winkler prefix boost (scale 0.1, prefix cap 4)
    applied when jaro > 0.7; either side empty -> 0.0.

    The greedy matcher has a sequential dependency along the A string,
    so the loop runs over the (bounded) prefix positions with every
    pair advanced per step — O(prefix² × pairs) elementwise numpy, no
    Python loop over pairs (the ``levenshtein_pairs_batch`` shape)."""
    p = len(a_texts)
    if p == 0:
        return np.empty(0, dtype=np.float64)
    ab = [s.encode("utf-8") for s in a_texts]
    bb = [s.encode("utf-8") for s in b_texts]
    la = np.array([len(s) for s in ab], dtype=np.int64)
    lb = np.array([len(s) for s in bb], dtype=np.int64)
    La = max(1, int(la.max()))
    Lb = max(1, int(lb.max()))
    A = np.zeros((p, La), dtype=np.uint8)
    B = np.zeros((p, Lb), dtype=np.uint8)
    for i, s in enumerate(ab):
        A[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    for i, s in enumerate(bb):
        B[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)

    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    jgrid = np.arange(Lb, dtype=np.int64)
    matched_b = np.zeros((p, Lb), dtype=bool)
    amatch = np.zeros((p, La), dtype=bool)
    for i in range(La):
        valid = i < la
        lo = np.maximum(i - w, 0)[:, None]
        hi = np.minimum(i + w, lb - 1)[:, None]
        cand = ((jgrid >= lo) & (jgrid <= hi)
                & (B == A[:, i][:, None]) & ~matched_b
                & valid[:, None])
        has = cand.any(axis=1)
        j = cand.argmax(axis=1)
        matched_b[has, j[has]] = True
        amatch[:, i] = has
    m = amatch.sum(axis=1)

    # transpositions: compact both matched sequences and count
    # positionwise mismatches (the sequences are permutations of the
    # same multiset); t = mismatches // 2
    Lm = max(1, int(m.max()))
    SA = np.zeros((p, Lm), dtype=np.uint8)
    SB = np.zeros((p, Lm), dtype=np.uint8)
    ra = np.cumsum(amatch, axis=1) - 1
    pi, ii = np.nonzero(amatch)
    SA[pi, ra[pi, ii]] = A[pi, ii]
    rb = np.cumsum(matched_b, axis=1) - 1
    pj, jj = np.nonzero(matched_b)
    SB[pj, rb[pj, jj]] = B[pj, jj]
    kk = np.arange(Lm, dtype=np.int64)
    mism = ((SA != SB) & (kk < m[:, None])).sum(axis=1)
    t = mism // 2

    mf = m.astype(np.float64)
    laf = la.astype(np.float64)
    lbf = lb.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / laf + mf / lbf + (mf - t) / mf) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)

    # common prefix up to 4 (on the compared strings)
    lcap = min(4, La, Lb)
    if lcap > 0:
        eq = A[:, :lcap] == B[:, :lcap]
        eq &= (np.arange(lcap) < np.minimum(la, lb)[:, None])
        pref = np.where(eq.all(axis=1), lcap, eq.argmin(axis=1))
    else:
        pref = np.zeros(p, dtype=np.int64)
    boost = jaro > 0.7
    return np.where(boost, jaro + 0.1 * pref * (1.0 - jaro), jaro)


def jaro_winkler_pairs(ds, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       block_col: str | None = None,
                       min_sim: float = 0.9, prefix_len: int = 64,
                       bucket_width: int = 32,
                       round_to: int | None = 9):
    """Near-duplicate pairs by Jaro-Winkler similarity on the text
    PREFIX — the record-linkage companion to ``edit_distance_pairs``
    with the IDENTICAL blocking rule (same block_col, same-or-adjacent
    length bucket, each pair scored once in the larger home bucket),
    so the SQL oracle states the same candidate set and scores it
    with DuckDB's native jaro_winkler_similarity."""
    from .partition import partition_map

    def _emit(t: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(t[text_col], 0, prefix_len)
        ln = pc.utf8_length(t[text_col]).to_numpy().astype(np.int64)
        home = ln // bucket_width
        blk = (t[block_col].to_pylist() if block_col is not None
               else [""] * t.num_rows)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        parts = []
        for shift in (0, 1):
            parts.append(pa.table({
                "bkey": pa.array([f"{b}|{h + shift}"
                                  for b, h in zip(blk, home)]),
                "home": pa.array(home, type=pa.int64()),
                id_col: pa.array(ids, type=pa.int64()),
                "pref": pref,
            }))
        return pa.concat_tables(parts)

    def _pairs(t: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        bkeys = t["bkey"].combine_chunks()
        m = t.num_rows
        starts = np.ones(m, dtype=bool)
        if m > 1:
            starts[1:] = np.asarray(pc.not_equal(
                bkeys.slice(1, m - 1), bkeys.slice(0, m - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)
        bounds = np.append(np.flatnonzero(starts), m)
        home = t["home"].to_numpy()
        ids = t[id_col].to_numpy()
        prefs = t["pref"].to_pylist()
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = e - s
            if g < 2:
                continue
            bnum = int(bkeys[s].as_py().rsplit("|", 1)[1])
            ii, jj_ = np.triu_indices(g, k=1)
            ii += s
            jj_ += s
            keep = np.maximum(home[ii], home[jj_]) == bnum
            ii, jj_ = ii[keep], jj_[keep]
            if not len(ii):
                continue
            sim = jaro_winkler_pairs_batch([prefs[x] for x in ii],
                                           [prefs[x] for x in jj_])
            ok = sim >= min_sim
            a, b = ids[ii[ok]], ids[jj_[ok]]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(sim[ok])
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        sims = np.concatenate(out_s)
        if round_to is not None:
            sims = np.round(sims, round_to)
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "sim": pa.array(sims, type=pa.float64()),
        })

    emitted = ds.map_batches(_emit, batch_format="pyarrow")
    return partition_map(emitted, "bkey", _pairs,
                         sort_by=["bkey", id_col])


def snm_candidates(ds, key_col: str, id_col: str = "doc_id", *,
                   window: int = 2, min_sim: float = 0.90,
                   bucket: int = 1024, round_to: int = 9,
                   num_partitions: int | None = None):
    """Sorted-neighborhood-method (SNM) record-linkage candidates
    (Hernández & Stolfo 1995): globally sort on a blocking key, pair
    every row with its next ``window`` neighbours in sort order, and
    keep pairs whose keys score ≥ ``min_sim`` Jaro-Winkler — the
    classic linear-candidate-count alternative to hash blocking (it
    catches near-keys that hash into DIFFERENT buckets).

    Shape: ``global_row_index`` (one range sort + metadata-prefix
    stamps) assigns ranks; rows are routed to ``rank // bucket``
    groups with the first ``window`` rows of each group ALSO copied
    to the previous group (so every anchor sees its full neighbour
    window without any cross-partition walk); ONE group-keyed
    exchange then emits shift-pairs and scores them with the
    DuckDB-parity ``jaro_winkler_pairs_batch``.  Anchors are only the
    group's own rows, so no pair is emitted twice.  Returns
    ``(id_a, id_b, jw)`` with id_a the earlier-rank row."""
    from netml_ray.partition import global_row_index, partition_map

    g = global_row_index(ds.select_columns([id_col, key_col]),
                         [key_col, id_col])

    def _route(t: pa.Table) -> pa.Table:
        gi = t["__gidx"].to_numpy()
        own = t.append_column(
            "__bkt", pa.array((gi // bucket).astype(np.int64)))
        edge = (gi % bucket < window) & (gi // bucket > 0)
        if not edge.any():
            return own
        dup = t.filter(pa.array(edge))
        gdup = dup["__gidx"].to_numpy()
        dup = dup.append_column(
            "__bkt", pa.array((gdup // bucket - 1).astype(np.int64)))
        return pa.concat_tables([own, dup])

    routed = g.map_batches(_route, batch_format="pyarrow")

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jw": pa.array([], pa.float64())})

    def _pairs(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        gi = t["__gidx"].to_numpy()
        bk = t["__bkt"].to_numpy()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keys = t[key_col].to_pylist()
        ai, bi = [], []
        for d in range(1, window + 1):
            if t.num_rows <= d:
                break
            # consecutive ranks within the same routed group; anchor
            # must be one of the group's OWN rows (not a borrowed copy)
            ok = (gi[d:] == gi[:-d] + d) & (bk[d:] == bk[:-d]) \
                & (gi[:-d] // bucket == bk[:-d])
            ai.append(np.flatnonzero(ok))
            bi.append(np.flatnonzero(ok) + d)
        if not ai or not sum(len(x) for x in ai):
            return empty
        a_ix = np.concatenate(ai)
        b_ix = np.concatenate(bi)
        jw = jaro_winkler_pairs_batch([keys[i] for i in a_ix],
                                      [keys[j] for j in b_ix])
        keep = jw >= min_sim
        return pa.table({
            "id_a": pa.array(ids[a_ix[keep]]),
            "id_b": pa.array(ids[b_ix[keep]]),
            "jw": pa.array(np.round(jw[keep], round_to))})

    return partition_map(routed, "__bkt", _pairs,
                         num_partitions=num_partitions,
                         sort_by=["__bkt", "__gidx"])
