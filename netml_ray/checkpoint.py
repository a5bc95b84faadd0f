"""Per-partition checkpointing with lineage + metrics (north_rule:
a killed run resumes without recomputing completed partitions).

Layout (resume-friendly, scan = manifest)::

    out_dir/
      scalars.json              # global scalars (interval, dim, rate, ...)
      part=<pid>/data.parquet   # the partition's output
      part=<pid>/_SUCCESS.json  # lineage + metrics, written ATOMICALLY
                                # (tmp + rename) after data.parquet

A partition is complete iff its ``_SUCCESS.json`` exists; partial
writes leave only a tmp file that the rerun overwrites.  The success
record carries ``rows``, ``checksum`` (xor of row hashes —
order-insensitive), ``wall_s``, input fragment description and the
environment fingerprint (polars version — the partition hash function)
so a resume can detect an incompatible environment.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from netml_ray.partition import PID, add_pid, default_num_partitions, sort_partition


def _success_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part={pid}", "_SUCCESS.json")


def completed_partitions(out_dir: str) -> dict[int, dict]:
    done = {}
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        sp = os.path.join(out_dir, name, "_SUCCESS.json")
        if os.path.exists(sp):
            with open(sp) as f:
                done[int(name.split("=", 1)[1])] = json.load(f)
    return done


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.json")


def save_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(out_dir))


def load_manifest(out_dir: str) -> dict | None:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def save_scalars(out_dir: str, scalars: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "scalars.json.tmp")
    with open(tmp, "w") as f:
        json.dump(scalars, f)
    os.replace(tmp, os.path.join(out_dir, "scalars.json"))


def load_scalars(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, "scalars.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def save_hot_state(out_dir: str, tbl: pa.Table,
                   rows_per_shard: int = 1 << 18) -> None:
    """Persist the salted plan's per-session hot state as SHARDED
    parquet under ``<out_dir>/hot_state/`` with a ``_manifest.json``
    file list written LAST (atomic commit point): one giant file is a
    write/read bottleneck at extreme hot-key counts, and a retry after
    a mid-write kill must not see a torn state (r3 queue #5, same
    manifest treatment as the IVF bucket shards)."""
    d = os.path.join(out_dir, "hot_state")
    os.makedirs(d, exist_ok=True)
    files = []
    n = tbl.num_rows
    for i, start in enumerate(range(0, max(n, 1), rows_per_shard)):
        name = f"state-{i:05d}.parquet"
        tmp = os.path.join(d, f"{name}.tmp.{os.getpid()}")
        pq.write_table(tbl.slice(start, rows_per_shard), tmp)
        os.replace(tmp, os.path.join(d, name))
        files.append(name)
    tmp = os.path.join(d, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"files": files, "rows": n}, f)
    os.replace(tmp, os.path.join(d, "_manifest.json"))


def have_hot_state(out_dir: str) -> bool:
    return (os.path.exists(os.path.join(out_dir, "hot_state",
                                        "_manifest.json"))
            or os.path.exists(os.path.join(out_dir, "hot_state.parquet")))


def load_hot_state(out_dir: str) -> pa.Table | None:
    """Read the sharded hot state back via its manifest (exactly the
    listed files — stale shards from an aborted earlier build are
    ignored); falls back to the legacy single-file layout."""
    man_p = os.path.join(out_dir, "hot_state", "_manifest.json")
    if os.path.exists(man_p):
        with open(man_p) as f:
            man = json.load(f)
        d = os.path.join(out_dir, "hot_state")
        parts = [pq.read_table(os.path.join(d, name))
                 for name in man["files"]]
        tbl = pa.concat_tables(parts)
        if tbl.num_rows != man["rows"]:
            raise ValueError(
                f"hot_state shard rows {tbl.num_rows} != manifest "
                f"{man['rows']} — delete {out_dir} to start fresh")
        return tbl
    legacy = os.path.join(out_dir, "hot_state.parquet")
    if os.path.exists(legacy):
        return pq.read_table(legacy)
    return None


def validate_or_init_manifest(
    out_dir: str,
    key: str,
    num_partitions: int | None,
    params: dict | None,
) -> tuple[int, dict[int, dict]]:
    """Validate (or write, on first run) the checkpoint manifest.

    Returns ``(num_partitions, completed_partition_records)``.  A resume
    that passes ``num_partitions=None`` adopts the manifest's value;
    any other mismatch (num_partitions, partition-hash environment
    fingerprint, key, run params) raises — partitions hashed or
    produced under different settings cannot be mixed with new ones
    without silently dropping / duplicating keys.
    """
    import polars as pl

    os.makedirs(out_dir, exist_ok=True)
    env_fp = f"polars={pl.__version__}"
    manifest = load_manifest(out_dir)
    done_recs = completed_partitions(out_dir)
    if manifest is not None:
        if num_partitions is None:
            num_partitions = manifest["num_partitions"]
        mismatches = []
        if num_partitions != manifest["num_partitions"]:
            mismatches.append(
                f"num_partitions {manifest['num_partitions']} -> {num_partitions}")
        if env_fp != manifest["env"]:
            mismatches.append(f"env {manifest['env']} -> {env_fp}")
        if key != manifest["key"]:
            mismatches.append(f"key {manifest['key']!r} -> {key!r}")
        if (params or {}) != manifest.get("params", {}):
            mismatches.append(
                f"params {manifest.get('params')} -> {params or {}}")
        if mismatches:
            raise ValueError(
                f"checkpoint at {out_dir} is incompatible with this run "
                f"({'; '.join(mismatches)}); delete the directory to start "
                f"fresh or rerun with matching parameters"
            )
        stale_env = [p for p, r in done_recs.items() if r.get("env") != env_fp]
        if stale_env:
            raise ValueError(
                f"completed partitions {sorted(stale_env)[:5]} under {out_dir} "
                f"were written with a different environment fingerprint than "
                f"{env_fp}; delete the directory to start fresh"
            )
    else:
        if done_recs:
            raise ValueError(
                f"{out_dir} has completed partitions but no manifest.json "
                f"(pre-manifest layout or partial delete); cannot verify "
                f"partitioning compatibility — delete the directory"
            )
        if num_partitions is None:
            num_partitions = default_num_partitions()
        save_manifest(out_dir, {"num_partitions": num_partitions,
                                "env": env_fp, "key": key,
                                "params": params or {}})
    return num_partitions, done_recs


def _table_checksum(t: pa.Table) -> int:
    """Order-insensitive 64-bit checksum of the table's rows."""
    import polars as pl

    if t.num_rows == 0:
        return 0
    h = pl.from_arrow(t).hash_rows(seed=7).to_numpy()
    return int(np.bitwise_xor.reduce(h))


def _write_partition(t: pa.Table, pid: int, fn, out_dir: str, env_fp: str,
                     input_desc: str, sort_by=None) -> int:
    """fn + atomic write + success marker for ONE complete pid."""
    import time

    t0 = time.time()
    n_in = t.num_rows
    if sort_by is not None:
        t = sort_partition(t, sort_by)
    out = fn(t)
    if PID in out.column_names:
        out = out.drop_columns([PID])
    pdir = os.path.join(out_dir, f"part={pid}")
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, f".data.parquet.tmp.{os.getpid()}")
    pq.write_table(out, tmp)
    os.replace(tmp, os.path.join(pdir, "data.parquet"))
    rec = {
        "partition_id": pid,
        "rows": out.num_rows,
        "input_rows": n_in,
        "checksum": _table_checksum(out),
        "wall_s": round(time.time() - t0, 4),
        "input": input_desc,
        "env": env_fp,
        "ts": time.time(),
    }
    stmp = os.path.join(pdir, f"._SUCCESS.tmp.{os.getpid()}")
    with open(stmp, "w") as f:
        json.dump(rec, f)
    os.replace(stmp, _success_path(out_dir, pid))
    return out.num_rows


def checkpointed_write_from_parts(parts, fn, out_dir: str, *,
                                  input_desc: str = "",
                                  pid_offset: int = 0):
    """Checkpointed writes over an ALREADY-shuffled ``partition_sorted``
    result: no second shuffle — each block holds one-or-more complete
    sorted partitions (verified against the self-describing
    ``__pidrows`` column, as in ``aligned_map``), and each is written
    atomically with its lineage record.  Callers must have validated /
    initialized the manifest first (``validate_or_init_manifest``) and
    pre-filtered completed pids out of the input.

    ``pid_offset`` shifts the on-disk partition ids — the salted
    flagship writes its cold partitions at ``0..P-1`` and the hot
    attach partitions at ``P..2P-1`` in the same directory."""
    import polars as pl

    from netml_ray.partition import PIDROWS

    env_fp = f"polars={pl.__version__}"

    def _run(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"partition_id": pa.array([], type=pa.int64()),
                             "rows": pa.array([], type=pa.int64())})
        pids = t[PID].to_numpy()
        expected = t[PIDROWS].to_numpy()
        upids, first_idx, counts = np.unique(pids, return_index=True,
                                             return_counts=True)
        bad = counts != expected[first_idx]
        if bad.any():
            p = int(upids[np.flatnonzero(bad)[0]])
            raise RuntimeError(
                f"partition {p} split across blocks: raise "
                "DataContext.target_max_block_size or use more partitions"
            )
        out_p, out_n = [], []
        for pid in upids:
            sl = t.filter(pa.array(pids == pid)).drop_columns([PID, PIDROWS])
            out_p.append(int(pid) + pid_offset)
            out_n.append(_write_partition(sl, int(pid) + pid_offset, fn,
                                          out_dir, env_fp, input_desc))
        return pa.table({"partition_id": pa.array(out_p, type=pa.int64()),
                         "rows": pa.array(out_n, type=pa.int64())})

    marker = parts.map_batches(_run, batch_format="pyarrow", batch_size=None)
    marker.materialize()
    return out_dir


def filter_pids(ds, key: str, num_partitions: int, done: set):
    """Drop rows whose partition id is already completed — BEFORE the
    shuffle, so finished partitions are neither re-shuffled nor
    recomputed on resume."""
    import ray

    from netml_ray.hashing import pid_for

    if not done:
        return ds
    done_ref = ray.put(np.fromiter(sorted(done), dtype=np.int64))

    def _skip(t: pa.Table) -> pa.Table:
        d = ray.get(done_ref)
        mask = ~np.isin(pid_for(t[key], num_partitions), d)
        return t.filter(pa.array(mask))

    return ds.map_batches(_skip, batch_format="pyarrow")


def checkpointed_partition_map(
    ds,
    key: str,
    fn,
    out_dir: str,
    *,
    num_partitions: int | None = None,
    sort_by=None,
    input_desc: str = "",
    params: dict | None = None,
):
    """partition_map with per-partition atomic checkpoints.

    Completed partitions (``_SUCCESS.json`` present) are filtered out of
    the input *before* the shuffle, so a resume neither recomputes nor
    re-shuffles them.  Returns the directory path; read the combined
    output with ``read_checkpointed(out_dir)``.

    A ``manifest.json`` written on first run pins ``num_partitions``,
    the partition-hash environment fingerprint, the key, and the
    caller's ``params``.  A resume validates all of them: partitions
    hashed under a different num_partitions / polars version, or
    produced by different run parameters, cannot be mixed with new
    ones, so a mismatch raises instead of silently dropping /
    duplicating keys.  A resume that passes ``num_partitions=None``
    adopts the manifest's value (so resuming on a different-sized
    cluster is safe by default).
    """
    import polars as pl
    import ray

    env_fp = f"polars={pl.__version__}"
    num_partitions, done_recs = validate_or_init_manifest(
        out_dir, key, num_partitions, params)
    done = set(done_recs)

    ds = add_pid(ds, key, num_partitions)
    if done:
        done_ref = ray.put(np.fromiter(sorted(done), dtype=np.int64))

        def _skip(t: pa.Table) -> pa.Table:
            d = ray.get(done_ref)
            mask = ~np.isin(t[PID].to_numpy(), d)
            return t.filter(pa.array(mask))

        ds = ds.map_batches(_skip, batch_format="pyarrow")

    def _run(t: pa.Table) -> pa.Table:
        # one map_groups call may carry several complete pids
        if t.num_rows == 0:
            return pa.table({"partition_id": pa.array([], type=pa.int64()),
                             "rows": pa.array([], type=pa.int64())})
        pids = t[PID].to_numpy()
        upids = np.unique(pids)
        out_p, out_n = [], []
        for pid in upids:
            sl = t.filter(pa.array(pids == pid)).drop_columns([PID])
            out_p.append(int(pid))
            out_n.append(_write_partition(sl, int(pid), fn, out_dir, env_fp,
                                          input_desc, sort_by))
        return pa.table({"partition_id": pa.array(out_p, type=pa.int64()),
                         "rows": pa.array(out_n, type=pa.int64())})

    marker = ds.groupby(PID).map_groups(_run, batch_format="pyarrow")
    marker.materialize()  # drive execution of pending partitions
    return out_dir


def read_checkpointed(out_dir: str):
    """Dataset over all completed partitions' parquet files."""
    import ray.data as rd

    files = [
        os.path.join(out_dir, f"part={pid}", "data.parquet")
        for pid in sorted(completed_partitions(out_dir))
    ]
    if not files:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    return rd.read_parquet(files)
