"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at ``sf_dir``, runs the matching
``oracle_sql()`` in DuckDB over the same parquet views, and compares:
row count, column-name set, and values (order-insensitive: both sides
sorted by all columns; numeric compared with np.allclose, exact
otherwise).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # sort NON-float columns first: float aggregates carry sum-order /
    # rounding-boundary noise at the last digit, and a float-led row
    # sort then pairs rows DIFFERENTLY on the two sides (observed:
    # cumulative_events at sf0.1 — 394 phantom mismatches from 1e-9
    # cum_mean noise; a merge on event_id showed zero real ones).
    # When the non-float prefix uniquely keys rows (the usual case:
    # event_id/doc_id), float noise cannot change the pairing at all.
    nonfloat = [c for c in df.columns
                if not np.issubdtype(df[c].dtype, np.floating)]
    floats = [c for c in df.columns if c not in nonfloat]
    sort_cols = [c for c in nonfloat + floats
                 if df[c].dtype != object or df[c].map(type).eq(str).all()]
    try:
        df = df.sort_values(nonfloat + floats, kind="stable")
    except Exception:
        df = df.sort_values(sort_cols, kind="stable")
    return df.reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if len(got) != len(exp):
        errs.append(f"rowcount {len(got)} != {len(exp)}")
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        errs.append(f"columns {gc} != {ec}")
        return errs
    if errs:
        return errs
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
            ga = gv.to_numpy(dtype=np.float64, na_value=np.nan)
            ea = ev.to_numpy(dtype=np.float64, na_value=np.nan)
            both_nan = np.isnan(ga) & np.isnan(ea)
            ok = both_nan | np.isclose(ga, ea, rtol=1e-6, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.flatnonzero(~ok)[0])
                errs.append(f"col {c}: {(~ok).sum()} mismatches, first at {i}: {ga[i]} vs {ea[i]}")
                # exactness report
            else:
                mx = np.nanmax(np.abs(ga - ea)) if len(ga) else 0.0
                if mx > 0:
                    errs.append(f"[warn] col {c}: max abs diff {mx:.3e} (allclose ok)")
        else:
            if not gv.astype(str).equals(ev.astype(str)):
                neq = (gv.astype(str) != ev.astype(str))
                i = int(np.flatnonzero(neq.to_numpy())[0])
                errs.append(f"col {c}: {neq.sum()} mismatches, first at {i}: {gv.iloc[i]!r} vs {ev.iloc[i]!r}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(got)} ({dt:.1f}s) [rows-only]")
            continue
        try:
            exp = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        errs = compare(name, got, exp)
        hard = [e for e in errs if not e.startswith("[warn]")]
        for e in errs:
            print(f"     {name}: {e}")
        if hard:
            print(f"FAIL {name}: rows={len(got)} vs {len(exp)} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"ok   {name}: rows={len(got)} ({dt:.1f}s)")
    ray.shutdown()
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
