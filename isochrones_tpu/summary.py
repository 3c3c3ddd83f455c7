"""Catalog-native fit summaries.

The reference's summary tooling (``isochrones/summary.py:9-76``,
``scripts/starfit-summarize``) is a pool-mapped per-folder loop: each worker
reloads one fitted model's HDF file and computes its quantiles. Here the
native shape is catalog-first: a :class:`~isochrones_tpu.batch.BatchStarFitter`
already holds every star's posterior draws as one ``(S, N, P)`` array, so the
summary is a single vectorized quantile pass plus ONE batched interpolator
dispatch for the derived physical columns — no per-folder reload, no pool.
The per-folder reference API (:func:`get_quantiles` / :func:`get_summary_df`)
survives as a thin caller of the same core.
"""

from __future__ import annotations

import os
import re

import numpy as np

__all__ = [
    "quantile_frame",
    "derived_quantile_frame",
    "summarize_batch",
    "get_quantiles",
    "quantile_worker",
    "get_summary_df",
    "write_results_txt",
]

DEFAULT_QS = (0.05, 0.16, 0.5, 0.84, 0.95)
DEFAULT_COLUMNS = ("eep", "mass", "radius", "age", "feh", "distance", "AV")


def _q_col(name, q):
    return f"{name}_{q * 100:02.0f}"


def quantile_frame(samples, names, qs=DEFAULT_QS, index=None):
    """Wide per-row quantile table from stacked posterior draws.

    samples : (S, N) or (S, N, P) array — S rows (stars), N draws each.
    names : P column names (or one name for 2-d input).
    Returns a DataFrame with one row per star and ``{name}_{qq}`` columns,
    computed in one vectorized ``np.nanquantile`` call per parameter.
    """
    import pandas as pd

    arr = np.asarray(samples, dtype=float)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if isinstance(names, str):
        names = [names]
    if arr.shape[-1] != len(names):
        raise ValueError(f"{arr.shape[-1]} sample columns vs {len(names)} names")
    out = {}
    with np.errstate(invalid="ignore"):
        for i, p in enumerate(names):
            col = arr[:, :, i]
            all_nan = np.isnan(col).all(axis=1)
            safe = np.where(all_nan[:, None], 0.0, col)
            quants = np.nanquantile(safe, qs, axis=1)  # (len(qs), S)
            quants = np.where(all_nan[None, :], np.nan, quants)
            for q, row in zip(qs, quants):
                out[_q_col(p, q)] = row
    return pd.DataFrame(out, index=index)


def derived_quantile_frame(ic, samples, qs=DEFAULT_QS, columns=None, index=None):
    """Quantiles of DERIVED physical quantities (mass, radius, Teff, logg,
    mags, ...) for a whole catalog of per-star posterior draws.

    samples : (S, N, 5) draws in ``(eep, age, feh, distance, AV)`` order.
    The derived values come from ONE flattened ``ic(...)`` dispatch over all
    S*N draws (the reference recomputes per folder via ``derived_samples``,
    reference summary.py:30-46); ``columns`` filters by regex match like the
    reference's column selection.
    """
    arr = np.asarray(samples, dtype=float)
    S, N, P = arr.shape
    if P != 5:
        raise ValueError("derived summaries need (eep, age, feh, distance, AV) draws")
    flat = arr.reshape(S * N, P)
    # rows with NaN draws (e.g. zero-support stars) would poison the batched
    # interp dispatch shape-wise; evaluate them at a dummy point and mask after
    bad = ~np.isfinite(flat).all(axis=1)
    flat = np.where(bad[:, None], np.nanmedian(np.where(bad[:, None], np.nan, flat), axis=0), flat)
    flat = np.where(np.isfinite(flat), flat, 1.0)
    derived = ic(*[flat[:, i] for i in range(5)])
    derived.loc[bad, :] = np.nan
    names = [
        c for c in derived.columns
        if columns is None or any(re.search(c2, c) for c2 in columns)
    ]
    stacked = derived[names].values.reshape(S, N, len(names))
    return quantile_frame(stacked, names, qs=qs, index=index)


def summarize_batch(
    fitter,
    qs=DEFAULT_QS,
    derived=True,
    columns=DEFAULT_COLUMNS,
    filename=None,
    max_derived_draws=2000,
):
    """One catalog -> one summary frame, natively from a fitted
    :class:`~isochrones_tpu.batch.BatchStarFitter` (fit params + derived
    physical quantiles + per-star evidence when available).

    This is the ``starfit-summarize`` product without the per-folder HDF
    round-trip: draws stay as the fitter's ``(S, N, 5)`` array, derived
    columns come from one batched interpolator dispatch.

    max_derived_draws : cap on posterior draws per star entering the derived
        interpolator dispatch (evenly strided; quantiles converge by ~1-2k
        draws). The fit-param quantiles always use every draw — only the
        expensive ``(S, N, P)`` derived pass is subsampled. ``None`` = all.
    """
    import pandas as pd

    idx = fitter.catalog.df.index
    frames = [quantile_frame(fitter.samples, list(fitter.param_names), qs=qs, index=idx)]
    if derived:
        samples_d = np.asarray(fitter.samples)
        n_draws = samples_d.shape[1]
        if max_derived_draws is not None and n_draws > max_derived_draws:
            stride = np.linspace(0, n_draws - 1, max_derived_draws).astype(int)
            samples_d = samples_d[:, stride]
        frames.append(
            derived_quantile_frame(
                fitter.ic, samples_d, qs=qs, columns=columns, index=idx
            )
        )
    df = pd.concat(frames, axis=1)
    # drop duplicate fit-param columns the derived pass re-emits
    df = df.loc[:, ~df.columns.duplicated()]
    if getattr(fitter, "_evidence", None) is not None:
        logz, logzerr = fitter.evidence
        df["logz"] = logz
        df["logzerr"] = logzerr
    if filename is not None:
        _write(df, filename)
    return df


# --------------------------------------------------------------------------
# reference-compat per-folder API (reference summary.py:9-76): same public
# surface, now a thin caller of quantile_frame over one loaded model.


def get_quantiles(
    name,
    rootdir=".",
    columns=DEFAULT_COLUMNS,
    qs=DEFAULT_QS,
    modelname="mist_starmodel_single",
    verbose=False,
    raise_exceptions=False,
):
    """Parameter quantiles for one fitted starmodel folder."""
    import pandas as pd

    from .starmodel import BasicStarModel

    modfile = os.path.join(rootdir, name, f"{modelname}.h5")
    try:
        mod = BasicStarModel.load_hdf(modfile)
    except Exception:
        if verbose:
            print(f"cannot load starmodel! ({modfile})")
        if raise_exceptions:
            raise
        return pd.DataFrame()

    ds = mod.derived_samples
    names = [c for c in ds.columns if any(re.search(c2, c) for c2 in columns)]
    return quantile_frame(ds[names].values[None], names, qs=qs, index=[name])


class quantile_worker:
    """Picklable pool worker (kept for the reference's schwimmbad-pool
    calling convention; the native path needs no pool)."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self, name):
        return get_quantiles(name, **self.kwargs)


def get_summary_df(names=None, pool=None, filename=None, **kwargs):
    """Concatenated per-folder quantile summary (reference CLI contract).
    For whole-catalog fits prefer :func:`summarize_batch` — one frame, no
    per-folder reload."""
    import pandas as pd

    map_fn = map if pool is None else pool.map
    df = pd.concat(list(map_fn(quantile_worker(**kwargs), names)))
    if filename is not None:
        _write(df, filename)
    return df


RESULTS_PROPS = ("mass", "radius", "Teff", "logg", "feh", "age", "distance", "AV")


def write_results_txt(folder, models="mist", mult="single", props=RESULTS_PROPS):
    """Per-folder ``{models}_{mult}_results.txt`` with med/lo/hi (50/15.85/
    84.15%) of each physical property (the reference
    ``scripts/starfit-summarize`` folders mode, lines 75-110).

    Reads the stored derived_samples table directly (works for flat AND tree
    models; no interpolator rebuild — the reference likewise reads the
    samples table, not the model)."""
    import json

    import h5py
    import pandas as pd

    path = os.path.join(folder, f"{models}_starmodel_{mult}.h5")
    with h5py.File(path, "r") as f:
        gd = f["derived_samples"]
        ds = pd.DataFrame(np.asarray(gd["values"]), columns=json.loads(gd.attrs["columns"]))
    results_file = os.path.join(folder, f"{models}_{mult}_results.txt")
    vals = []
    for p in props:
        col = next((c for c in (p, f"{p}_0_0", f"{p}_0") if c in ds.columns), None)
        if col is None:
            vals.append("nan nan nan")
            continue
        med, lo, hi = ds[col].quantile([0.5, 0.1585, 0.8415])
        vals.append(f"{med:.3f} {lo:.3f} {hi:.3f}")
    with open(results_file, "w") as f:
        f.write(" ".join(f"{p} {p}_lo {p}_hi" for p in props) + " \n")
        f.write(" ".join(vals) + " \n")
    return results_file


def _write(df, filename):
    if str(filename).endswith((".h5", ".hdf", ".hdf5")):
        try:
            df.to_hdf(filename, key="df")
        except ImportError:  # pytables not installed: fall back to csv
            filename = str(filename) + ".csv"
            df.to_csv(filename)
    else:
        df.to_csv(filename)
    print(f"Summary dataframe written to {filename}")
