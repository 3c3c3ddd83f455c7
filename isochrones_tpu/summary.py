"""Batch fit summaries.

Rebuild of ``isochrones/summary.py:9-76`` (``get_quantiles`` worker +
pool-mapped ``get_summary_df``). The reference parallelizes with schwimmbad
(multiprocessing or MPI, scripts/starfit-summarize); here a plain
``multiprocessing.Pool`` (or any object with ``.map``) fills that role —
summaries are host-side file crunching, not device work.
"""

from __future__ import annotations

import os
import re

__all__ = ["get_quantiles", "quantile_worker", "get_summary_df"]


def get_quantiles(
    name,
    rootdir=".",
    columns=("eep", "mass", "radius", "age", "feh", "distance", "AV"),
    qs=(0.05, 0.16, 0.5, 0.84, 0.95),
    modelname="mist_starmodel_single",
    verbose=False,
    raise_exceptions=False,
):
    """Parameter quantiles for one fitted starmodel (reference summary.py:9-46)."""
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

    true_cols = []
    for c1 in mod.derived_samples.columns:
        for c2 in columns:
            if re.search(c2, c1):
                true_cols.append(c1)

    q_df = mod.derived_samples[true_cols].quantile(list(qs))
    df = pd.DataFrame(index=[name])
    for c in true_cols:
        for q in qs:
            df.loc[name, c + "_{:02.0f}".format(q * 100)] = q_df.loc[q, c]
    return df


class quantile_worker:
    """Picklable pool worker (reference summary.py:49-54)."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self, name):
        return get_quantiles(name, **self.kwargs)


def get_summary_df(names=None, pool=None, filename=None, **kwargs):
    """Concatenated quantile summary over many fits (reference summary.py:57-76)."""
    import pandas as pd

    map_fn = map if pool is None else pool.map
    worker = quantile_worker(**kwargs)
    df = pd.concat(list(map_fn(worker, names)))
    if filename is not None:
        if str(filename).endswith((".h5", ".hdf", ".hdf5")):
            try:
                df.to_hdf(filename, key="df")
            except ImportError:  # pytables not installed: fall back to csv
                filename = str(filename) + ".csv"
                df.to_csv(filename)
        else:
            df.to_csv(filename)
        print(f"Summary dataframe written to {filename}")
    return df
