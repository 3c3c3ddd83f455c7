"""Star catalogs (tables of per-star measurements).

Rebuild of ``isochrones/catalog.py:19-158`` (``StarCatalog``): a DataFrame of
``<band>_mag`` / ``<band>_mag_unc`` photometry plus named property columns
with ``_unc`` partners, per-row star-model factories, and batch ini writing.
CMD plotting uses matplotlib (the reference's holoviews path is optional
there too).
"""

from __future__ import annotations

import os
import re
import shutil

import numpy as np

from .utils import band_pairs

__all__ = ["StarCatalog"]


class StarCatalog:
    """Catalog of star measurements (reference catalog.py:19-63).

    df : DataFrame with ``<band>_mag``/``<band>_mag_unc`` columns (bands
        inferred from ``*_mag`` names when not given) and ``prop``/
        ``prop_unc`` columns for each entry of ``props``. When ``props``
        is None, known spectroscopic/astrometric properties present with
        an ``_unc`` partner are auto-detected (mirrors the reference
        StarModel's ini-key inference, starmodel.py) — pass ``props=()``
        to use photometry only.
    """

    # auto-detectable measured properties: grid-derivable spectroscopy +
    # parallax. AV is deliberately absent — it is a sampled model parameter
    # here, not an observable, and the cluster likelihood has no grid
    # column for it.
    KNOWN_PROPS = ("Teff", "logg", "feh", "parallax", "density")

    def __init__(self, df, bands=None, props=None, no_uncs=False):
        self._df = df

        if bands is None:
            bands = [m.group(1) for c in df.columns if (m := re.search("(.+)_mag$", c))]
        self.bands = tuple(bands)
        self.band_cols = tuple(f"{b}_mag" for b in self.bands)
        if props is None:
            props = tuple(
                p for p in self.KNOWN_PROPS
                if p in df.columns and f"{p}_unc" in df.columns
            )
            if props:
                from .logger import getLogger

                getLogger().info(
                    "StarCatalog: auto-detected measured props %s (pass "
                    "props=() for photometry-only)", props,
                )
        self.props = tuple(props)

        if not no_uncs:
            for c in self.band_cols + self.props:
                if c not in df.columns:
                    raise ValueError(f"{c} not in DataFrame!")
                if f"{c}_unc" not in df.columns:
                    raise ValueError(f"{c} uncertainty ({c}_unc) not in DataFrame!")

        self._prior_settings = {}

    def __len__(self):
        return len(self._df)

    @property
    def df(self):
        return self._df

    @df.setter
    def df(self, newdf):
        self._df = newdf

    def get_measurement(self, prop, values=False):
        """(values, uncertainties) arrays (reference catalog.py:82-84)."""
        return self.df[prop].values, self.df[prop + "_unc"].values

    def iter_bands(self, **kwargs):
        for b, col in zip(self.bands, self.band_cols):
            yield b, self.get_measurement(col, **kwargs)

    def iter_props(self, **kwargs):
        for p in self.props:
            yield p, self.get_measurement(p, **kwargs)

    def observation_stacks(self):
        """Observations as dense float stacks — ``(mag_vals, mag_uncs,
        prop_vals, prop_uncs)`` with shapes (S, n_bands) / (S, n_props)
        (zero-width prop arrays when no props). The star axis leads so the
        stacks shard/vmap directly (cluster likelihood, dataset-parametric
        SBC replicas)."""
        import numpy as np

        mag_vals = np.stack([v for _, (v, u) in self.iter_bands()], axis=-1)
        mag_uncs = np.stack([u for _, (v, u) in self.iter_bands()], axis=-1)
        props = [(np.asarray(v, dtype=float), np.asarray(u, dtype=float))
                 for _, (v, u) in self.iter_props()]
        n = mag_vals.shape[0]
        if props:
            prop_vals = np.stack([v for v, _ in props], axis=-1)
            prop_uncs = np.stack([u for _, u in props], axis=-1)
        else:
            prop_vals = np.zeros((n, 0))
            prop_uncs = np.ones((n, 0))
        return mag_vals, mag_uncs, prop_vals, prop_uncs

    # ------------------------------------------------------------------ plots
    @property
    def ds(self):
        """Holoviews dataset of magnitudes + colors (reference
        catalog.py:91-104). Requires the optional ``holoviews`` dependency,
        exactly as the reference does; :meth:`hr_plot` is the
        matplotlib-only equivalent."""
        import holoviews as hv  # optional dep, same as reference

        if getattr(self, "_ds", None) is None:
            df = self.df.copy()
            for b1, b2 in band_pairs(self.bands):
                df[b2] = self.df[f"{b2}_mag"]
                df[f"{b1}-{b2}"] = self.df[f"{b1}_mag"] - self.df[f"{b2}_mag"]
            self._ds = hv.Dataset(df)
        return self._ds

    @property
    def hr(self):
        """Holoviews CMD layout (reference catalog.py:106-115); see
        :meth:`hr_plot` for the matplotlib equivalent."""
        import holoviews as hv

        if getattr(self, "_hr", None) is None:
            layout = []
            opts = dict(invert_yaxis=True, tools=["hover"])
            for b1, b2 in band_pairs(self.bands):
                kdims = [f"{b1}-{b2}", f"{b1}_mag"]
                layout.append(hv.Points(self.ds, kdims=kdims, vdims=self.ds.kdims).options(**opts))
            self._hr = hv.Layout(layout)
        return self._hr

    def hr_plot(self, ax=None):
        """Color-magnitude diagram(s) (reference ``hr`` via holoviews,
        catalog.py:91-115)."""
        import matplotlib.pyplot as plt

        pairs = band_pairs(self.bands)
        if ax is None:
            fig, axes = plt.subplots(1, max(len(pairs), 1), figsize=(4 * max(len(pairs), 1), 4))
            axes = np.atleast_1d(axes)
        else:
            axes = np.atleast_1d(ax)
            fig = axes[0].figure
        for (b1, b2), a in zip(pairs, axes):
            color = self.df[f"{b1}_mag"] - self.df[f"{b2}_mag"]
            a.scatter(color, self.df[f"{b1}_mag"], s=6, alpha=0.7)
            a.invert_yaxis()
            a.set_xlabel(f"{b1} - {b2}")
            a.set_ylabel(f"{b1}")
        return fig

    # ------------------------------------------------------------------ priors
    def _set_prior(self, mod):
        mod.set_prior(**self._prior_settings)
        return mod

    def set_prior(self, **kwargs):
        """Prior settings applied to every generated model (catalog.py:117-124)."""
        self._prior_settings.update(kwargs)

    # ------------------------------------------------------------------ models
    def iter_models(self, ic=None, N=1):
        """Per-row star-model factory (reference catalog.py:126-139)."""
        from .starmodel import BinaryStarModel, SingleStarModel, TripleStarModel

        if ic is None:
            from .isochrone import get_ichrone

            ic = get_ichrone("mist", bands=self.bands)

        mod_type = {1: SingleStarModel, 2: BinaryStarModel, 3: TripleStarModel}
        for i in range(len(self.df)):
            row = self.df.iloc[i]
            mags = {b: (row[f"{b}_mag"], row[f"{b}_mag_unc"]) for b in self.bands}
            props = {p: (row[p], row[f"{p}_unc"]) for p in self.props}
            mod = mod_type[N](ic, **mags, **props, name=row.name)
            yield self._set_prior(mod)

    def write_ini(self, ic=None, root=".", N=1, nest_directories=True, clobber=True):
        """Batch star.ini writing, optionally nested into log-100 subdirs
        (reference catalog.py:141-158)."""
        if ic is None:
            from .isochrone import get_ichrone

            ic = get_ichrone("mist", bands=self.bands)

        n_pre = int(np.log10(len(self)) // 2)
        dirs = []
        for mod in self.iter_models(ic, N=N):
            path = os.path.join(root, str(mod.name)[:n_pre]) if nest_directories else root
            mod_path = os.path.abspath(os.path.join(path, str(mod.name)))
            if os.path.exists(mod_path) and clobber:
                shutil.rmtree(mod_path)
            mod.write_ini(root=path)
            dirs.append(mod_path)
        return dirs
