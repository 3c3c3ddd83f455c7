"""Grid management base classes (L1).

Rebuild of ``isochrones/grid.py:10-144`` (``Grid``),
``isochrones/models.py:26-250`` (``StellarModelGrid``), and
``isochrones/bc.py:9-118`` (``BolometricCorrectionGrid``): download tarballs,
parse raw tables into standardized multi-index DataFrames, cache
(parquet here — pytables is not in this environment), and densify into
device-resident :class:`~isochrones_tpu.ops.interp.GridData` arrays.

All heavy lifting is host-side, one-time bake work; the product is a pytree
of dense f32/f64 arrays living in HBM.
"""

from __future__ import annotations

import os
import tarfile

import numpy as np

from .. import config
from ..logger import getLogger
from ..ops.interp import GridInterpolator
from ..utils import G_CGS, MSUN_CGS, RSUN_CGS, download_file

__all__ = ["Grid", "StellarModelGrid", "BolometricCorrectionGrid"]


class Grid:
    """Base model-grid manager (reference grid.py:10-144)."""

    index_cols = None
    is_full = False
    bounds = tuple()
    name = None

    def __init__(self, **kwargs):
        self.kwargs = dict(getattr(self, "default_kwargs", {}))
        self.kwargs.update(kwargs)
        self._df = None
        self._df_orig = None
        self._interp = None
        self._interp_orig = None
        self._limits = dict(self.bounds)

    def get_limits(self, prop):
        """reference grid.py:58-61"""
        if prop not in self._limits:
            self._limits[prop] = (self.df[prop].min(), self.df[prop].max())
        return self._limits[prop]

    @property
    def datadir(self):
        raise NotImplementedError

    # ------------------------------------------------------------- downloads
    def get_tarball_url(self, **kwargs):
        raise NotImplementedError

    def get_tarball_file(self, **kwargs):
        raise NotImplementedError

    def download_tarball(self, **kwargs):
        """reference grid.py:80-87"""
        os.makedirs(self.datadir, exist_ok=True)
        tarball = self.get_tarball_file(**kwargs)
        if not os.path.exists(tarball):
            url = self.get_tarball_url(**kwargs)
            getLogger().info("Downloading %s...", url)
            download_file(url, tarball)

    def extract_tarball(self, **kwargs):
        """Extract, with corrupted-download delete-and-retry
        (reference grid.py:89-101)."""
        tarball = self.get_tarball_file(**kwargs)
        if not os.path.exists(tarball):
            self.download_tarball(**kwargs)
        try:
            with tarfile.open(tarball) as tar:
                getLogger().info("Extracting %s...", tarball)
                tar.extractall(self.datadir)
        except (EOFError, tarfile.ReadError):
            getLogger().error("%s corrupted; deleting and re-downloading.", tarball)
            os.remove(tarball)
            self.extract_tarball(**kwargs)

    # ----------------------------------------------------------------- cache
    def get_cache_filename(self, orig=False):
        raise NotImplementedError

    # Reference-named cache aliases (grid.py:67-118): the cache format here
    # is parquet, not pytables HDF (pytables is unavailable), so the "hdf"
    # names map onto the parquet cache.
    def get_hdf_filename(self, **kwargs):
        """reference grid.py:67-68"""
        return self.get_cache_filename(**kwargs)

    @property
    def hdf_filename(self):
        """reference grid.py:70-72"""
        return self.get_hdf_filename()

    def read_hdf(self, orig=False):
        """reference grid.py:103-110"""
        return self.read_cache(orig=orig)

    def write_hdf(self, orig=False):
        """reference grid.py:112-118"""
        return self.write_cache(orig=orig)

    def read_cache(self, orig=False):
        """Read the parsed-table cache, rebuilding on any failure
        (reference read_hdf, grid.py:103-110)."""
        import pandas as pd

        fn = self.get_cache_filename(orig=orig)
        try:
            return pd.read_parquet(fn)
        except Exception:
            return self.write_cache(orig=orig)

    def write_cache(self, orig=False):
        """reference write_hdf, grid.py:112-118"""
        df = self.get_df(orig=orig)
        fn = self.get_cache_filename(orig=orig)
        os.makedirs(os.path.dirname(fn), exist_ok=True)
        df.to_parquet(fn)
        getLogger().info("grid cache written to %s.", fn)
        return df

    def get_df(self, orig=False):
        raise NotImplementedError

    @property
    def df(self):
        if self._df is None:
            self._df = self.read_cache()
        return self._df

    @property
    def df_orig(self):
        if self._df_orig is None:
            self._df_orig = self.read_cache(orig=True)
        return self._df_orig

    # ----------------------------------------------------------- interpolator
    @property
    def interp(self):
        """Lazy dense interpolator (reference grid.py:133-137)."""
        if self._interp is None:
            filename = getattr(self, "interp_grid_npz_filename", None)
            self._interp = GridInterpolator(self.df, filename=filename, is_full=self.is_full)
        return self._interp

    @property
    def interp_orig(self):
        """Interpolator over the un-standardized table (reference grid.py:139-144)."""
        if self._interp_orig is None:
            filename = getattr(self, "interp_grid_orig_npz_filename", None)
            self._interp_orig = GridInterpolator(self.df_orig, filename=filename, is_full=self.is_full)
        return self._interp_orig

    @property
    def grid_data(self):
        return self.interp.grid_data


class StellarModelGrid(Grid):
    """Stellar-evolution grids with a standard column schema
    (reference models.py:26-250)."""

    default_columns = (
        "eep", "age", "feh", "mass", "initial_mass", "radius", "density",
        "logTeff", "Teff", "logg", "logL", "Mbol",
    )

    def get_dm_deep(self, compute=False):
        """d(initial_mass)/d(EEP) along isochrones (reference
        models.py:126-153); concrete grids implement it — see
        ``grids/mist.py::MISTIsochroneGrid.get_dm_deep``."""
        raise NotImplementedError

    @property
    def prop_map(self):
        """Standard-name -> raw-column mapping (reference models.py:44-56)."""
        return dict(
            eep=self.eep_col,
            age=self.age_col,
            feh=self.feh_col,
            mass=self.mass_col,
            initial_mass=self.initial_mass_col,
            logTeff=self.logTeff_col,
            logg=self.logg_col,
            logL=self.logL_col,
        )

    @property
    def column_map(self):
        return {v: k for k, v in self.prop_map.items()}

    @property
    def datadir(self):
        return os.path.join(config.ISOCHRONES, self.name)

    @property
    def kwarg_tag(self):
        raise NotImplementedError

    def get_directory_path(self, **kwargs):
        raise NotImplementedError

    def get_existing_filenames(self, **kwargs):
        """reference models.py:70-76"""
        import re

        d = self.get_directory_path(**kwargs)
        if not os.path.exists(d):
            self.extract_tarball(**kwargs)
        return [os.path.join(d, f) for f in sorted(os.listdir(d)) if re.search(self.filename_pattern, f)]

    def get_filenames(self, **kwargs):
        return self.get_existing_filenames(**kwargs)

    @classmethod
    def get_feh(cls, filename):
        raise NotImplementedError

    @classmethod
    def to_df(cls, filename):
        raise NotImplementedError

    def df_all(self):
        """Full original grid (reference models.py:91-99)."""
        import pandas as pd

        df = pd.concat([self.to_df(f) for f in self.get_filenames()])
        df = df.sort_values(by=list(self.index_cols))
        df.index = pd.MultiIndex.from_arrays([df[c] for c in self.index_cols])
        return df

    def compute_additional_columns(self, df):
        """Teff/Mbol/radius/density (reference models.py:102-109)."""
        df["Teff"] = 10 ** df["logTeff"]
        df["Mbol"] = 4.74 - 2.5 * df["logL"]
        df["radius"] = 10 ** df["log_R"]
        df["density"] = df["mass"] * MSUN_CGS / (4.0 / 3 * np.pi * (df["radius"] * RSUN_CGS) ** 3)
        return df

    def get_df(self, orig=False):
        """Standardized grid (reference models.py:111-120)."""
        df = self.df_all()
        if not orig:
            df = df.rename(columns=self.column_map)
            df = self.compute_additional_columns(df)
            df = df[list(self.default_columns)]
        return df

    def get_cache_filename(self, orig=False):
        tag = "_orig" if orig else ""
        return os.path.join(self.datadir, f"{self.name}{self.kwarg_tag}{tag}.parquet")

    @property
    def interp_grid_npz_filename(self):
        return os.path.join(self.datadir, f"full_grid{self.kwarg_tag}.npz")

    # ------------------------------------------------- EEP-inversion support
    @property
    def array_grid_filename(self):
        return os.path.join(self.datadir, f"array_grid{self.kwarg_tag}.npz")

    def get_array_grids(self, recalc=False):
        """Ragged per-(feh, mass) age matrices for fast EEP inversion
        (reference models.py:171-205). Returns (age (+inf padded), dt_deep,
        lengths)."""
        fn = self.array_grid_filename
        if recalc or not os.path.exists(fn):
            if self.eep_replaces != "age":
                raise NotImplementedError("Not implemented for isochrone grids (as in reference)")
            df = self.df
            ii0 = df.index.levels[0]
            ii1 = df.index.levels[1]
            n = len(ii0) * len(ii1)
            n_eep = self.n_eep
            age_arrays = np.full((n, n_eep), np.inf)
            dt_arrays = np.full((n, n_eep), np.nan)
            lengths = np.zeros(n, dtype=int)
            grouped = df.groupby(level=[0, 1])
            index_of = {}
            import itertools

            for i, (x0, x1) in enumerate(itertools.product(ii0, ii1)):
                index_of[(x0, x1)] = i
            for (x0, x1), subdf in grouped:
                i = index_of[(x0, x1)]
                xs = subdf["age"].values
                lengths[i] = len(xs)
                age_arrays[i, : len(xs)] = xs
                dt_arrays[i, : len(xs)] = subdf["dt_deep"].values
            os.makedirs(os.path.dirname(fn), exist_ok=True)
            np.savez(fn, age=age_arrays, dt_deep=dt_arrays, lengths=lengths)
        d = np.load(fn)
        return d["age"], d["dt_deep"], d["lengths"]

    def _load_array_grids(self):
        if getattr(self, "_age_grid", None) is None:
            self._age_grid, self._dt_deep_grid, self._array_lengths = self.get_array_grids()

    @property
    def age_grid(self):
        """reference models.py:211-220"""
        self._load_array_grids()
        return self._age_grid

    @property
    def dt_deep_grid(self):
        """reference models.py:222-231"""
        self._load_array_grids()
        return self._dt_deep_grid

    @property
    def array_lengths(self):
        """reference models.py:233-243"""
        self._load_array_grids()
        return self._array_lengths

    @property
    def interp_grid_orig_npz_filename(self):
        """reference models.py:167-169"""
        return os.path.join(self.datadir, f"full_grid_orig{self.kwarg_tag}.npz")

    @property
    def n_masses(self):
        """reference models.py:244-250"""
        return len(self.df.index.levels[1])


class BolometricCorrectionGrid(Grid):
    """Bolometric-correction tables per photometric system
    (reference bc.py:9-118)."""

    index_cols = ("Teff", "logg", "[Fe/H]", "Av", "Rv")
    name = None
    is_full = True

    def __init__(self, bands=None, **kwargs):
        super().__init__(**kwargs)
        self.bands = list(bands) if bands is not None else list(self.default_bands)
        self._band_map = None
        self._phot_systems = None

    def get_band(self, *args, **kwargs):
        raise NotImplementedError

    def _make_band_map(self):
        """reference bc.py:42-50"""
        phot_systems = set()
        band_map = {}
        for b in self.bands:
            phot, band = self.get_band(b)
            phot_systems.add(phot)
            band_map[b] = band
        self._band_map = band_map
        self._phot_systems = phot_systems

    @property
    def band_map(self):
        if self._band_map is None:
            self._make_band_map()
        return self._band_map

    @property
    def phot_systems(self):
        if self._phot_systems is None:
            self._make_band_map()
        return self._phot_systems

    @property
    def datadir(self):
        return os.path.join(config.ISOCHRONES, "BC", self.name)

    def get_filename(self, phot, feh):
        """reference bc.py:68-72"""
        sign_str = "m" if feh < 0 else "p"
        return os.path.join(self.datadir, "feh{0}{1:03.0f}.{2}".format(sign_str, abs(feh) * 100, phot))

    def parse_table(self, filename):
        """Whitespace BC table -> indexed DataFrame (reference bc.py:74-84);
        column names live on (comment) line 6."""
        import pandas as pd

        from .parse import read_whitespace_table

        with open(filename) as fin:
            for i, line in enumerate(fin):
                if i == 5:
                    names = line[1:].split()
                    break
        df = read_whitespace_table(filename, names=names)
        return df.set_index(list(self.index_cols))

    def get_table(self, phot, feh):
        return self.parse_table(self.get_filename(phot, feh))

    def get_cache_filename(self, phot=None, orig=False):
        """Per-system raw-table cache when ``phot`` is given; otherwise the
        merged-table cache the inherited read/write_cache paths use (a bare
        f-string on phot=None used to create a junk ``None.parquet``)."""
        if phot is None:
            tag = "_orig" if orig else ""
            return os.path.join(self.datadir, f"bc_merged{tag}.parquet")
        return os.path.join(self.datadir, f"{phot}.parquet")

    def get_tarball_url(self, phot):
        return f"http://waps.cfa.harvard.edu/MIST/BC_tables/{phot}.txz"

    def get_tarball_file(self, phot):
        return os.path.join(self.datadir, f"{phot}.txz")

    def get_df(self, orig=False):
        """Merge systems column-wise, rename to shortcut names
        (reference bc.py:99-118)."""
        import glob

        import pandas as pd

        df_all = None
        for phot in sorted(self.phot_systems):
            cache = self.get_cache_filename(phot=phot)
            if not os.path.exists(cache):
                filenames = glob.glob(os.path.join(self.datadir, f"*.{phot}"))
                if not filenames:
                    self.extract_tarball(phot=phot)
                    filenames = glob.glob(os.path.join(self.datadir, f"*.{phot}"))
                df = pd.concat([self.parse_table(f) for f in filenames]).sort_index()
                df.to_parquet(cache)
            df = pd.read_parquet(cache)
            df_all = df if df_all is None else pd.concat([df_all, df], axis=1)

        if orig:
            return df_all  # merged, original column names
        df_all = df_all.rename(columns={v: k for k, v in self.band_map.items()})
        return df_all[[c for c in df_all.columns if c in self.bands]]

    @property
    def df(self):
        if self._df is None:
            self._df = self.get_df()
        return self._df
