"""Catalog query-result base class.

Rebuild of ``isochrones/query/catalog.py:8-111``: proper-motion-corrected
query position, closest/brightest match selection, photometry dictionaries
with systematic-uncertainty floors, and a quality-cut hook.
"""

from __future__ import annotations

import numpy as np

from .query import EmptyQueryError

__all__ = ["Catalog"]


class Catalog:
    """Base class for results of catalog queries (reference catalog.py:8-111).

    Subclasses define ``name``, ``epoch``, ``bands`` (raw->shortcut column
    map), ``id_column``, and ``_run_query`` filling ``self._table`` (a pandas
    DataFrame including a ``_r`` separation column).
    """

    _distance_column = "_r"

    def __init__(self, query):
        self.query = query
        self._table = None
        self._empty = False

    def __repr__(self):
        return f"{type(self).__name__}({self.query!r})"

    def __str__(self):
        return f"{self.name} Query of {self.query}"

    @property
    def query_coords(self):
        """(ra, dec) at the catalog epoch (reference catalog.py:34-42)."""
        return self.query.coords_at_epoch(self.epoch)

    @property
    def coords(self):
        """(ra, dec) arrays of the result rows in degrees (reference
        catalog.py:27-31; numpy arrays here — no astropy dependency)."""
        t = self.table
        return (np.asarray(t["_RAJ2000"], dtype=float), np.asarray(t["_DEJ2000"], dtype=float))

    def _run_query(self):
        raise NotImplementedError

    @property
    def table(self):
        if self._table is None:
            self._run_query()
            self._table["is_good"] = np.asarray(self.is_good)
        return self._table

    @property
    def df(self):
        df = self.table
        df = df.loc[df["is_good"]]
        if len(df) == 0:
            raise EmptyQueryError(f"No good sources found! ({self.query})")
        return df

    @property
    def closest(self):
        return self.df.sort_values(by=self._distance_column).iloc[0]

    @property
    def brightest(self):
        band = list(self.bands.keys())[0]
        return self.df.sort_values(by=band).iloc[0]

    def get_id(self, brightest=False):
        row = self.brightest if brightest else self.closest
        return row[self.id_column]

    def get_photometry(self, brightest=False, systematic_unc=0.0, convert=True):
        """Photometry dict of the closest (or brightest) match
        (reference catalog.py:76-105)."""
        row = self.brightest if brightest else self.closest
        if not hasattr(self, "conversions"):
            convert = False

        d = {}
        if convert:
            for b in self.conversions:
                mag, dmag = getattr(self, b)(brightest=brightest)
                d[b] = (mag, np.sqrt(dmag ** 2 + systematic_unc ** 2))
        else:
            for raw, key in self.bands.items():
                mag, dmag = row[raw], row[f"e_{raw}"]
                d[key] = (mag, np.sqrt(dmag ** 2 + systematic_unc ** 2))
        return d

    @property
    def is_good(self):
        """Quality-cut hook (reference catalog.py:107-111). The strict
        ``> 0`` matches the reference exactly: it doubles as a NaN filter
        (NaN > 0 is False), at the (shared, measure-zero) cost of dropping
        a source at exactly the query position."""
        return np.asarray(self._table[self._distance_column]) > 0
