from .synthetic import SyntheticStellarGrids, make_synthetic_grids, DEFAULT_BANDS, STANDARD_COLUMNS

__all__ = ["SyntheticStellarGrids", "make_synthetic_grids", "DEFAULT_BANDS", "STANDARD_COLUMNS"]
