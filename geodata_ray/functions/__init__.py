"""Vectorized numeric kernels mirroring the reference's conversion
library (wind laws, PV chain, unit conversions) over flat numpy columns
instead of xarray grids."""
