"""Geodesy core: WGS84 ellipsoid, UTM projection, RPC camera models.

Everything here is implemented from scratch (the TPU build has no
pyproj/rpcm/utm dependency) and is written against an array-module
parameter ``xp`` so the same formulas run in float64 numpy on the host
(dataset construction, cm-level parity) and as differentiable jax.numpy
on device (RPC bundle adjustment).
"""

from eonerf_code_tpu.geo.ellipsoid import (
    latlon_to_ecef,
    ecef_to_latlon,
)
from eonerf_code_tpu.geo.utm import (
    utm_from_latlon,
    lonlat_from_utm,
    latlon_to_zone_number,
    latitude_to_zone_letter,
    utm_zonestring_from_lonlat,
    tm_forward,
    tm_inverse,
)
from eonerf_code_tpu.geo.rpc import RPCModel, apply_poly, apply_rfm

__all__ = [
    "latlon_to_ecef",
    "ecef_to_latlon",
    "utm_from_latlon",
    "lonlat_from_utm",
    "latlon_to_zone_number",
    "latitude_to_zone_letter",
    "utm_zonestring_from_lonlat",
    "tm_forward",
    "tm_inverse",
    "RPCModel",
    "apply_poly",
    "apply_rfm",
]
