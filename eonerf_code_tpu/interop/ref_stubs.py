"""Stub modules that let the reference's code import and RUN on CPU.

Each stub is backed by this framework's own from-scratch equivalent of the
native dependency it replaces (SURVEY §2b):

    rasterio    -> eonerf_code_tpu.io.geotiff   (pure-python TIFF codec)
    rpcm        -> eonerf_code_tpu.geo.rpc      (Newton-inverse RPC)
    pyproj/utm  -> eonerf_code_tpu.geo.utm      (Karney transverse Mercator)
    plyflatten  -> eonerf_code_tpu.ops.raster   (mean-splat rasterization)
    affine      -> eonerf_code_tpu.io.geotiff.Affine
    nerfacc     -> eonerf_code_tpu.interop.nerfacc_torch (pure torch)
    numba       -> identity @jit (loops run as plain python)
    torchvision -> minimal transforms.Resize on F.interpolate

The numerical agreement of these backends with the real libraries is
pinned by tests/test_reference_oracle.py (RPC polynomial, geodesy, NCC)
and tests/test_geotiff.py; the stubs only adapt call signatures.

Used by ref_runner to execute /root/reference/train_eonerf.py, and by the
head-to-head tests. Import-time cost is kept minimal: the backing modules
are imported lazily inside the builder.
"""

import contextlib
import sys
import types


def _identity_jit(f=None, **kwargs):
    if callable(f):
        return f
    return lambda g: g


def _build_rasterio():
    import numpy as np

    from eonerf_code_tpu.io.geotiff import GeoTiffFile, write_geotiff

    class _Writer:
        def __init__(self, path, profile):
            self.path = path
            self.profile = dict(profile)
            count = int(self.profile.get("count", 1))
            h, w = int(self.profile["height"]), int(self.profile["width"])
            self._data = np.zeros((count, h, w), np.float32)

        def write(self, arr, band=None):
            arr = np.asarray(arr)
            if band is not None:
                self._data[band - 1] = arr
            else:
                self._data = arr.reshape(self._data.shape).astype(np.float32)

        def close(self):
            write_geotiff(self.path, self._data, profile=self.profile)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self.close()

    def _open(path, mode="r", **profile):
        if mode == "r":
            return GeoTiffFile(path)
        return _Writer(path, profile)

    m = types.ModuleType("rasterio")
    m.open = _open
    m.float32 = "float32"
    m.float64 = "float64"
    return m


def _build_rpcm():
    from eonerf_code_tpu.geo.rpc import RPCModel as _Ours

    class RPCModel(_Ours):
        def __init__(self, d, dict_format="rpcm"):
            super().__init__(d)

    m = types.ModuleType("rpcm")
    m.RPCModel = RPCModel
    return m


def _parse_utm_proj(projstring):
    """'+proj=utm +zone=17 +south' / '+proj=utm +zone=17R' -> (zone, south)."""
    s = str(projstring)
    zone_part = s.split("zone=")[1].split()[0]
    digits = "".join(ch for ch in zone_part if ch.isdigit())
    letters = "".join(ch for ch in zone_part if ch.isalpha())
    south = "+south" in s or (bool(letters) and letters.upper() < "N")
    return int(digits), south


def _build_pyproj():
    from eonerf_code_tpu.geo.utm import tm_inverse, tm_forward, central_meridian_deg

    E0, N0_SOUTH = 500000.0, 10000000.0

    class Proj:
        def __init__(self, projstring):
            self.projstring = str(projstring)
            self.is_utm = "utm" in self.projstring
            if self.is_utm:
                self.zone, self.south = _parse_utm_proj(self.projstring)

    def transform(src, dst, x, y):
        if not src.is_utm and dst.is_utm:  # lonlat -> utm (x=lons, y=lats)
            e, n = tm_forward(y, x, central_meridian_deg(dst.zone))
            return e + E0, n + (N0_SOUTH if dst.south else 0.0)
        if src.is_utm and not dst.is_utm:  # utm -> lonlat
            # PROJ parses '+zone=17R' as zone 17, northern false northing
            lat, lon = tm_inverse(x - E0, y, central_meridian_deg(src.zone))
            return lon, lat
        return x, y

    class Transformer:
        def __init__(self, src, dst):
            self.src, self.dst = src, dst

        @classmethod
        def from_proj(cls, src, dst):
            return cls(src, dst)

        @classmethod
        def from_crs(cls, src, dst, always_xy=False):
            return cls(src if isinstance(src, Proj) else Proj(str(src)),
                       dst if isinstance(dst, Proj) else Proj(str(dst)))

        def transform(self, x, y):
            return transform(self.src, self.dst, x, y)

    class CRS:
        @staticmethod
        def from_proj4(s):
            return Proj(s)

    m = types.ModuleType("pyproj")
    m.Proj = Proj
    m.transform = transform
    m.Transformer = Transformer
    m.CRS = CRS
    return m


def _build_utm():
    from eonerf_code_tpu.geo.utm import latitude_to_zone_letter, latlon_to_zone_number

    m = types.ModuleType("utm")
    m.latlon_to_zone_number = latlon_to_zone_number
    m.latitude_to_zone_letter = latitude_to_zone_letter
    return m


def _build_plyflatten():
    import numpy as np

    from eonerf_code_tpu.io.geotiff import CRS
    from eonerf_code_tpu.ops.raster import rasterize_pointcloud

    def plyflatten(cloud, xoff, yoff, resolution, xsize, ysize, radius=1,
                   sigma=float("inf")):
        dsm = rasterize_pointcloud(cloud[:, 0], cloud[:, 1], cloud[:, 2],
                                   xoff, yoff, resolution, xsize, ysize,
                                   radius=radius)
        return dsm.astype(np.float32)[:, :, None]

    def crs_proj(zonestring, crs_type="UTM"):
        digits = "".join(ch for ch in str(zonestring) if ch.isdigit())
        letters = "".join(ch for ch in str(zonestring) if ch.isalpha())
        south = bool(letters) and letters.upper() < "N"
        return CRS.from_utm_zone(int(digits), south=south)

    m = types.ModuleType("plyflatten")
    m.plyflatten = plyflatten
    u = types.ModuleType("plyflatten.utils")
    u.rasterio_crs = lambda crs: crs
    u.crs_proj = crs_proj
    m.utils = u
    return m, u


def _build_affine():
    from eonerf_code_tpu.io.geotiff import Affine

    m = types.ModuleType("affine")
    m.Affine = Affine
    return m


def _build_torchvision():
    import torch
    import torch.nn.functional as F

    class Resize:
        def __init__(self, size, interpolation=None, antialias=True):
            self.size = tuple(size)
            self.antialias = bool(antialias)

        def __call__(self, img):
            x = img[None] if img.dim() == 3 else img
            out = F.interpolate(x, size=self.size, mode="bicubic",
                                antialias=self.antialias, align_corners=False)
            return out[0] if img.dim() == 3 else out

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Resize = Resize
    tv.transforms = tr
    return tv, tr


def _build_nerfacc():
    from eonerf_code_tpu.interop import nerfacc_torch as nt

    m = types.ModuleType("nerfacc")
    v = types.ModuleType("nerfacc.volrend")
    for mod in (m, v):
        mod.render_weight_from_density = nt.render_weight_from_density
        mod.render_transmittance_from_density = nt.render_transmittance_from_density
        mod.accumulate_along_rays = nt.accumulate_along_rays
    m.OccGridEstimator = nt.OccGridEstimator
    m.rendering = nt.rendering
    m.volrend = v
    return m, v


def build_stub_modules():
    """{module name: functional stub module} for everything the reference
    imports that this environment does not provide."""
    mods = {}
    mods["numba"] = types.ModuleType("numba")
    mods["numba"].jit = _identity_jit
    mods["rasterio"] = _build_rasterio()
    mods["rpcm"] = _build_rpcm()
    mods["pyproj"] = _build_pyproj()
    mods["utm"] = _build_utm()
    mods["plyflatten"], mods["plyflatten.utils"] = _build_plyflatten()
    mods["affine"] = _build_affine()
    mods["torchvision"], mods["torchvision.transforms"] = _build_torchvision()
    mods["nerfacc"], mods["nerfacc.volrend"] = _build_nerfacc()
    return mods


REF_DIR = "/root/reference"

# top-level packages/modules of the reference tree; stashed from sys.modules
# around reference imports so site-packages homonyms (a third-party
# `datasets` exists here) neither shadow the reference nor get evicted
_REF_ROOTS = ("datasets", "radiance_fields", "sat_utils", "sat_rendering",
              "metrics", "dsmr", "opt", "utils", "train_eonerf", "eval_eonerf")


@contextlib.contextmanager
def reference_environment(ref_dir=REF_DIR):
    """Context: stubs installed, ref_dir importable, prior state restored
    on exit (stubs removed, stashed homonym modules put back)."""
    stashed = {}
    for root in _REF_ROOTS:
        for name in [n for n in sys.modules
                     if n == root or n.startswith(root + ".")]:
            stashed[name] = sys.modules.pop(name)
    added = []
    for name, mod in build_stub_modules().items():
        if name not in sys.modules:
            sys.modules[name] = mod
            added.append(name)
    sys.path.insert(0, ref_dir)
    try:
        yield
    finally:
        sys.path.remove(ref_dir)
        for name in added:
            sys.modules.pop(name, None)
        for root in _REF_ROOTS:
            for name in [n for n in sys.modules
                         if n == root or n.startswith(root + ".")]:
                sys.modules.pop(name)
        sys.modules.update(stashed)
