"""Native C++ kernels must agree with the pure-Python reference paths."""

import numpy as np
import pytest

from eonerf_code_tpu import native
from eonerf_code_tpu.eval import registration as reg
from eonerf_code_tpu.geo import rpc as rpc_mod
from tests.test_geo import make_synthetic_rpc

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


class TestNativeRPC:
    def test_localize_matches_python(self, rng):
        rpc = make_synthetic_rpc(0.05)
        cols = rng.uniform(0, 1000, 5000)
        rows = rng.uniform(0, 1000, 5000)
        alts = rng.uniform(-30, 120, 5000)
        lon_py, lat_py = rpc_mod.localize(rpc.coeffs(), cols, rows, alts)
        lon_c, lat_c = native.rpc_localize(rpc, cols, rows, alts)
        np.testing.assert_allclose(lon_c, lon_py, rtol=0, atol=1e-14)
        np.testing.assert_allclose(lat_c, lat_py, rtol=0, atol=1e-14)

    def test_project_matches_python(self, rng):
        rpc = make_synthetic_rpc(0.05)
        lons = rng.uniform(-81.70, -81.62, 3000)
        lats = rng.uniform(30.31, 30.39, 3000)
        alts = rng.uniform(-30, 120, 3000)
        col_py, row_py = rpc_mod.project(rpc.coeffs(), lons, lats, alts)
        col_c, row_c = native.rpc_project(rpc, lons, lats, alts)
        np.testing.assert_allclose(col_c, col_py, rtol=0, atol=1e-10)
        np.testing.assert_allclose(row_c, row_py, rtol=0, atol=1e-10)

    def test_dispatch_through_rpcmodel(self, rng):
        """RPCModel.localization auto-dispatches to native for big batches and
        must agree with the forced-python path."""
        rpc = make_synthetic_rpc(0.05)
        cols = rng.uniform(0, 1000, 8192)
        rows = rng.uniform(0, 1000, 8192)
        alts = np.full(8192, 20.0)
        lon_n, lat_n = rpc.localization(cols, rows, alts, use_native=True)
        lon_p, lat_p = rpc.localization(cols, rows, alts, use_native=False)
        np.testing.assert_allclose(lon_n, lon_p, atol=1e-14)
        np.testing.assert_allclose(lat_n, lat_p, atol=1e-14)


class TestNativeNCC:
    def test_search_matches_python(self, rng):
        base = rng.standard_normal((140, 140))
        from numpy.lib.stride_tricks import sliding_window_view

        sm = sliding_window_view(base, (9, 9)).mean(axis=(2, 3))
        u = sm[4:104, 4:104]
        v = sm[1:101, 7:107]  # shifted copy
        u3, v3 = u[None], v[None]
        dx_py, dy_py = reg.compute_ncc(u3, v3, 5, 0, 0, use_native=False)
        dx_c, dy_c = native.ncc_search(u, v, 5, 0, 0)
        assert (dx_c, dy_c) == (dx_py, dy_py)

    def test_search_with_nans(self, rng):
        u = rng.standard_normal((80, 80))
        u[10:20, 10:20] = np.nan
        v = np.roll(u, (2, -3), axis=(0, 1))
        dx_py, dy_py = reg.compute_ncc(u[None], v[None], 5, 0, 0, use_native=False)
        dx_c, dy_c = native.ncc_search(u, v, 5, 0, 0)
        assert (dx_c, dy_c) == (dx_py, dy_py)

    def test_downsample_matches_python(self, rng):
        u = rng.standard_normal((31, 45))
        u[3, 4] = np.nan
        out_py = reg.downsample2x(u[None])[0]
        out_c = native.downsample2x(u)
        np.testing.assert_allclose(out_c, out_py, atol=1e-12, equal_nan=True)
