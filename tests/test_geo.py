"""Geodesy core tests: ECEF/UTM round trips, known invariants, RPC
projection <-> localization round trips (the seams SURVEY.md §4 calls out)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.geo import (
    RPCModel,
    ecef_to_latlon,
    latlon_to_ecef,
    latlon_to_zone_number,
    latitude_to_zone_letter,
    lonlat_from_utm,
    utm_from_latlon,
)
from eonerf_code_tpu.geo import utm as utm_mod
from eonerf_code_tpu.geo import rpc as rpc_mod


class TestEllipsoid:
    def test_roundtrip(self, rng):
        lat = rng.uniform(-80, 80, 1000)
        lon = rng.uniform(-180, 180, 1000)
        alt = rng.uniform(-100, 9000, 1000)
        x, y, z = latlon_to_ecef(lat, lon, alt)
        lat2, lon2, alt2 = ecef_to_latlon(x, y, z)
        # single-pass Bowring: sub-mm at these altitudes
        np.testing.assert_allclose(lat2, lat, atol=1e-7)
        np.testing.assert_allclose(alt2, alt, atol=1e-3)
        # wrap-safe longitude comparison
        dlon = (lon2 - lon + 180) % 360 - 180
        np.testing.assert_allclose(dlon, 0, atol=1e-7)

    def test_known_point_equator(self):
        x, y, z = latlon_to_ecef(0.0, 0.0, 0.0)
        assert abs(x - 6378137.0) < 1e-6 and abs(y) < 1e-6 and abs(z) < 1e-6

    def test_jax_matches_numpy(self):
        lat, lon, alt = np.array([30.35]), np.array([-81.66]), np.array([50.0])
        ref = latlon_to_ecef(lat, lon, alt)
        jx = latlon_to_ecef(jnp.asarray(lat), jnp.asarray(lon), jnp.asarray(alt), xp=jnp)
        for a, b in zip(ref, jx):
            np.testing.assert_allclose(np.asarray(b), a, rtol=1e-12)


class TestUTM:
    def test_zone_conventions(self):
        # Jacksonville (DFC2019 JAX AOIs)
        assert latlon_to_zone_number(30.35, -81.66) == 17
        assert latitude_to_zone_letter(30.35) == "R"
        # IARPA MVS benchmark (Buenos Aires area, southern hemisphere)
        assert latlon_to_zone_number(-34.49, -58.58) == 21
        assert latitude_to_zone_letter(-34.49) == "H"
        # Norway exception
        assert latlon_to_zone_number(60.0, 5.0) == 32
        # Svalbard exception
        assert latlon_to_zone_number(75.0, 20.0) == 33

    def test_central_meridian_is_false_easting(self):
        e, n = utm_from_latlon(np.array([30.0]), np.array([-81.0]))  # zone 17 CM
        assert abs(e[0] - 500000.0) < 1e-6

    def test_pole_northing_invariant(self):
        # Meridian quarter-arc (WGS84) = 10001965.7293 m; northing at the pole
        # must equal k0 times that.
        e, n = utm_mod.tm_forward(np.array([90.0]), np.array([-81.0]), -81.0)
        np.testing.assert_allclose(n[0], 0.9996 * 10001965.7293, atol=2e-3)

    def test_roundtrip_northern(self, rng):
        lat = rng.uniform(30.2, 30.5, 500)
        lon = rng.uniform(-81.9, -81.3, 500)
        e, n = utm_from_latlon(lat, lon)
        lon2, lat2 = lonlat_from_utm(e, n, "17R")
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)

    def test_roundtrip_southern(self, rng):
        lat = rng.uniform(-34.6, -34.3, 500)
        lon = rng.uniform(-58.8, -58.3, 500)
        e, n = utm_from_latlon(lat, lon)
        assert np.all(n > 0)  # false northing applied
        # reference inverse ignores hemisphere: strip the false northing first
        lon2, lat2 = lonlat_from_utm(e, n - utm_mod.N0_SOUTH, "21H")
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)

    def test_scale_factor_at_central_meridian(self):
        # Point scale on the CM is k0 = 0.9996: 1 deg of lat near the equator
        # spans ~110574.39 m of true meridian arc.
        e1, n1 = utm_mod.tm_forward(np.array([0.0]), np.array([0.0]), 0.0)
        e2, n2 = utm_mod.tm_forward(np.array([0.01]), np.array([0.0]), 0.0)
        arc_true = 110574.2727 * 0.01  # meridian arc length for 0.01 deg at equator
        np.testing.assert_allclose((n2[0] - n1[0]) / arc_true, 0.9996, rtol=1e-5)

    def test_jax_matches_numpy(self):
        lat = np.linspace(30.2, 30.5, 16)
        lon = np.linspace(-81.9, -81.3, 16)
        e_np, n_np = utm_from_latlon(lat, lon)
        e_j, n_j = utm_from_latlon(jnp.asarray(lat), jnp.asarray(lon), zone=17, south=False, xp=jnp)
        np.testing.assert_allclose(np.asarray(e_j), e_np, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(n_j), n_np, rtol=1e-12)


def make_synthetic_rpc(nonlinear=0.0):
    """A synthetic but well-conditioned RPC around Jacksonville.

    Linear terms give an oblique pushbroom-like view; optional small cubic
    perturbations exercise the Newton solve beyond the affine regime.
    """
    d = {
        "lat_offset": 30.35, "lat_scale": 0.05,
        "lon_offset": -81.66, "lon_scale": 0.05,
        "alt_offset": 20.0, "alt_scale": 100.0,
        "col_offset": 500.0, "col_scale": 500.0,
        "row_offset": 500.0, "row_scale": 500.0,
    }
    col_num = np.zeros(20)
    row_num = np.zeros(20)
    den = np.zeros(20)
    den[0] = 1.0
    # col ~ lon + parallax in alt; row ~ -lat + parallax (terms: 1=y(lon), 2=x(lat), 3=z)
    col_num[1], col_num[3] = 1.0, 0.15
    row_num[2], row_num[3] = -1.0, 0.08
    if nonlinear:
        col_num[7], col_num[10], col_num[19] = nonlinear, nonlinear / 2, nonlinear / 3
        row_num[8], row_num[13] = nonlinear, nonlinear / 2
        den[9] = nonlinear / 5
    d.update(col_num=col_num.tolist(), row_num=row_num.tolist(),
             col_den=den.tolist(), row_den=den.tolist())
    return RPCModel(d)


class TestRPC:
    @pytest.mark.parametrize("nonlinear", [0.0, 0.05])
    def test_projection_localization_roundtrip(self, rng, nonlinear):
        rpc = make_synthetic_rpc(nonlinear)
        cols = rng.uniform(0, 1000, 2000)
        rows = rng.uniform(0, 1000, 2000)
        alts = rng.uniform(-30, 120, 2000)
        lons, lats = rpc.localization(cols, rows, alts)
        cols2, rows2 = rpc.projection(lons, lats, alts)
        np.testing.assert_allclose(cols2, cols, atol=1e-8)
        np.testing.assert_allclose(rows2, rows, atol=1e-8)

    def test_affine_projection_exact(self):
        rpc = make_synthetic_rpc(0.0)
        col, row = rpc.projection(-81.66, 30.35, 20.0)  # offsets project to offsets
        assert abs(col - 500.0) < 1e-10 and abs(row - 500.0) < 1e-10

    def test_localize_jax_matches_numpy(self, rng):
        rpc = make_synthetic_rpc(0.05)
        cols = rng.uniform(0, 1000, 64)
        rows = rng.uniform(0, 1000, 64)
        alts = rng.uniform(-30, 120, 64)
        lon_np, lat_np = rpc.localization(cols, rows, alts)
        coeffs = rpc.coeffs(xp=jnp, dtype=jnp.float64)
        lon_j, lat_j = rpc_mod.localize(coeffs, jnp.asarray(cols), jnp.asarray(rows),
                                        jnp.asarray(alts), xp=jnp)
        np.testing.assert_allclose(np.asarray(lon_j), lon_np, atol=1e-12)
        np.testing.assert_allclose(np.asarray(lat_j), lat_np, atol=1e-12)

    def test_localize_is_jittable(self, rng):
        import jax
        rpc = make_synthetic_rpc(0.05)
        coeffs = rpc.coeffs(xp=jnp, dtype=jnp.float64)
        f = jax.jit(lambda c, r, a: rpc_mod.localize(coeffs, c, r, a, xp=jnp))
        lon, lat = f(jnp.linspace(0, 1000, 128), jnp.linspace(0, 1000, 128),
                     jnp.full((128,), 20.0))
        c2, r2 = rpc_mod.project(coeffs, lon, lat, jnp.full((128,), 20.0), xp=jnp)
        np.testing.assert_allclose(np.asarray(c2), np.linspace(0, 1000, 128), atol=1e-8)

    def test_rescaled(self):
        rpc = make_synthetic_rpc(0.0)
        half = rpc.rescaled(0.5)
        lon, lat = rpc.localization(np.array([600.0]), np.array([400.0]), np.array([20.0]))
        col2, row2 = half.projection(lon, lat, np.array([20.0]))
        np.testing.assert_allclose(col2, 300.0, atol=1e-8)
        np.testing.assert_allclose(row2, 200.0, atol=1e-8)

    def test_incidence_angles(self):
        rpc = make_synthetic_rpc(0.0)
        zen, az = rpc.incidence_angles(-81.66, 30.35, z=0.0)
        # the synthetic camera has parallax d(col)/d(alt_n)=0.15, i.e. ~7.2 m
        # of eastward ground displacement per meter of altitude -> very oblique
        assert 75.0 < zen < 89.0
        # a camera with no parallax terms is exactly nadir
        nadir = make_synthetic_rpc(0.0)
        nadir.col_num[3] = 0.0
        nadir.row_num[3] = 0.0
        zen0, _ = nadir.incidence_angles(-81.66, 30.35, z=0.0)
        assert zen0 < 1e-6
