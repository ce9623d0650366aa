"""Numerical parity against the reference implementation ITSELF.

Every other parity test in this suite asserts against independently
computed goldens; these import the reference's own Python modules from
/root/reference (mounted read-only) and use them as the oracle. The
reference's unavailable third-party deps (numba / rasterio / rpcm /
nerfacc / torchvision / plyflatten) are replaced by inert stubs -- every
function under test here is pure numpy / torch-CPU and never touches them
at call time (numba.jit is stubbed as an identity decorator, so the dsmr
loops run as plain Python on small rasters).

Skipped entirely when the reference tree is not mounted, so the suite
stays hermetic elsewhere. Nothing from the reference is imported at
module scope; all access goes through the module-scoped `ref` fixture,
which cleans sys.path / sys.modules back up on teardown.

Oracle coverage (reference file -> ours):
  metrics.py                 -> eonerf_code_tpu/utils/metrics.py
  sat_utils.py (ECEF, RPC)   -> eonerf_code_tpu/geo/{ellipsoid,rpc}.py
  dsmr.py (NCC registration) -> eonerf_code_tpu/eval/registration.py
  radiance_fields/mlp.py     -> eonerf_code_tpu/models/encoders.py
  radiance_fields/eonerf.py  -> eonerf_code_tpu/ops/volrend.py
  eval_eonerf.py (nadir cam) -> eonerf_code_tpu/render/nadir.py
  datasets/satellite.py      -> eonerf_code_tpu/data/satellite.py (el/az)
"""

import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not mounted at /root/reference"
)

torch = pytest.importorskip("torch")


def _identity_jit(f=None, **kwargs):
    if callable(f):
        return f
    return lambda g: g


@pytest.fixture(scope="module")
def ref():
    """Namespace of reference modules, imported with stubbed native deps."""
    stub_names = {}
    # The reference's top-level packages can collide with installed
    # site-packages (a third-party `datasets` exists in this image). Stash
    # any pre-existing module of those names so the reference import
    # resolves fresh from REF_DIR, and restore them on teardown so module
    # identity is preserved for later tests.
    stashed = {}
    for root in ("datasets", "radiance_fields"):
        for name in [n for n in sys.modules if n == root or n.startswith(root + ".")]:
            stashed[name] = sys.modules.pop(name)

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        stub_names[name] = m
        return m

    stub("numba", jit=_identity_jit)
    stub("rasterio", open=None)
    stub("rpcm", RPCModel=None)
    stub("plyflatten", plyflatten=None)
    nerfacc = stub(
        "nerfacc",
        OccGridEstimator=object,
        rendering=None,
        render_weight_from_density=None,
        render_transmittance_from_density=None,
        accumulate_along_rays=None,
    )
    volrend = stub(
        "nerfacc.volrend",
        render_weight_from_density=None,
        render_transmittance_from_density=None,
        accumulate_along_rays=None,
    )
    if "nerfacc" in stub_names:
        nerfacc.volrend = volrend
    tv = stub("torchvision")
    if "torchvision" in stub_names:
        tv.transforms = stub("torchvision.transforms", Resize=object)

    sys.path.insert(0, REF_DIR)
    imported = []
    try:
        import importlib

        ns = types.SimpleNamespace()
        for alias, modname in [
            ("metrics", "metrics"),
            ("sat_utils", "sat_utils"),
            ("dsmr", "dsmr"),
            ("mlp", "radiance_fields.mlp"),
            ("eonerf", "radiance_fields.eonerf"),
            ("sat_dataset", "datasets.satellite"),
            ("sat_rendering", "sat_rendering"),
            ("eval_eonerf", "eval_eonerf"),
        ]:
            before = modname not in sys.modules
            mod = importlib.import_module(modname)
            assert os.path.realpath(mod.__file__).startswith(os.path.realpath(REF_DIR)), (
                f"oracle import for {modname} resolved outside the reference tree: {mod.__file__}"
            )
            if before:
                imported.append(modname)
            setattr(ns, alias, mod)
        # package roots pulled in by the dotted imports
        for pkg in ("radiance_fields", "datasets", "datasets.utils"):
            if pkg in sys.modules and pkg not in imported:
                imported.append(pkg)
        yield ns
    finally:
        sys.path.remove(REF_DIR)
        for m in imported:
            sys.modules.pop(m, None)
        for m in stub_names:
            sys.modules.pop(m, None)
        sys.modules.update(stashed)


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# metrics.py
# ---------------------------------------------------------------------------


class TestLossOracle:
    def test_uncertainty_aware_loss(self, ref, rng):
        from eonerf_code_tpu.utils.metrics import uncertainty_aware_loss

        gt = rng.random((256, 3)).astype(np.float32)
        pred = rng.random((256, 3)).astype(np.float32)
        beta = (0.05 + rng.random((256, 1)).astype(np.float32)).repeat(3, axis=1)

        want, want_dict = ref.metrics.uncertainty_aware_loss(_t(gt), _t(pred), _t(beta))
        got, got_dict = uncertainty_aware_loss(gt, pred, beta)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        np.testing.assert_allclose(
            float(got_dict["coarse_color"]), float(want_dict["coarse_color"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(got_dict["coarse_logbeta"]), float(want_dict["coarse_logbeta"]), rtol=1e-5
        )

    def test_depth_loss(self, ref, rng):
        from eonerf_code_tpu.utils.metrics import depth_loss_l2

        gt = rng.uniform(-0.5, 1.0, 512).astype(np.float32)  # ~1/3 invalid (<0)
        pred = rng.uniform(0.0, 1.0, 512).astype(np.float32)
        conf = rng.integers(0, 8, 512).astype(np.float32)  # half fail the >=4 mask

        want, want_dict = ref.metrics.depth_loss_L2(_t(gt), _t(pred), _t(conf), w=100)
        got, got_dict = depth_loss_l2(gt, pred, conf, w=100.0)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        assert got_dict["depth_weight"] == want_dict["depth_weight"]

    def test_depth_loss_no_conf(self, ref, rng):
        from eonerf_code_tpu.utils.metrics import depth_loss_l2

        gt = rng.uniform(-0.5, 1.0, 512).astype(np.float32)
        pred = rng.uniform(0.0, 1.0, 512).astype(np.float32)
        want, _ = ref.metrics.depth_loss_L2(_t(gt), _t(pred), None, w=100)
        got, _ = depth_loss_l2(gt, pred, None, w=100.0)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_shadow_loss(self, ref, rng):
        from eonerf_code_tpu.utils.metrics import shadow_loss_l2

        smask = (rng.random(1024) > 0.3).astype(np.float32)  # ~30% shadow prior
        geo = rng.random(1024).astype(np.float32)

        want, want_dict = ref.metrics.shadow_loss_L2(_t(smask), _t(geo))
        got, got_dict = shadow_loss_l2(smask, geo)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        np.testing.assert_allclose(
            float(got_dict["shadow_vals_to_penalize"]),
            float(want_dict["shadow_vals_to_penalize"]),
            rtol=1e-5,
        )

    def test_differentiable_thresholding(self, ref, rng):
        from eonerf_code_tpu.utils.metrics import differentiable_thresholding

        x = rng.random(257).astype(np.float32)
        want = ref.metrics.differentiable_thresholding(_t(x), thr=0.4).numpy()
        got = np.asarray(differentiable_thresholding(x, thr=0.4))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_mse_psnr(self, ref, rng):
        from eonerf_code_tpu.utils.metrics import mse, psnr

        pred = rng.random((64, 3)).astype(np.float32)
        gt = rng.random((64, 3)).astype(np.float32)
        mask = rng.random((64, 3)) > 0.5

        np.testing.assert_allclose(
            float(mse(pred, gt)), float(ref.metrics.mse(_t(pred), _t(gt))), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(psnr(pred, gt, mask)),
            float(ref.metrics.psnr(_t(pred), _t(gt), _t(np.asarray(mask)))),
            rtol=1e-5,
        )


# ---------------------------------------------------------------------------
# sat_utils.py geodesy + RPC polynomial
# ---------------------------------------------------------------------------


class TestGeoOracle:
    def test_latlon_to_ecef(self, ref, rng):
        from eonerf_code_tpu.geo.ellipsoid import latlon_to_ecef

        lat = rng.uniform(-80, 80, 64)
        lon = rng.uniform(-180, 180, 64)
        alt = rng.uniform(-100, 9000, 64)
        wx, wy, wz = ref.sat_utils.latlon_to_ecef_custom(lat, lon, alt)
        gx, gy, gz = latlon_to_ecef(lat, lon, alt)
        np.testing.assert_allclose([gx, gy, gz], [wx, wy, wz], rtol=0, atol=1e-6)

    def test_ecef_to_latlon(self, ref, rng):
        from eonerf_code_tpu.geo.ellipsoid import ecef_to_latlon

        lat = rng.uniform(-80, 80, 64)
        lon = rng.uniform(-180, 180, 64)
        alt = rng.uniform(-100, 9000, 64)
        x, y, z = ref.sat_utils.latlon_to_ecef_custom(lat, lon, alt)
        wlat, wlon, walt = ref.sat_utils.ecef_to_latlon_custom(x, y, z)
        glat, glon, galt = ecef_to_latlon(x, y, z)
        np.testing.assert_allclose(glat, wlat, atol=1e-12)
        np.testing.assert_allclose(glon, wlon, atol=1e-12)
        np.testing.assert_allclose(galt, walt, atol=1e-9)

    def test_apply_poly_term_ordering(self, ref, rng):
        """The 20-term RPC cubic must match the reference's rpcm ordering
        term for term (sat_utils.py:434-450) -- random coefficients expose
        any permutation.

        The oracle is evaluated POINTWISE (0-dim tensors): the reference's
        never-called differentiable path has a latent bug -- `out = 0;
        out += poly[0]` makes `out` a 0-dim tensor, so the next in-place
        `out += poly[1]*y` raises for vector y (in-place broadcast of [N]
        into []). Scalar inputs sidestep it and still pin the term order."""
        from eonerf_code_tpu.geo.rpc import apply_poly, apply_rfm

        poly = rng.standard_normal(20)
        num = rng.standard_normal(20)
        den = rng.standard_normal(20)
        den[0] += 5.0  # keep the denominator away from zero
        x, y, z = (rng.uniform(-1, 1, 16) for _ in range(3))

        want = np.array([
            float(ref.sat_utils.apply_poly(_t(poly), _t(xi), _t(yi), _t(zi)))
            for xi, yi, zi in zip(x, y, z)
        ])
        got = apply_poly(poly, x, y, z)
        np.testing.assert_allclose(got, want, rtol=1e-12)

        want = np.array([
            float(ref.sat_utils.apply_rfm(_t(num), _t(den), _t(xi), _t(yi), _t(zi)))
            for xi, yi, zi in zip(x, y, z)
        ])
        got = apply_rfm(num, den, x, y, z)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_rpc_projection(self, ref, rng):
        """Full projection vs the reference's differentiable torch path
        (sat_utils.py:420-432), which the reference wrote for bundle
        adjustment and never called."""
        from eonerf_code_tpu.geo.rpc import RPCModel

        d = {
            "row_offset": 1010.0, "col_offset": 995.0,
            "row_scale": 1024.0, "col_scale": 1024.0,
            "lat_offset": 38.29, "lon_offset": -81.55, "alt_offset": 100.0,
            "lat_scale": 0.05, "lon_scale": 0.06, "alt_scale": 500.0,
            "row_num": list(rng.standard_normal(20) * 0.01),
            "row_den": [1.0] + list(rng.standard_normal(19) * 1e-4),
            "col_num": list(rng.standard_normal(20) * 0.01),
            "col_den": [1.0] + list(rng.standard_normal(19) * 1e-4),
        }
        rpc = RPCModel(d)
        lon = rng.uniform(-81.58, -81.52, 16)
        lat = rng.uniform(38.27, 38.31, 16)
        alt = rng.uniform(-50.0, 350.0, 16)

        ref_rpc = types.SimpleNamespace(
            **{k: (v if isinstance(v, float) else _t(np.asarray(v))) for k, v in d.items()}
        )
        # pointwise: the reference's apply_poly in-place bug (see above)
        # breaks vector inputs
        want = np.array([
            [float(c) for c in ref.sat_utils.rpc_projection_differentiable(
                ref_rpc, _t(lo), _t(la), _t(al))]
            for lo, la, al in zip(lon, lat, alt)
        ])
        gcol, grow = rpc.projection(lon, lat, alt)
        np.testing.assert_allclose(gcol, want[:, 0], rtol=1e-10)
        np.testing.assert_allclose(grow, want[:, 1], rtol=1e-10)


# ---------------------------------------------------------------------------
# dsmr.py NCC registration (numba stubbed to pure Python -- small rasters)
# ---------------------------------------------------------------------------


class TestRegistrationOracle:
    @staticmethod
    def _raster_pair(rng, h=120, w=120, dx=3, dy=-2):
        base = np.zeros((h + 20, w + 20), np.float64)
        yy, xx = np.mgrid[0 : h + 20, 0 : w + 20]
        for _ in range(12):  # buildings: the NCC needs structure
            cy, cx = rng.integers(15, h + 5), rng.integers(15, w + 5)
            hh, ww = rng.integers(4, 12), rng.integers(4, 12)
            base[(np.abs(yy - cy) < hh) & (np.abs(xx - cx) < ww)] += rng.uniform(5, 25)
        base += rng.normal(0, 0.1, base.shape)
        u = base[10 : 10 + h, 10 : 10 + w].copy()
        v = 1.2 * base[10 + dy : 10 + dy + h, 10 + dx : 10 + dx + w] + 3.0
        u[rng.random((h, w)) < 0.03] = np.nan  # water-mask style holes
        v[rng.random((h, w)) < 0.03] = np.nan
        return u[None], v[None]

    def test_recursive_ncc_and_affine(self, ref, rng):
        """Shift search + z-affine vs the reference dsmr (pyramid level
        engaged: 120 px > 100 triggers one downsample)."""
        from eonerf_code_tpu.eval.registration import compute_shift_arrays, masked_stats

        u, v = self._raster_pair(rng)
        wdx, wdy = ref.dsmr.recursive_ncc(u, v)
        gdx, gdy, ga, gb = compute_shift_arrays(u, v, scaling=True)
        assert (gdx, gdy) == (wdx, wdy)

        wmuu, wmuv, wsigu, wsigv, wx = ref.dsmr.mean_std(u, v, wdx, wdy)
        np.testing.assert_allclose(ga, wsigu / wsigv, rtol=1e-10)
        np.testing.assert_allclose(gb, wmuu - wmuv * (wsigu / wsigv), rtol=1e-8)
        muu, muv, sigu, sigv, xc = masked_stats(u, v, gdx, gdy)
        np.testing.assert_allclose(
            [muu, muv, sigu, sigv, xc], [wmuu, wmuv, wsigu, wsigv, wx], rtol=1e-10
        )

    def test_ncc_tie_break_and_values(self, ref, rng):
        """Per-shift NCC values and the first-max tie-break (dsmr.py:111-117)."""
        from eonerf_code_tpu.eval.registration import compute_ncc, ncc

        u, v = self._raster_pair(rng, h=64, w=64, dx=1, dy=2)
        for dx, dy in [(0, 0), (1, 2), (-3, 4), (5, -5)]:
            np.testing.assert_allclose(
                ncc(u, v, dx, dy), ref.dsmr.ncc(u, v, dx, dy), rtol=1e-10
            )
        want = ref.dsmr.compute_ncc(u, v, 5, 0, 0)
        got = compute_ncc(u, v, 5, 0, 0, use_native=False)
        assert tuple(got) == tuple(want)

    def test_apply_shift(self, ref, rng):
        from eonerf_code_tpu.eval.registration import apply_shift_arrays

        v = rng.standard_normal((1, 40, 40))
        v[0, 5, 7] = np.nan
        out_ref = np.zeros_like(v)
        out_ref = ref.dsmr.apply_shift_(v, out_ref, 3, -2, 1.1, 0.5, 0, 0)
        got = apply_shift_arrays(v, dx=3, dy=-2, a=1.1, b=0.5)
        # reference writes a*NaN+b = NaN for out-of-range taps too
        np.testing.assert_allclose(got, out_ref, rtol=1e-12, equal_nan=True)


# ---------------------------------------------------------------------------
# radiance_fields: encoder + volume-rendering identities
# ---------------------------------------------------------------------------


class TestModelOracle:
    def test_sinusoidal_encoder(self, ref, rng):
        """Layout parity [identity | sin (degree-major) | cos] incl. the
        freq_mask hook (mlp.py:168-208)."""
        from eonerf_code_tpu.models.encoders import sinusoidal_encode, sinusoidal_latent_dim

        for x_dim, min_deg, max_deg in [(3, 0, 10), (3, 0, 4), (1, 0, 6)]:
            enc = ref.mlp.SinusoidalEncoder(x_dim, min_deg, max_deg, use_identity=True)
            x = rng.uniform(-1, 1, (32, x_dim)).astype(np.float32)
            want = enc(_t(x)).numpy()
            got = np.asarray(sinusoidal_encode(x, min_deg, max_deg, use_identity=True))
            assert sinusoidal_latent_dim(x_dim, min_deg, max_deg) == enc.latent_dim
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_sinusoidal_freq_mask(self, ref, rng):
        """The reference multiplies the latent by freq_mask elementwise; a
        random mask through its buffer must equal ours."""
        from eonerf_code_tpu.models.encoders import sinusoidal_encode

        enc = ref.mlp.SinusoidalEncoder(3, 0, 8, use_identity=True)
        mask = rng.random(enc.latent_dim).astype(np.float32)
        enc.freq_mask = _t(mask).view(1, -1)
        x = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
        want = enc(_t(x)).numpy()
        got = np.asarray(sinusoidal_encode(x, 0, 8, use_identity=True, freq_mask=mask))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_weights_from_sigma(self, ref, rng):
        """Our exp(-cumsum) transmittance vs the reference's shifted-cumprod
        (eonerf.py:37-54), including the 1e10 last delta."""
        from eonerf_code_tpu.ops.volrend import render_weights

        n_rays, n_samples = 32, 48
        z = np.sort(rng.uniform(0, 2, (n_rays, n_samples)).astype(np.float64), axis=1)
        sigmas = (rng.standard_normal((n_rays, n_samples)) * 2).astype(np.float64)

        want_w, want_t, want_a = ref.eonerf.weights_from_sigma(_t(z), _t(sigmas), test=True)

        deltas = np.diff(z, axis=1)
        deltas = np.concatenate([deltas, np.full((n_rays, 1), 1e10)], axis=1)
        got_w, got_t, got_a = render_weights(np.maximum(sigmas, 0.0), deltas)
        np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(), rtol=2e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), rtol=0, atol=5e-7)
        np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(), rtol=0, atol=5e-7)

    def test_entropy_from_alphas(self, ref, rng):
        """InfoNeRF per-ray entropy (eonerf.py:56-67) vs ops.volrend.ray_entropy."""
        from eonerf_code_tpu.ops.volrend import ray_entropy

        n_rays, k = 8, 16
        alphas = rng.random((n_rays, k)).astype(np.float64)
        ray_indices = np.repeat(np.arange(n_rays), k)
        want = ref.eonerf.entropy_from_alphas(_t(alphas.ravel()), _t(ray_indices)).numpy()
        got = np.asarray(ray_entropy(alphas))
        np.testing.assert_allclose(got, want[:, 0], rtol=1e-8)


# ---------------------------------------------------------------------------
# sat_rendering.py sampler + sat_utils scaling helpers
# ---------------------------------------------------------------------------


class TestSamplerOracle:
    def test_satnerf_sampling_layout(self, ref):
        """Deterministic (perturb=False) z-interval layout vs the reference
        sampler (sat_rendering.py:56-84): same t_starts / t_ends / midpoints
        for the same near/far and sample count."""
        import jax

        from eonerf_code_tpu.ops.sampling import intervals_from_z, stratified_z_vals

        n_rays, k = 6, 128
        # geometry chosen so every midpoint stays inside the cube: the
        # reference's out-of-cube filter then keeps all points and the
        # flattened layout reshapes losslessly to (R, K-1)
        origins = np.tile(np.array([[0.0, 0.0, 0.95]], np.float64), (n_rays, 1))
        dirs = np.tile(np.array([[0.0, 0.0, -0.9]], np.float64), (n_rays, 1))
        near = np.linspace(0.0, 0.05, n_rays)[:, None]

        ray_idx, t_starts, t_ends = ref.sat_rendering.satnerf_sampling(
            _t(origins), _t(dirs), {"render_step_size": 2.0 / k},
            near=_t(near), perturb=False,
        )
        assert ray_idx.shape[0] == n_rays * (k - 1), "cube filter dropped points"
        want_starts = t_starts.numpy().reshape(n_rays, k - 1)
        want_ends = t_ends.numpy().reshape(n_rays, k - 1)

        z = stratified_z_vals(jax.random.PRNGKey(0), np.asarray(near),
                              np.asarray(near) + 2.0, k, perturb=False)
        got_starts, got_ends, got_mid, _ = intervals_from_z(z)
        np.testing.assert_allclose(np.asarray(got_starts), want_starts, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_ends), want_ends, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(got_mid), (want_starts + want_ends) / 2.0, atol=1e-12
        )

    def test_cube_mask(self, ref, rng):
        from eonerf_code_tpu.ops.sampling import cube_mask

        xyz = rng.uniform(-1.3, 1.3, (512, 3))
        _, want, _ = ref.sat_rendering.filter_pts_outside_cube(_t(xyz))
        got = np.asarray(cube_mask(xyz, bound=1.0))
        np.testing.assert_array_equal(got, want.numpy())

    def test_rpc_scaling_params(self, ref, rng):
        from eonerf_code_tpu.data.satellite import scaling_params

        v = rng.uniform(-500, 900, (7, 13))
        want = ref.sat_utils.rpc_scaling_params(v)
        got = scaling_params(v)
        np.testing.assert_allclose(got, want, rtol=1e-15)

    def test_rescale_rpc(self, ref, rng):
        from eonerf_code_tpu.geo.rpc import RPCModel

        d = {k: float(v) for k, v in zip(
            RPCModel._SCALAR_KEYS,
            [1010.0, 995.0, 38.29, -81.55, 100.0, 1024.0, 1024.0, 0.05, 0.06, 500.0],
        )}
        d.update({k: list(rng.standard_normal(20)) for k in RPCModel._POLY_KEYS})
        ours = RPCModel(d).rescaled(0.5)
        theirs = ref.sat_utils.rescale_rpc(types.SimpleNamespace(**d), 0.5)
        for k in ("row_scale", "col_scale", "row_offset", "col_offset",
                  "lat_scale", "lon_offset", "alt_scale"):
            assert getattr(ours, k) == getattr(theirs, k)


# ---------------------------------------------------------------------------
# eval_eonerf.py nadir camera
# ---------------------------------------------------------------------------


class TestNadirOracle:
    def test_pose_spherical(self, ref):
        from eonerf_code_tpu.render.nadir import pose_spherical

        for theta, phi, radius in [(0, 0, 2), (35, -10, 2), (120, 45, 3.5)]:
            want = ref.eval_eonerf.pose_spherical(theta, phi, radius)
            got = pose_spherical(theta, phi, radius)
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_dir_vec_from_el_az(self, ref):
        from eonerf_code_tpu.data.satellite import dir_vec_from_el_az

        for el, az in [(0, 0), (40, 160), (68, 95.6), (-10, 300)]:
            want = ref.sat_dataset.get_dir_vec_from_el_az(el, az)
            got = dir_vec_from_el_az(el, az)
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_virtual_ortho_rays(self, ref):
        """The DSM-extraction ortho sweep: ours (frame=None) must reproduce
        the reference's slanted-plane construction (eval_eonerf.py:130-249)
        bit-for-bit in origins, directions, near, far."""
        from eonerf_code_tpu.render.nadir import virtual_ortho_rays

        w, h, radius = 48, 40, 2.0
        scene_scale = np.array([1.3, 1.1, 2.2])
        near = max(0.0, radius - 2.0)
        far = near + 2.5
        want = ref.eval_eonerf.generate_rays_from_virtual_pinhole(
            w, h, max(h, w), radius, 0, 0, near, far, scene_scale=scene_scale
        ).numpy()
        got = virtual_ortho_rays(w, h, radius=radius, el_deg=0.0, az_deg=0.0,
                                 scene_scale=scene_scale)
        assert got.shape == want.shape == (h * w, 8)
        np.testing.assert_allclose(got[:, 0:3], want[:, 0:3], atol=1e-6)   # origins
        np.testing.assert_allclose(got[:, 3:6], want[:, 3:6], atol=1e-7)   # directions
        np.testing.assert_allclose(got[:, 6:8], want[:, 6:8], atol=0)      # near/far
