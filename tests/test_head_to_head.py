"""Head-to-head against the reference's own COMPOSED pipeline.

The oracle suite (test_reference_oracle.py) pins component-level parity;
these tests drive the reference's full forward —
sat_rendering.render_image: sampling -> EONerfMLP.rendering -> geometric
shadow pass -> irradiance + radiometric composite
(/root/reference/sat_rendering.py:176-335,
/root/reference/radiance_fields/eonerf.py:196-248) — with the SAME weights
as our EONerfField (transplanted via interop.ref_params), the same rays and
the same z values (the reference sampler is wrapped with perturb=False so
both sides use the deterministic linspace layout, which
test_reference_oracle.py::TestSamplerOracle proves identical), and assert
every output key of render_rays against it.

The reference's three nerfacc CUDA calls run through the pure-torch shims
in interop.nerfacc_torch; its rasterio/rpcm/pyproj/utm imports through
interop.ref_stubs (each backed by this framework's own components, whose
agreement with the real libraries the oracle suite pins separately).

Both sides run in float64 so the comparison measures the MATH, not
accumulated f32 noise: tolerances here are 1e-8.
"""

import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not mounted at /root/reference"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eonerf_code_tpu.data.rays import SatRays  # noqa: E402
from eonerf_code_tpu.interop.ref_params import (  # noqa: E402
    infer_field_kwargs,
    params_to_reference_state_dict,
    reference_state_dict_to_params,
)
from eonerf_code_tpu.interop.ref_stubs import reference_environment  # noqa: E402
from eonerf_code_tpu.models.eonerf import EONerfField  # noqa: E402
from eonerf_code_tpu.render.satellite import RenderConfig, render_rays  # noqa: E402

N_IMAGES = 3
WIDTH = 64  # EONerfMLP takes net_width; 64 keeps the CPU torch pass fast


@pytest.fixture(scope="module")
def ref():
    """Reference modules imported through the functional stub kit, with the
    sampler forced deterministic (perturb=False) at both call sites."""
    with reference_environment(REF_DIR):
        import importlib

        sat_rendering = importlib.import_module("sat_rendering")
        eonerf = importlib.import_module("radiance_fields.eonerf")
        sat_dataset = importlib.import_module("datasets.satellite")
        for mod in (sat_rendering, eonerf, sat_dataset):
            assert os.path.realpath(mod.__file__).startswith(os.path.realpath(REF_DIR))

        orig_sampling = sat_rendering.satnerf_sampling

        def deterministic_sampling(origins, viewdirs, sampling_args,
                                   near=None, far=None, perturb=True):
            return orig_sampling(origins, viewdirs, sampling_args,
                                 near=near, far=far, perturb=False)

        sat_rendering.satnerf_sampling = deterministic_sampling
        try:
            yield type("NS", (), {"sat_rendering": sat_rendering,
                                  "eonerf": eonerf,
                                  "sat_dataset": sat_dataset})
        finally:
            sat_rendering.satnerf_sampling = orig_sampling


def _our_field_and_params(rng, compute_dtype=jnp.float64):
    field = EONerfField(n_images=N_IMAGES, net_width=WIDTH,
                        radiometric_normalization=True,
                        compute_dtype=compute_dtype)
    params = field.init(
        jax.random.PRNGKey(3),
        jnp.zeros((2, 4, 3)), jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
        method="init_all")
    # randomize the radiometric embedding away from identity so the A/b
    # (and the unused ambient_bias) paths carry signal
    p = jax.device_get(params)
    p["params"]["radiometric_enc"]["embedding"] = (
        p["params"]["radiometric_enc"]["embedding"]
        + rng.normal(0, 0.15, (N_IMAGES, 9))).astype(np.float32)
    return field, p


def _torch_twin(ref, params):
    """Reference EONerfMLP carrying OUR transplanted weights, in float64."""
    model = ref.eonerf.EONerfMLP(N_IMAGES, net_width=WIDTH,
                                 radiometric_normalization=True).double()
    sd = {k: torch.from_numpy(v).double()
          for k, v in params_to_reference_state_dict(params).items()}
    result = model.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys
    # the only keys we don't provide are the encoders' constant 2^i buffers
    assert set(result.missing_keys) <= {"posi_encoder.scales", "view_encoder.scales"}
    model.eval()
    return model


def _make_rays(rng, n_rays):
    """Rays like the dataset's: downward-slanted unit dirs from near the cube
    top, near=0. A handful start above the cube so the out-of-cube masking
    path is exercised on both sides."""
    o = np.stack([rng.uniform(-0.5, 0.5, n_rays),
                  rng.uniform(-0.5, 0.5, n_rays),
                  rng.uniform(0.9, 0.98, n_rays)], axis=1)
    o[: n_rays // 8, 2] = 1.04  # first samples outside the cube
    d = np.stack([rng.uniform(-0.15, 0.15, n_rays),
                  rng.uniform(-0.15, 0.15, n_rays),
                  rng.uniform(-1.0, -0.85, n_rays)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sun = np.array([0.35, 0.2, -0.91])
    sun = np.tile(sun / np.linalg.norm(sun), (n_rays, 1))
    img_idx = rng.integers(0, N_IMAGES, n_rays)
    near = np.zeros(n_rays)
    far = np.full(n_rays, 2.0)
    return o, d, sun, img_idx, near, far


def _run_reference(ref, model, rays_np, epoch_idx, n_samples, chunk):
    o, d, sun, img_idx, near, far = rays_np
    satrays = ref.sat_dataset.SatRays(
        origins=torch.from_numpy(o).double(),
        viewdirs=torch.from_numpy(d).double(),
        sundirs=torch.from_numpy(sun).double(),
        img_idx=torch.from_numpy(img_idx.astype(np.int64))[:, None],
        t_near=torch.from_numpy(near).double()[:, None],
        t_far=torch.from_numpy(far).double()[:, None],
    )
    aabb = torch.tensor([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]).double()
    # the reference's internal factories (torch.linspace z-steps,
    # sat_rendering.py:67) default to f32; run it fully in f64 so the
    # comparison measures the math, not sampler quantization
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            results, _ = ref.sat_rendering.render_image(
                model, None, satrays, aabb, None,
                epoch_idx=epoch_idx, chunk=chunk,
                render_step_size=2.0 / n_samples)
    finally:
        torch.set_default_dtype(prev_dtype)
    return {k: v.numpy() for k, v in results.items()}


def _run_ours(field, params, rays_np, shadows, n_samples):
    o, d, sun, img_idx, near, far = rays_np
    rays = SatRays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(sun),
                   jnp.asarray(img_idx, jnp.int32), jnp.asarray(near),
                   jnp.asarray(far))
    cfg = RenderConfig(n_samples=n_samples, sc_n_samples=n_samples,
                       perturb=False)
    out = render_rays(field, params, rays, jax.random.PRNGKey(0), cfg,
                      shadows=shadows)
    return {k: np.asarray(v) for k, v in out.items()}


KEYS = ["rgb", "depth", "albedo_rgb", "ambient_rgb", "geo_shadows",
        "transient_s", "beta", "pts_per_ray", "sc_pts_per_ray",
        "shadowless_rgb"]


class TestForwardParity:
    """VERDICT r4 item 1a: the composed forward, same weights, same rays."""

    @pytest.mark.parametrize("epoch_idx,shadows", [(0, False), (5, True)])
    def test_render_image_vs_render_rays(self, rng, ref, epoch_idx, shadows):
        field, params = _our_field_and_params(rng)
        model = _torch_twin(ref, params)
        rays_np = _make_rays(rng, n_rays=64)
        n_samples = 64

        want = _run_reference(ref, model, rays_np, epoch_idx, n_samples,
                              chunk=24)  # 3 chunks: exercises the chunk loop
        got = _run_ours(field, params, rays_np, shadows, n_samples)

        for k in KEYS:
            np.testing.assert_allclose(
                got[k], want[k], rtol=1e-8, atol=1e-8,
                err_msg=f"key {k} diverges from the reference forward")

    def test_depth_only_path(self, rng, ref):
        """only_depth=True (sat_rendering.py:227-249 / eonerf.render_depth)
        vs our render_depth."""
        from eonerf_code_tpu.render.satellite import render_depth

        field, params = _our_field_and_params(rng)
        model = _torch_twin(ref, params)
        rays_np = _make_rays(rng, n_rays=48)
        o, d, sun, img_idx, near, far = rays_np
        satrays = ref.sat_dataset.SatRays(
            origins=torch.from_numpy(o).double(),
            viewdirs=torch.from_numpy(d).double(),
            sundirs=torch.from_numpy(sun).double(),
            img_idx=torch.from_numpy(img_idx.astype(np.int64))[:, None],
            t_near=torch.from_numpy(near).double()[:, None],
            t_far=torch.from_numpy(far).double()[:, None],
        )
        aabb = torch.tensor([-1.0] * 3 + [1.0] * 3).double()
        prev_dtype = torch.get_default_dtype()
        torch.set_default_dtype(torch.float64)
        try:
            with torch.no_grad():
                want, _ = ref.sat_rendering.render_image(
                    model, None, satrays, aabb, None, epoch_idx=0, chunk=48,
                    render_step_size=2.0 / 64, only_depth=True)
        finally:
            torch.set_default_dtype(prev_dtype)

        rays = SatRays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(sun),
                       jnp.asarray(img_idx, jnp.int32), jnp.asarray(near),
                       jnp.asarray(far))
        cfg = RenderConfig(n_samples=64, sc_n_samples=64, perturb=False)
        got = render_depth(field, params, rays, jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(np.asarray(got), want["depth"].numpy(),
                                   rtol=1e-8, atol=1e-8)


class TestTransplantRoundTrip:
    def test_params_round_trip(self, rng):
        field, params = _our_field_and_params(rng, compute_dtype=jnp.float32)
        sd = params_to_reference_state_dict(params)
        back = reference_state_dict_to_params(sd)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        # every dense/embedding leaf survives byte-exactly (rpc_correction's
        # ray offsets have no reference counterpart and stay out)
        n = 0
        for path, leaf in flat_a:
            if path in flat_b:
                np.testing.assert_array_equal(np.asarray(leaf),
                                              np.asarray(flat_b[path]))
                n += 1
        assert n >= 40  # 19 dense layers x2 + 2 embeddings

    def test_infer_field_kwargs(self, rng):
        _, params = _our_field_and_params(rng, compute_dtype=jnp.float32)
        sd = params_to_reference_state_dict(params)
        kw = infer_field_kwargs(sd)
        assert kw == {"n_images": N_IMAGES, "transient_dim": 4,
                      "net_depth": 8, "net_width": WIDTH,
                      "radiometric_normalization": True}


class TestDatasetParity:
    """The reference's SatelliteDataset, running through the stub kit on a
    scene from OUR synthetic factory, must build the same normalized (N,11)
    ray tensor as our dataset — data-layer parity on the composed path."""

    def test_reference_dataset_rays_match_ours(self, tmp_path, ref):
        from eonerf_code_tpu.data.satellite import SatelliteDataset
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene

        spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=16)
        scene = generate_scene(str(tmp_path / "scene"), spec)

        ours = SatelliteDataset(scene["root_dir"], scene["img_dir"],
                                split="train")
        theirs = ref.sat_dataset.SatelliteDataset(
            scene["root_dir"], scene["img_dir"], split="train")

        want = theirs.all_rays.numpy()
        got = np.asarray(ours.all_rays, np.float32)
        assert got.shape == want.shape == (3 * 16 * 16, 11)
        # Columns 3:11 (direction, near, far, sun) must agree tightly.
        np.testing.assert_allclose(got[:, 3:], want[:, 3:], atol=2e-5)
        # Origins: the reference quantizes the scene offset through a torch
        # float32 tensor (datasets/satellite.py:303), so ITS normalized cube
        # sits at a constant sub-ULP translation of ours (self-consistent on
        # its side: the same quantized offset denormalizes the DSM). Assert
        # the difference is exactly that: constant per axis, bounded by the
        # f32 ULP of the offset over the scene scale.
        diff = got[:, :3].astype(np.float64) - want[:, :3].astype(np.float64)
        offs = np.asarray(ours.scene.scene_offset, np.float64)
        scale = np.asarray(ours.scene.scene_scale, np.float64)
        ulp = np.abs(offs.astype(np.float32).astype(np.float64) - offs) + \
            np.spacing(offs.astype(np.float32)).astype(np.float64)
        assert np.all(diff.std(axis=0) < 2e-5), "origin diff is not constant"
        assert np.all(np.abs(diff.mean(axis=0)) <= ulp / scale + 2e-5)
        np.testing.assert_allclose(np.asarray(ours.all_rgbs, np.float32),
                                   theirs.all_rgbs.numpy(), atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(ours.all_ids_img).ravel(),
            theirs.all_ids_img.numpy().ravel().astype(np.int64))


class TestReferenceTrainingRuns:
    """The reference's own train_eonerf.py executes end-to-end on CPU
    through the stub kit (VERDICT r4 item 1b's harness), its checkpoint
    reverse-transplants into EONerfField, and the imported run evaluates
    through our standard eval stack."""

    def test_reference_trains_and_imports(self, tmp_path):
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
        from eonerf_code_tpu.eval.run import eval_eonerf
        from eonerf_code_tpu.interop.ref_import import import_reference_run
        from eonerf_code_tpu.interop.ref_runner import (
            latest_reference_checkpoint,
            run_reference_training,
        )

        scene = generate_scene(str(tmp_path / "scene"),
                               SyntheticSceneSpec(n_views=3, n_test_views=1,
                                                  img_size=16,
                                                  dsm_resolution=4.0))
        # 3 views x 256 rays / batch 128 -> val_freq 6, save_freq 24: one
        # checkpoint lands exactly at max_steps
        log_dir = run_reference_training(
            scene["root_dir"], str(tmp_path / "logs"), "smoke",
            batch_size=128, n_samples=16, max_steps=24, chunk=1024)
        ckpt = latest_reference_checkpoint(log_dir)
        assert ckpt.endswith("epoch=4.ckpt")

        imported = str(tmp_path / "our_logs" / "ref_imported")
        cfg, params = import_reference_run(
            log_dir, imported, root_dir=scene["root_dir"],
            img_dir=scene["img_dir"], gt_dir=scene["gt_dir"],
            aoi_id=scene["aoi_id"], n_samples=16, chunk=768)
        assert params["params"]["trunk"]["hidden_0"]["kernel"].shape == (63, 256)
        assert cfg.radiometric_normalization

        out = eval_eonerf("ref_imported", str(tmp_path / "our_logs"),
                          str(tmp_path / "eval"), gt_dir=scene["gt_dir"],
                          dsm=True, dsm_resolution=4.0, chunk=768)
        assert np.isfinite(out["mae"])  # untrained-ish model, just finite
