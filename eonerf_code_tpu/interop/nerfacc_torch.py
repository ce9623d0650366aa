"""Pure-torch CPU shims for the nerfacc v0.5.2 calls the reference uses.

The reference's hot path calls exactly three nerfacc CUDA kernels
(`radiance_fields/eonerf.py:15`, `sat_rendering.py:2`):

- ``render_weight_from_density``   (eonerf.py:229-235)
- ``render_transmittance_from_density``  (sat_rendering.py:106-110)
- ``accumulate_along_rays``        (eonerf.py:238-242)

plus the ``OccGridEstimator`` object (train_eonerf.py:74,112-119), whose
*sampling* path is never used — every call site is commented out in favor
of ``satnerf_sampling`` (sat_rendering.py:92,234,257); the grid is updated
and checkpointed but its contents affect nothing.

All three kernels operate on the flattened ``(n_pts,) + ray_indices``
layout with ray_indices sorted ascending (satnerf_sampling emits them
sorted, sat_rendering.py:76). Semantics follow nerfacc v0.5.2:

    alpha_i = 1 - exp(-sigma_i * (t_end_i - t_start_i))
    T_i     = exp(-sum_{j < i, same ray} sigma_j * dt_j)   (exclusive)
    w_i     = T_i * alpha_i

which equals the reference's own dense-layout ``weights_from_sigma``
(eonerf.py:37-54) since prod(1-alpha_j) == exp(-sum sigma_j dt_j).

Everything here is differentiable plain torch, so the reference trains
through these shims unmodified.
"""

import torch


def _exclusive_cumsum_per_ray(x, ray_indices, n_rays):
    """Exclusive per-ray cumsum for sorted ray_indices.

    Computed as a SHIFTED cumsum over a dense per-ray layout, never as
    ``cumsum(x) - x``: the camera pass plants a ~1e10 sigma*dt sentinel at
    each ray's last sample (eonerf.py:218-220), and subtracting it back
    out of an inclusive sum cancels catastrophically (1e10 * eps ~ 1e-6
    absolute error in the exponent). The shifted form matches nerfacc's
    sequential per-ray scan exactly.
    """
    n = ray_indices.numel()
    is_first = torch.ones(n, dtype=torch.bool, device=x.device)
    if n > 1:
        is_first[1:] = ray_indices[1:] != ray_indices[:-1]
    first_idx = torch.zeros(n_rays, dtype=torch.long, device=x.device)
    first_idx[ray_indices[is_first]] = torch.nonzero(is_first, as_tuple=True)[0]
    pos_in_ray = torch.arange(n, device=x.device) - first_idx[ray_indices]
    max_cnt = int(pos_in_ray.max().item()) + 1 if n else 1
    dense = torch.zeros(n_rays, max_cnt, dtype=x.dtype, device=x.device)
    dense[ray_indices, pos_in_ray] = x
    dcum = torch.cumsum(dense, dim=1)
    excl_dense = torch.cat(
        [torch.zeros(n_rays, 1, dtype=x.dtype, device=x.device), dcum[:, :-1]],
        dim=1,
    )
    return excl_dense[ray_indices, pos_in_ray]


def render_transmittance_from_density(
    t_starts, t_ends, sigmas, packed_info=None, ray_indices=None, n_rays=None,
    prefix_trans=None,
):
    sigmas_dt = sigmas * (t_ends - t_starts)
    alphas = 1.0 - torch.exp(-sigmas_dt)
    trans = torch.exp(-_exclusive_cumsum_per_ray(sigmas_dt, ray_indices, n_rays))
    return trans, alphas


def render_weight_from_density(
    t_starts, t_ends, sigmas, packed_info=None, ray_indices=None, n_rays=None,
    prefix_trans=None,
):
    trans, alphas = render_transmittance_from_density(
        t_starts, t_ends, sigmas, packed_info, ray_indices, n_rays, prefix_trans
    )
    return trans * alphas, trans, alphas


def accumulate_along_rays(weights, values=None, ray_indices=None, n_rays=None):
    if values is None:
        src = weights[..., None]
    else:
        src = weights[..., None] * values
    out = torch.zeros(n_rays, src.shape[-1], dtype=src.dtype, device=src.device)
    out.index_add_(0, ray_indices, src)
    return out


class OccGridEstimator(torch.nn.Module):
    """State-compatible stand-in for nerfacc's occupancy grid.

    The reference updates the grid every 50 steps and stores it in
    checkpoints, but never samples from it (all `nerfacc_sampling` call
    sites are commented out — sat_rendering.py:92,234,257), so the update
    is behaviorally inert. Evaluating occ_eval_fn on 128^3 points every 50
    steps on one CPU core would dominate the run for zero effect on any
    output; `update_every_n_steps` is therefore a no-op here, with the
    buffers kept so `state_dict()` round-trips through checkpoints.
    """

    def __init__(self, roi_aabb, resolution=128, levels=1):
        super().__init__()
        self.register_buffer("aabbs", torch.tensor([roi_aabb], dtype=torch.float32))
        self.register_buffer(
            "occs", torch.zeros(levels * resolution**3, dtype=torch.float32)
        )
        self.register_buffer(
            "binaries",
            torch.zeros((levels, resolution, resolution, resolution), dtype=torch.bool),
        )

    def update_every_n_steps(self, step, occ_eval_fn, n=16, occ_thre=1e-2, **kw):
        return None

    def sampling(self, *a, **kw):  # pragma: no cover - never reached
        raise NotImplementedError(
            "occupancy-grid sampling is unused by the reference "
            "(sat_rendering.py:92,234,257 are commented out)"
        )


def rendering(*a, **kw):  # pragma: no cover - imported but unused by ref hot path
    raise NotImplementedError("nerfacc.rendering is not used by the satellite path")
