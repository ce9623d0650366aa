"""Losses and metrics (reference: metrics.py).

All functions are pure jax and jit/grad-safe; the scalar outputs feed the
TensorBoard scalar names the reference logs (train/coarse_color,
train/coarse_logbeta, depth_l2, shadows_term1, ...).
"""

import jax.numpy as jnp


def uncertainty_aware_loss(gt_rgb, pred_rgb, pred_beta):
    """NeRF-W / SatNeRF beta loss (metrics.py:17-22):
    ||drgb||^2 / (2 beta^2) + (3 + mean log beta) / 2."""
    color_term = jnp.mean((pred_rgb - gt_rgb) ** 2 / (2.0 * pred_beta**2))
    beta_term = (3.0 + jnp.mean(jnp.log(pred_beta))) / 2.0
    loss = color_term + beta_term
    return loss, {"loss": loss, "coarse_color": color_term, "coarse_logbeta": beta_term}


def depth_loss_l2(gt_depth, pred_depth, gt_conf=None, w=100.0):
    """Masked depth-prior L2 (metrics.py:24-31): valid where gt_depth >= 0
    and (if given) SGM confidence >= 4; scaled by w."""
    valid = gt_depth >= 0
    if gt_conf is not None:
        valid = valid & (gt_conf >= 4)
    n = jnp.maximum(jnp.sum(valid), 1)
    term = jnp.sum(jnp.where(valid, (pred_depth - gt_depth) ** 2, 0.0)) / n
    term = term * w
    return term, {"depth_l2": term, "depth_weight": w}


def differentiable_thresholding(x, thr=0.5):
    """Soft step sigmoid(100 (x - thr)) (metrics.py:33-34)."""
    return 1.0 / (1.0 + jnp.exp(-100.0 * (x - thr)))


def shadow_loss_l2(smask, geo_shadows):
    """Shadow-prior loss (metrics.py:36-58): penalize rendered sun visibility
    where the prior mask says shadow (smask <= 0.5), weighted by the GT
    shadow fraction."""
    in_shadow = smask <= 0.5
    diff = jnp.where(in_shadow, (geo_shadows - smask) ** 2, 0.0)
    mean_diff = jnp.sum(diff) / (jnp.sum(in_shadow) + 1e-6)
    frac = jnp.sum(in_shadow) / jnp.maximum(jnp.sum(smask >= 0), 1)
    term = frac * mean_diff
    penalized = jnp.mean(((geo_shadows > 0.2) & (smask < 0.5)).astype(jnp.float32))
    return term, {"shadows_term1": term, "shadow_vals_to_penalize": penalized}


def mse(pred, gt, valid_mask=None):
    v = (pred - gt) ** 2
    if valid_mask is not None:
        return jnp.sum(jnp.where(valid_mask, v, 0.0)) / jnp.maximum(jnp.sum(valid_mask), 1)
    return jnp.mean(v)


def psnr(pred, gt, valid_mask=None):
    return -10.0 * jnp.log10(mse(pred, gt, valid_mask))
