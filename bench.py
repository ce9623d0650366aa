"""Benchmark: EO-NeRF training throughput (rays/sec/chip) on real hardware.

Workload matches the reference's production configuration on JAX_068
(run_JAX_RGB.sh): full train step = camera pass (128 stratified samples/ray
through the 8x256 trunk + all heads) + geometric shadow pass (sigma-only
second march) + beta loss + Adam update, with radiometric normalization on.
The batch size is scanned over a small grid because the TPU operating point
is a larger megabatch than the reference's 1024 (rays/sec is the metric;
both are reported).

Benches the framework's PRODUCTION DEFAULTS (round-4 on-chip A/B, quality
parity verified at production scale): bwd_acts=saved, sc_n_samples=auto
(64 at n=128). Env hooks (EONERF_BENCH_BWD_ACTS / _SC_SAMPLES / _QUANT)
override for A/Bs; EONERF_BENCH_SC_SAMPLES=0 + _BWD_ACTS=recompute
reproduces the round-3 operating point.

Baseline: the reference publishes NO numbers (BASELINE.md). `vs_baseline`
is computed against an ESTIMATED A100 PyTorch throughput of 10,000 rays/s
for the same per-step work (derived from SatNeRF-class runtimes: ~300k
steps x 1024 rays in ~20h on V100 ~ 4.3k rays/s, doubled for A100 and
rounded up to be conservative toward the baseline). The MEASURED anchor is
`fused_vs_unfused_same_chip`: the same workload through the per-sample
(non-Pallas) XLA path on the same chip, benched in the same run.

Each grid point is measured EONERF_BENCH_REPEATS (default 3) times; the
headline is the median and `spread_frac_by_batch_size` prints the
(max-min)/median band so round-over-round deltas are interpretable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import numpy as np

A100_BASELINE_RAYS_PER_SEC = 10_000.0
PEAK_BF16_TFLOPS = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0,
                    "v5p": 459.0, "v6": 918.0}


def flops_per_ray(n_samples=128, sc_n_samples=0, save_acts=False):
    """Matmul FLOPs per ray for one full train step (LOGICAL model flops,
    not padded kernel flops). Returns (model, executed):

    - model: remat-independent algorithmic flops — fwd + dgrad + wgrad =
      3x forward (the standard MFU numerator; recomputation is NOT useful
      work by this definition).
    - executed: what the hardware actually runs. The backward kernels are
      flash-style — they recompute the forward before dgrad+wgrad (4x fwd
      total); with ``save_acts`` the 8-matmul trunk recompute is skipped
      (trunk 3x, heads still recomputed from the streamed activations).
      executed/peak = HFU.
    """
    k = n_samples - 1
    k_sc = (sc_n_samples or n_samples) - 1
    trunk = 63 * 256 + 6 * 256 * 256 + 319 * 256
    heads = (256 * 1 + 256 * 256            # sigma + bottleneck
             + 256 * 128 + 128 * 3          # albedo mlp
             + 260 * 128 + 3 * 128 * 128    # transient mlp
             + 128 * 2)                     # ts + tb
    cam_trunk = 2 * trunk * k
    cam_heads = 2 * heads * k
    sh = 2 * (trunk + 256) * k_sc
    model = 3 * (cam_trunk + cam_heads + sh)
    if save_acts:
        executed = 3 * cam_trunk + 4 * cam_heads + 3 * sh
    else:
        executed = 4 * (cam_trunk + cam_heads + sh)
    return model, executed


def device_peak_tflops(device_str):
    for key, peak in PEAK_BF16_TFLOPS.items():
        if key in device_str.lower():
            return peak
    return None


def build_step(n_images=10, n_samples=128, compute_dtype="bfloat16", scan_steps=20,
               trunk_quant=False, save_acts=False, sc_n_samples=0,
               use_pallas=True):
    """Returns (megastep, params, opt_state): `scan_steps` full train steps
    chained by lax.scan inside one jit dispatch — the framework's real
    training operating mode (train/loop.py make_megastep). Uses the trainer's
    production default field backend (fused Pallas kernels at bf16 on an
    accelerator; the XLA grad step is HBM-bound and anti-scales)."""
    import jax
    import jax.numpy as jnp
    import optax

    from eonerf_code_tpu.data.rays import satrays_from_tensor
    from eonerf_code_tpu.models.eonerf import EONerfField
    from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
    from eonerf_code_tpu.utils import metrics as M

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    base_field = EONerfField(n_images=n_images, compute_dtype=dtype)
    params = base_field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                             jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                             method="init_all")
    if use_pallas and compute_dtype == "bfloat16" and jax.default_backend() == "tpu":
        from eonerf_code_tpu.models.fused import PallasField

        field = PallasField(base_field, trunk_quant=trunk_quant,
                            save_acts=save_acts)
    else:
        field = base_field
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    rcfg = RenderConfig(n_samples=n_samples,
                        sc_n_samples=sc_n_samples or n_samples)

    @jax.jit
    def megastep(params, opt_state, batch, keys):
        def loss_fn(p, key):
            rays = satrays_from_tensor(batch["rays"], batch["ts"])
            out = render_rays(field, p, rays, key, rcfg, shadows=True)
            loss, _ = M.uncertainty_aware_loss(batch["rgbs"], out["rgb"], out["beta"])
            return loss

        def body(carry, key):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, key)
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), keys)
        return params, opt_state, losses[-1]

    def train_step(params, opt_state, batch, key):
        keys = jax.random.split(key, scan_steps)
        return megastep(params, opt_state, batch, keys)

    train_step.scan_steps = scan_steps
    return train_step, params, opt_state


def make_batch(n_rays, n_images=10, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 0] = rng.uniform(-0.9, 0.9, n_rays)
    o[:, 1] = rng.uniform(-0.9, 0.9, n_rays)
    o[:, 2] = 0.999
    d = np.tile(np.array([0.05, 0.02, -1.0], np.float32), (n_rays, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sun = np.tile(np.array([0.3, 0.2, -0.93], np.float32), (n_rays, 1))
    sun /= np.linalg.norm(sun, axis=1, keepdims=True)
    rays = np.hstack([o, d, np.zeros((n_rays, 1), np.float32),
                      2.0 * np.ones((n_rays, 1), np.float32), sun]).astype(np.float32)
    return {
        "rays": jnp.asarray(rays),
        "ts": jnp.asarray(rng.integers(0, n_images, n_rays).astype(np.int32)),
        "rgbs": jnp.asarray(rng.random((n_rays, 3)).astype(np.float32)),
    }


def time_batch(train_step, params, opt_state, batch_size, warmup=2, iters=6):
    """Chained megasteps on device; completion forced by a host SCALAR fetch
    of the final loss (on the tunneled axon backend, block_until_ready alone
    is not a reliable completion barrier and large-array fetches are slow)."""
    import jax

    batch = make_batch(batch_size)
    key = jax.random.PRNGKey(0)
    p, o = params, opt_state
    for i in range(warmup):
        p, o, loss = train_step(p, o, batch, jax.random.fold_in(key, i))
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, loss = train_step(p, o, batch, jax.random.fold_in(key, 100 + i))
    _ = float(loss)  # forces the whole dependency chain
    dt = time.perf_counter() - t0
    return batch_size * iters * train_step.scan_steps / dt


def main():
    import os
    import signal
    import jax

    # Watchdog: the tunneled axon device can hang indefinitely at init when
    # the tunnel is down; better ONE error line than a silent stall. SIGALRM
    # only fires if the whole bench exceeds the budget (normal run: ~3 min
    # incl. compile; the alarm is cleared before printing results).
    def _timeout(_sig, _frm):
        print(json.dumps({"metric": "train_rays_per_sec_per_chip",
                          "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
                          "error": "device init/run exceeded watchdog "
                                   "(TPU tunnel down?)",
                          # context, NOT a measurement from this run: the
                          # most recent completed on-chip result of this
                          # same benchmark (see STATUS.md headline table)
                          "last_measured": {
                              "value": 126237.6, "unit": "rays/s",
                              "date": "2026-08-19", "device": "TPU v5 lite",
                              "hfu": 0.477, "mfu": 0.447}}),
              flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(28 * 60)  # covers the second (unfused-baseline) compile

    # A/B hook: EONERF_BENCH_QUANT=int8|int8_full measures the int8-trunk
    # operating points (kernel arithmetic only; workload identical)
    trunk_quant = {"int8": True, "int8_full": "full"}.get(
        os.environ.get("EONERF_BENCH_QUANT", "none"), False)
    # A/B hook: EONERF_BENCH_BWD_ACTS=recompute measures the flash-style
    # backward; the default benches the production default (saved: stream
    # trunk acts through HBM, skip the bwd recompute — round-4 on-chip A/B)
    save_acts = os.environ.get("EONERF_BENCH_BWD_ACTS", "saved") == "saved"
    if trunk_quant and save_acts:
        # same fallback as models/fused.make_render_field: the int8 kernels
        # have no saved-activations path, and the bwd_acts default is now
        # "saved" — the documented EONERF_BENCH_QUANT=int8 A/B must not
        # crash (and the HFU FLOP count must match what actually runs)
        print("trunk_quant=int8: bwd_acts=saved unsupported, "
              "falling back to recompute", flush=True)
        save_acts = False
    # A/B hook: EONERF_BENCH_SC_SAMPLES=N overrides the shadow-march sample
    # count (-1 = production auto rule -> 64 at n=128; 0 = follow n_samples,
    # the reference's rule)
    from eonerf_code_tpu.config import TrainConfig

    sc_raw = int(os.environ.get("EONERF_BENCH_SC_SAMPLES", "-1"))
    sc_n_samples = TrainConfig(sc_n_samples=sc_raw).resolve_sc_n_samples()
    results = {}
    train_step, params, opt_state = build_step(trunk_quant=trunk_quant,
                                               save_acts=save_acts,
                                               sc_n_samples=sc_n_samples)
    # A/B hook: EONERF_BENCH_BS=comma-list overrides the batch grid;
    # EONERF_BENCH_REPEATS=N the per-point repeat count (median reported —
    # round-4 verdict weak #6: single-shot benches carry an undeclared
    # +-0.5-1% noise band; 3 repeats make round-over-round deltas
    # interpretable against a PRINTED spread)
    bs_grid = tuple(int(x) for x in os.environ.get(
        "EONERF_BENCH_BS", "4096,8192,16384").split(","))
    repeats = int(os.environ.get("EONERF_BENCH_REPEATS", "3"))
    spreads = {}
    for bs in bs_grid:
        try:
            vals = sorted(time_batch(train_step, params, opt_state, bs)
                          for _ in range(repeats))
            results[bs] = vals[len(vals) // 2]
            spreads[bs] = round((vals[-1] - vals[0]) / results[bs], 4)
        except Exception:  # OOM on larger batches is informative, not fatal
            results[bs] = None
    valid = {k: v for k, v in results.items() if v}
    if not valid:
        print(json.dumps({"metric": "train_rays_per_sec_per_chip", "value": 0.0,
                          "unit": "rays/s", "vs_baseline": 0.0,
                          "error": "all batch sizes failed"}))
        return
    best_bs = max(valid, key=valid.get)
    best = valid[best_bs]

    # Measured SAME-CHIP baseline: the per-sample (non-Pallas) XLA path at
    # its best batch size — a defensible speedup denominator alongside the
    # A100 estimate (round-4 verdict weak #3). Skippable for fast A/Bs.
    unfused = None
    if os.environ.get("EONERF_BENCH_UNFUSED", "1") != "0" and not trunk_quant:
        try:
            u_step, u_params, u_opt = build_step(
                save_acts=False, sc_n_samples=sc_n_samples, use_pallas=False)
            u_results = {bs: time_batch(u_step, u_params, u_opt, bs)
                         for bs in (4096, 8192)}
            u_bs = max(u_results, key=u_results.get)
            unfused = {"rays_per_sec": round(u_results[u_bs], 1),
                       "batch_size": u_bs,
                       "by_batch_size": {str(k): round(v, 1)
                                         for k, v in u_results.items()}}
        except Exception as e:  # the baseline arm must never kill the bench
            unfused = {"error": repr(e)[:200]}
    signal.alarm(0)
    device = str(jax.devices()[0])
    model_fpr, exec_fpr = flops_per_ray(128, sc_n_samples, save_acts)
    model_tflops = best * model_fpr / 1e12
    exec_tflops = best * exec_fpr / 1e12
    peak = device_peak_tflops(device)
    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / A100_BASELINE_RAYS_PER_SEC, 3),
        "baseline_note": "estimated A100 PyTorch EO-NeRF throughput (reference publishes none)",
        "batch_size": best_bs,
        "by_batch_size": {str(k): (round(v, 1) if v else None) for k, v in results.items()},
        "repeats": repeats,
        "spread_frac_by_batch_size": {str(k): v for k, v in spreads.items()},
        "unfused_same_chip": unfused,
        "fused_vs_unfused_same_chip": (
            round(best / unfused["rays_per_sec"], 2)
            if unfused and "rays_per_sec" in unfused else None),
        "device": device,
        "n_samples": 128,
        "sc_n_samples": sc_n_samples or 128,
        "shadows": True,
        "trunk_quant": {True: "int8", "full": "int8_full"}.get(
            trunk_quant, "none"),
        "bwd_acts": "saved" if save_acts else "recompute",
        # FLOP-counted efficiency, both definitions (see flops_per_ray):
        # MFU = remat-independent model flops (fwd + dgrad + wgrad) / peak;
        # HFU = executed flops (incl. the backward's flash-style forward
        # recompute) / peak. Logical matmul flops, NOT padded kernel flops.
        "model_flops_per_ray": model_fpr,
        "executed_flops_per_ray": exec_fpr,
        "model_tflops_per_sec": round(model_tflops, 1),
        "executed_tflops_per_sec": round(exec_tflops, 1),
        "mfu_vs_bf16_peak": (round(model_tflops / peak, 3) if peak else None),
        "hfu_vs_bf16_peak": (round(exec_tflops / peak, 3) if peak else None),
        "peak_bf16_tflops_assumed": peak,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
