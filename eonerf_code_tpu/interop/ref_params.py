"""Weight transplant between EONerfField (flax) and EONerfMLP (torch).

The mapping is mechanical (reference: radiance_fields/eonerf.py:69-139 vs
eonerf_code_tpu/models/eonerf.py): both share trunk (8x256 skip-MLP),
sigma/bottleneck dense heads, albedo (1x128), transient (4x128 + two dense
heads), ambient (1x128), a per-image 4-d transient embedding and the
optional 9-d radiometric embedding. Flax Dense kernels are (in, out);
torch Linear weights are (out, in) — transposed here.

Everything is numpy in/out, so this module works without torch installed
(torch is only needed to read .ckpt files in load_reference_checkpoint).
"""

import numpy as np


def _mlp_pairs(our_mlp, ref_mlp, n_hidden, with_output):
    pairs = [(f"{our_mlp}/hidden_{i}", f"{ref_mlp}.hidden_layers.{i}")
             for i in range(n_hidden)]
    if with_output:
        pairs.append((f"{our_mlp}/output", f"{ref_mlp}.output_layer"))
    return pairs


def _dense_map():
    """[(our 'module/layer' path, reference Linear prefix)] for every dense
    layer in the architecture."""
    pairs = []
    pairs += _mlp_pairs("trunk", "base_mlp", 8, False)
    pairs += [("sigma_head/output", "sigma_layer.output_layer"),
              ("bottleneck/output", "bottleneck_layer.output_layer")]
    pairs += _mlp_pairs("albedo_mlp", "albedo_mlp", 1, True)
    pairs += _mlp_pairs("transient_mlp", "transient_mlp", 4, False)
    pairs += [("transient_scalar/output", "transient_scalar.output_layer"),
              ("transient_beta/output", "transient_beta.output_layer")]
    pairs += _mlp_pairs("ambient_mlp", "ambient_mlp", 1, True)
    return pairs


_EMBED_MAP = [
    ("transient_encoder", "transient_encoder.weight"),
    ("radiometric_enc", "radiometricT_enc.weight"),
]


def params_to_reference_state_dict(params):
    """Flax params pytree -> {reference state_dict key: np.float32 array}.

    The result feeds directly into ``EONerfMLP.load_state_dict`` after
    torch.from_numpy on each value.
    """
    p = params.get("params", params)
    out = {}
    for our, ref in _dense_map():
        mod, layer = our.split("/")
        leaf = p[mod][layer]
        out[ref + ".weight"] = np.asarray(leaf["kernel"], np.float32).T.copy()
        out[ref + ".bias"] = np.asarray(leaf["bias"], np.float32).copy()
    for our, ref in _EMBED_MAP:
        if our in p:
            out[ref] = np.asarray(p[our]["embedding"], np.float32).copy()
    return out


def reference_state_dict_to_params(state_dict):
    """Reference EONerfMLP state_dict (torch tensors or arrays) -> flax
    params pytree {"params": {...}} for EONerfField.

    Use with ``EONerfField(n_images=..., radiometric_normalization=...)``
    matching ``infer_field_kwargs(state_dict)``.
    """
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)
          for k, v in state_dict.items()}
    p = {}
    for our, ref in _dense_map():
        if ref + ".weight" not in sd:
            raise KeyError(f"reference state_dict is missing {ref}.weight")
        mod, layer = our.split("/")
        p.setdefault(mod, {})[layer] = {
            "kernel": sd[ref + ".weight"].T.copy(),
            "bias": sd[ref + ".bias"].copy(),
        }
    for our, ref in _EMBED_MAP:
        if ref in sd:
            p[our] = {"embedding": sd[ref].copy()}
    return {"params": p}


def infer_field_kwargs(state_dict):
    """Constructor kwargs for EONerfField implied by a reference
    state_dict: n_images, net widths and the radiometric flag."""
    sd = {k: v for k, v in state_dict.items()}
    emb = np.asarray(getattr(sd["transient_encoder.weight"], "shape", None)
                     or sd["transient_encoder.weight"].shape)
    w0 = sd["base_mlp.hidden_layers.0.weight"]
    n_hidden = len({k.split(".")[2] for k in sd if k.startswith("base_mlp.hidden_layers.")})
    return {
        "n_images": int(emb[0]),
        "transient_dim": int(emb[1]),
        "net_depth": n_hidden,
        "net_width": int(np.asarray(w0.shape)[0]),
        "radiometric_normalization": "radiometricT_enc.weight" in sd,
    }


def load_reference_checkpoint(path):
    """Read a reference training checkpoint (train_eonerf.py:185-191) and
    return (flax params, field kwargs, raw checkpoint dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    kwargs = infer_field_kwargs(sd)
    return reference_state_dict_to_params(sd), kwargs, ckpt
