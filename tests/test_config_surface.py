"""Config-surface liveness: every TrainConfig field must be read somewhere
outside its own definition and the CLI flag mapping.

Round-2 verdict precedent: `data_axis` was written to opts.json and read by
NOTHING — a silent dead flag on the user surface. This test makes that
class of regression impossible to reintroduce quietly: a new field either
gets wired in, or lands on the explicit dead-list below with a reason
(mirroring how docs/PARITY.md documents the reference's own dead flags).
"""

import dataclasses
import os
import re

from eonerf_code_tpu.config import TrainConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Fields legitimately consumed inside config.py itself (reference parity:
# opt.py:98-99 forces radiometric_normalization from --model).
CONFIG_INTERNAL = {"model"}

# Reference flags we deliberately keep on the surface but re-route or
# subsume; must stay documented in docs/PARITY.md if ever added here.
DEAD_ALLOWED = set()


def _source_files():
    roots = ["eonerf_code_tpu", "scripts"]
    files = ["train_eonerf.py", "eval_eonerf.py", "train_mlp_nerf.py",
             "bench.py", "__graft_entry__.py"]
    out = []
    for root in roots:
        for dirpath, _dirs, names in os.walk(os.path.join(REPO, root)):
            out.extend(os.path.join(dirpath, n) for n in names
                       if n.endswith(".py"))
    out.extend(os.path.join(REPO, f) for f in files)
    return [p for p in out
            if os.path.basename(p) not in ("config.py", "cli.py")
            and os.path.exists(p)]


def test_every_config_field_is_read():
    blobs = {p: open(p).read() for p in _source_files()}
    dead = []
    for f in dataclasses.fields(TrainConfig):
        if f.name in CONFIG_INTERNAL or f.name in DEAD_ALLOWED:
            continue
        pat = re.compile(rf"\b{re.escape(f.name)}\b")
        if not any(pat.search(b) for b in blobs.values()):
            dead.append(f.name)
    assert not dead, (
        f"TrainConfig fields read by nothing outside config.py/cli.py: "
        f"{dead} — wire them in or add to DEAD_ALLOWED with a reason")


def test_config_internal_fields_actually_read_there():
    cfg_src = open(os.path.join(REPO, "eonerf_code_tpu", "config.py")).read()
    body = cfg_src.split("def __post_init__", 1)[1]
    for name in CONFIG_INTERNAL:
        assert re.search(rf"\b{re.escape(name)}\b", body), (
            f"{name} whitelisted as config-internal but not read in "
            f"__post_init__")
