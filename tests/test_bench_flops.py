"""FLOP-accounting invariants for bench.py's MFU/HFU lines.

The bench prints efficiency under both standard definitions:
MFU = remat-independent model flops (fwd + dgrad + wgrad = 3x fwd) / peak,
HFU = executed flops (incl. the backward's flash-style forward recompute,
which ``--bwd_acts saved`` skips for the 8-matmul trunk only) / peak.
These tests pin the relationships so a formula edit can't silently skew
the reported efficiency.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import flops_per_ray  # noqa: E402


def test_model_flops_are_remat_independent():
    m_rec, _ = flops_per_ray(128, 0, save_acts=False)
    m_sav, _ = flops_per_ray(128, 0, save_acts=True)
    assert m_rec == m_sav


def test_recompute_executed_is_4_over_3_of_model():
    model, executed = flops_per_ray(128, 0, save_acts=False)
    # recompute mode re-runs the whole forward in the backward: 4x fwd
    # executed vs 3x fwd model (fwd + dgrad + wgrad)
    assert executed * 3 == model * 4


def test_saved_acts_skips_about_a_fifth_of_executed():
    _, e_rec = flops_per_ray(128, 0, save_acts=False)
    _, e_sav = flops_per_ray(128, 0, save_acts=True)
    # skipping the trunk recompute in both backward kernels removes ~21%
    # of executed matmul flops (STATUS.md: camera 4.1->3.1, shadow 3->2
    # trunk-pass units); heads are still recomputed, so strictly < 25%
    saving = 1.0 - e_sav / e_rec
    assert 0.18 < saving < 0.25
    # executed can never drop below the algorithmic minimum
    model, _ = flops_per_ray(128, 0, save_acts=True)
    assert e_sav > model


def test_sc_samples_reduce_shadow_share_only():
    m_full, e_full = flops_per_ray(128, 0, save_acts=False)
    m_sc64, e_sc64 = flops_per_ray(128, 64, save_acts=False)
    assert m_sc64 < m_full and e_sc64 < e_full
    # shadow march is sigma-only (trunk without heads): halving its sample
    # count (127 -> 63) must cut total flops by less than half the shadow
    # share (~45% of the step), i.e. 20-30%
    assert 0.15 < 1.0 - m_sc64 / m_full < 0.30
    # sc_n_samples=0 follows n_samples (the reference's rule)
    assert flops_per_ray(128, 128) == flops_per_ray(128, 0)
