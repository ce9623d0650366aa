"""Megastep cadence: _block_size must make every schedule event (occ
update, val, save, loss-gate flips) fire on EXACTLY the steps a naive
per-step loop would use (reference semantics, train_eonerf.py:112,180-194)."""

import pytest


class FakeTrainer:
    """Pull in the real _block_size with minimal state."""

    from eonerf_code_tpu.train.loop import Trainer as _T

    _block_size = _T._block_size

    def __init__(self, steps_per_call, val_freq, save_freq, occ_every=None,
                 gates=()):
        class Cfg:
            pass

        self.cfg = Cfg()
        self.cfg.steps_per_call = steps_per_call
        self.cfg.occ_update_every = occ_every or 50
        self.cfg.first_shadow_step = gates[0] if gates else None
        self.cfg.first_beta_step = gates[1] if len(gates) > 1 else None
        self.cfg.occ_tighten = False
        self.cfg.occ_tighten_start_step = 2000
        self.val_freq = val_freq
        self.save_freq = save_freq
        self._occ_update = object() if occ_every else None
        self.occ_grid = object() if occ_every else None


def simulate(trainer, steps_per_epoch, max_steps):
    """Run the block scheduler; return (occ_steps, event_steps, blocks)."""
    occ_steps, events, blocks = [], [], []
    step = 0
    while step < max_steps:
        i = 0
        while i < steps_per_epoch and step < max_steps:
            if trainer._occ_update is not None and step % trainer.cfg.occ_update_every == 0:
                occ_steps.append(step)
            k = trainer._block_size(step, steps_per_epoch - i, max_steps - step)
            blocks.append((step, k))
            i += k
            step += k
            done = step - 1
            for freq, name in ((trainer.save_freq, "save"), (trainer.val_freq, "val")):
                if done > 0 and done % freq == 0:
                    events.append((done, name))
    return occ_steps, events, blocks


def naive_events(steps_per_epoch, max_steps, val_freq, save_freq, occ_every):
    occ, ev = [], []
    step = 0
    while step < max_steps:
        for _ in range(steps_per_epoch):
            if step >= max_steps:
                break
            if occ_every and step % occ_every == 0:
                occ.append(step)
            if step > 0 and step % save_freq == 0:
                ev.append((step, "save"))
            if step > 0 and step % val_freq == 0:
                ev.append((step, "val"))
            step += 1
    return occ, ev


@pytest.mark.parametrize("spc,val,save,occ", [
    (25, 18, 72, 50),    # reference-style: val each epoch, save 4x, occ 50
    (50, 100, 400, 50),
    (7, 5, 20, 3),       # pathological small freqs
    (1, 18, 72, 50),     # single-step mode must degrade gracefully
])
def test_events_fire_on_reference_steps(spc, val, save, occ):
    steps_per_epoch, max_steps = 18, 130
    tr = FakeTrainer(spc, val, save, occ_every=occ)
    occ_steps, events, blocks = simulate(tr, steps_per_epoch, max_steps)
    occ_ref, ev_ref = naive_events(steps_per_epoch, max_steps, val, save, occ)
    assert occ_steps == occ_ref
    assert sorted(events) == sorted(ev_ref)
    # blocks cover every step exactly once
    covered = []
    for s, k in blocks:
        covered.extend(range(s, s + k))
    assert covered == list(range(max_steps))


def test_gate_steps_never_mid_block():
    tr = FakeTrainer(25, 1000, 4000, occ_every=None, gates=(30, 55))
    _, _, blocks = simulate(tr, 200, 120)
    for s, k in blocks:
        for gate in (30, 55):
            # a gate boundary may only coincide with a block START
            assert not (s < gate < s + k), (s, k, gate)
