"""Checkpoint idempotence: integer-tag saves never overwrite a finalized
directory (an overwrite deletes-then-rewrites, so a kill mid-save would
destroy the only good copy — the failure observed when a resumed run's
end-of-segment save re-targeted the checkpoint it restored from); the
"best" tag keeps overwrite semantics."""

import jax.numpy as jnp
import numpy as np

from eonerf_code_tpu.train.checkpoints import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def test_int_tag_save_is_idempotent(tmp_path):
    log_dir = str(tmp_path)
    state1 = {"x": jnp.asarray([1.0, 2.0]), "step": 100}
    state2 = {"x": jnp.asarray([9.0, 9.0]), "step": 100}
    save_checkpoint(log_dir, 5, state1)
    path = save_checkpoint(log_dir, 5, state2)  # skipped, not overwritten
    got = restore_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(got["x"]), [1.0, 2.0])


def test_named_tag_overwrites(tmp_path):
    log_dir = str(tmp_path)
    save_checkpoint(log_dir, "best", {"x": jnp.asarray([1.0])})
    path = save_checkpoint(log_dir, "best", {"x": jnp.asarray([7.0])})
    got = restore_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(got["x"]), [7.0])


def test_latest_ignores_unfinalized_tmp_dirs(tmp_path):
    log_dir = str(tmp_path)
    save_checkpoint(log_dir, 3, {"x": jnp.asarray([1.0])})
    # a killed-mid-save orbax tmp dir must not win the "latest" race
    (tmp_path / "ckpts" / "epoch=9.orbax-checkpoint-tmp").mkdir()
    assert latest_checkpoint(log_dir).endswith("epoch=3")
