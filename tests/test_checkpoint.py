"""Saver: experiment dirs, round-trip restore, best tracking, GC."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training import train_state

from zs3_tpu.core.config import Config
from zs3_tpu.utils.saver import Saver


def _tiny_state(value=0.0):
    params = {"w": jnp.full((4,), value), "b": jnp.zeros((2,))}
    return train_state.TrainState.create(
        apply_fn=None, params=params, tx=optax.sgd(0.1)
    )


def test_experiment_dir_increments(tmp_path):
    s0 = Saver(str(tmp_path), "pascal", "exp", Config())
    s1 = Saver(str(tmp_path), "pascal", "exp")
    assert s0.directory.endswith("experiment_0")
    assert s1.directory.endswith("experiment_1")
    assert os.path.exists(os.path.join(s0.directory, "config.json"))


def test_save_restore_roundtrip(tmp_path):
    saver = Saver(str(tmp_path), "ds", "name", keep=2)
    state = _tiny_state(3.5)
    path = saver.save_checkpoint(state, step=7, best_metric=0.5)
    target = _tiny_state(0.0)
    restored = Saver.restore(path, target)
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 3.5)
    assert int(restored.step) == int(state.step)


def test_best_symlink_and_gc(tmp_path):
    saver = Saver(str(tmp_path), "ds", "name", keep=2)
    saver.save_checkpoint(_tiny_state(1.0), 1, 0.1, is_best=True)
    saver.save_checkpoint(_tiny_state(2.0), 2, 0.1)
    saver.save_checkpoint(_tiny_state(3.0), 3, 0.1)
    saver.save_checkpoint(_tiny_state(4.0), 4, 0.1)
    ckpts = sorted(
        d for d in os.listdir(saver.directory)
        if d.startswith("ckpt_") and not d.endswith(".json")
    )
    # keep=2 plus the protected best (ckpt_00000001)
    assert "ckpt_00000001" in ckpts
    assert len(ckpts) == 3
    best = Saver.best_checkpoint(saver.directory)
    restored = Saver.restore(best, _tiny_state())
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.0)


def test_latest_checkpoint(tmp_path):
    saver = Saver(str(tmp_path), "ds", "name")
    assert Saver.latest_checkpoint(saver.directory) is None
    saver.save_checkpoint(_tiny_state(), 5, 0.0)
    latest = Saver.latest_checkpoint(saver.directory)
    assert latest.endswith("ckpt_00000005")
