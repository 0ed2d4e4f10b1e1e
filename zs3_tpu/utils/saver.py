"""Checkpointing and experiment directories.

Functional parity target: reference zs3/utils/saver.py (class Saver) —
run/<dataset>/<checkname>/experiment_N/ directories, checkpoint payloads
of {step, params, opt state, best metric}, `is_best` tracking, and a
config dump (the reference writes parameters.txt; we write config.json).

Implementation: orbax StandardCheckpointer (the non-deprecated pytree
surface; saves are async, so save_checkpoint blocks on
wait_until_finished before touching the directory) per step directory +
a tiny JSON sidecar for scalar bookkeeping.  Resume restores the exact
pytree structure of a freshly-created state (step-indexed RNG keys make
the resumed run deterministic).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from zs3_tpu.core.config import Config


class Saver:
    def __init__(
        self,
        base_dir: str,
        dataset: str,
        checkname: str,
        config: Optional[Config] = None,
        keep: int = 3,
    ):
        root = os.path.join(base_dir, dataset, checkname)
        os.makedirs(root, exist_ok=True)
        runs = sorted(
            int(d.split("_")[-1])
            for d in os.listdir(root)
            if d.startswith("experiment_") and d.split("_")[-1].isdigit()
        )
        run_id = (runs[-1] + 1) if runs else 0
        self.directory = os.path.join(root, f"experiment_{run_id}")
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self._ckpt = ocp.StandardCheckpointer()
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                f.write(config.to_json())

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:08d}")

    def save_checkpoint(
        self,
        state: Any,
        step: int,
        best_metric: float,
        is_best: bool = False,
        extra: Optional[Dict[str, Any]] = None,
    ) -> str:
        path = self._step_dir(step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, jax.device_get(state))
        self._ckpt.wait_until_finished()
        meta = {"step": step, "best_metric": best_metric, **(extra or {})}
        with open(path + ".json", "w") as f:
            json.dump(meta, f)
        if is_best:
            best = os.path.join(self.directory, "best")
            if os.path.islink(best) or os.path.exists(best):
                if os.path.islink(best):
                    os.unlink(best)
                else:
                    shutil.rmtree(best)
            os.symlink(os.path.basename(path), best)
        self._gc()
        return path

    def _gc(self):
        ckpts = sorted(
            d for d in os.listdir(self.directory) if d.startswith("ckpt_")
            and not d.endswith(".json")
        )
        best_target = None
        best = os.path.join(self.directory, "best")
        if os.path.islink(best):
            best_target = os.readlink(best)
        doomed = ckpts[: -self.keep] if self.keep > 0 else []
        for d in doomed:
            if d == best_target:
                continue
            shutil.rmtree(os.path.join(self.directory, d), ignore_errors=True)
            meta = os.path.join(self.directory, d + ".json")
            if os.path.exists(meta):
                os.remove(meta)

    @staticmethod
    def restore(path: str, target: Any) -> Any:
        """Restore a checkpoint into the structure of `target`."""
        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(path, target=jax.device_get(target))

    @staticmethod
    def read_meta(path: str) -> Dict[str, Any]:
        """Sidecar metadata ({} if absent) for a checkpoint path.

        Resolves the 'best' symlink so both best/ and ckpt_N find their
        JSON.  Resume paths use this to restore best_metric — otherwise
        the first post-resume validation would re-point 'best' at a
        possibly much worse model.
        """
        real = os.path.realpath(path)
        meta = real.rstrip("/") + ".json"
        if os.path.exists(meta):
            with open(meta) as f:
                return json.load(f)
        return {}

    @staticmethod
    def latest_checkpoint(experiment_dir: str) -> Optional[str]:
        if not os.path.isdir(experiment_dir):
            return None
        ckpts = sorted(
            d
            for d in os.listdir(experiment_dir)
            if d.startswith("ckpt_") and not d.endswith(".json")
        )
        return os.path.join(experiment_dir, ckpts[-1]) if ckpts else None

    @staticmethod
    def best_checkpoint(experiment_dir: str) -> Optional[str]:
        best = os.path.join(experiment_dir, "best")
        return best if os.path.exists(best) else None

    @staticmethod
    def latest_experiment(
        base_dir: str, dataset: str, checkname: str
    ) -> Optional[str]:
        """Most recent experiment_N directory for (dataset, checkname),
        or None.  Powers --auto-resume: crash recovery without manually
        hunting for the newest checkpoint path."""
        root = os.path.join(base_dir, dataset, checkname)
        if not os.path.isdir(root):
            return None
        runs = sorted(
            (
                int(d.split("_")[-1])
                for d in os.listdir(root)
                if d.startswith("experiment_") and d.split("_")[-1].isdigit()
            ),
            reverse=True,
        )
        for run_id in runs:
            exp = os.path.join(root, f"experiment_{run_id}")
            if Saver.latest_checkpoint(exp):
                return exp
        return None
