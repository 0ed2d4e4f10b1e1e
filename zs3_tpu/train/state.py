"""Train state: params + batch stats + two-group SGD optimizer.

Functional parity target: the reference's optimizer setup (reference:
train_pascal.py Trainer.__init__) — SGD(momentum=0.9, wd=5e-4) over two
param groups, backbone at 1x LR and ASPP/decoder/classifier at 10x
(reference: zs3/modeling/deeplab.py get_1x_lr_params/get_10x_lr_params),
with the poly schedule applied per iteration.

Here the groups are optax.multi_transform labels derived from the param
tree path ('encoder/...' vs everything else), and the schedule is a pure
function of the step — no param_group mutation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from zs3_tpu.core.config import Config
from zs3_tpu.utils.schedules import build_schedule


class SegTrainState(train_state.TrainState):
    batch_stats: Any = None

    def eval_variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def _group_label_tree(params) -> Any:
    """Label each leaf 'backbone' (1x LR) or 'head' (10x LR) by path."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {
        path: ("backbone" if path[0] == "encoder" else "head") for path in flat
    }
    return flax.traverse_util.unflatten_dict(labels)


def make_seg_optimizer(cfg: Config, total_steps: int) -> optax.GradientTransformation:
    def sgd_for(lr_mult: float) -> optax.GradientTransformation:
        sched = build_schedule(
            cfg.optim.schedule,
            cfg.optim.lr * lr_mult,
            total_steps,
            cfg.optim.warmup_steps,
            cfg.optim.poly_power,
        )
        parts = []
        if cfg.optim.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.optim.weight_decay))
        parts.append(
            optax.sgd(sched, momentum=cfg.optim.momentum, nesterov=cfg.optim.nesterov)
        )
        return optax.chain(*parts)

    return optax.multi_transform(
        {"backbone": sgd_for(1.0), "head": sgd_for(cfg.optim.head_lr_mult)},
        _group_label_tree,
    )


def create_seg_state(
    model,
    cfg: Config,
    rng: jax.Array,
    input_shape: Tuple[int, int, int, int],
    total_steps: int,
    init_variables: Optional[Dict[str, Any]] = None,
) -> SegTrainState:
    if init_variables is None:
        dummy = jnp.zeros(input_shape, jnp.float32)
        # jit the init: eager init dispatches hundreds of tiny ops, which
        # is pathological through a remote-device relay.
        init_variables = jax.jit(
            lambda r: model.init(r, dummy, train=False)
        )(rng)
    tx = make_seg_optimizer(cfg, total_steps)
    return SegTrainState.create(
        apply_fn=model.apply,
        params=init_variables["params"],
        batch_stats=init_variables.get("batch_stats", {}),
        tx=tx,
    )
