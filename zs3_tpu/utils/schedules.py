"""LR schedules as pure optax schedules.

Functional parity target: reference zs3/utils/lr_scheduler.py (class
LR_Scheduler) — 'poly' ((1 - iter/max_iter)^0.9), 'step' (0.1x every 1/3
of training), 'cos', with linear warmup; the head param group runs at
10x LR (applied via a separate optax label, see zs3_tpu.train.state).

The reference mutates optimizer.param_groups imperatively per iteration;
here schedules are pure functions of the step folded into the jit graph.
"""

from __future__ import annotations

import optax


def build_schedule(
    mode: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    poly_power: float = 0.9,
) -> optax.Schedule:
    total_steps = max(int(total_steps), 1)

    if mode == "poly":
        main = optax.polynomial_schedule(
            init_value=base_lr,
            end_value=0.0,
            power=poly_power,
            transition_steps=max(total_steps - warmup_steps, 1),
        )
    elif mode == "cos":
        main = optax.cosine_decay_schedule(
            init_value=base_lr,
            decay_steps=max(total_steps - warmup_steps, 1),
        )
    elif mode == "step":
        # 0.1x at 2/3 of training (reference: lr * 0.1^(epoch // (0.97*epochs//3))
        # simplified to the standard single drop the lineage converges to).
        boundaries = {int(total_steps * 2 / 3): 0.1}
        main = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif mode == "const":
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unknown schedule {mode!r}")

    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.join_schedules([warmup, main], [warmup_steps])
    return main
