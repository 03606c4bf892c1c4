"""Train state + optimizer schedule.

Recipe parity with the reference trainer (reference train.py:49-56):
AdamW(lr) + MultiStepLR(milestones=lr_step epochs, gamma=lr_factor),
default lr 1e-3, steps [30, 40], factor 0.1 (train.py:263-270; the
README's published recipe uses lr 1e-4, milestones [30]).

The state carries params, BatchNorm running statistics, optimizer state
and the step counter in one pytree so the whole update is a single jitted
function (and shards trivially under a Mesh).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats) -> "TrainState":
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def multistep_lr(
    base_lr: float,
    milestones_steps: Sequence[int],
    factor: float,
) -> optax.Schedule:
    """torch MultiStepLR equivalent: lr *= factor at each milestone
    (reference train.py:53-55), with milestones in optimizer steps."""
    boundaries = {int(m): factor for m in milestones_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def create_train_state(
    model,
    rng: Array,
    input_shape: Tuple[int, ...],
    lr: float = 1e-3,
    milestones_steps: Sequence[int] = (),
    lr_factor: float = 0.1,
    weight_decay: float = 0.01,  # torch AdamW default (train.py:50-51)
) -> Tuple["TrainState", optax.Schedule]:
    variables = model.init(rng, jnp.zeros(input_shape), train=False)
    schedule = multistep_lr(lr, milestones_steps, lr_factor)
    tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
    return state, schedule
