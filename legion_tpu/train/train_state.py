"""Training state + checkpoint/resume.

The reference has no checkpointing at all (SURVEY.md §5) — a crash loses
the run. Here the full state (params, Adam state, step/epoch counters and
the sampler PRNG key) round-trips through orbax, so training is resumable
and elastic.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray          # () int32 global step
    epoch: jnp.ndarray         # () int32
    rng: jax.Array             # sampler+dropout PRNG key (split per step)

    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt, step=self.step + 1)


def create_train_state(params, learning_rate: float, seed: int) -> TrainState:
    """Adam, matching the reference optimizer/config
    (``legion_graphsage.py:144``, lr 0.003 default)."""
    tx = optax.adam(learning_rate)
    return TrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), epoch=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed), tx=tx)


# -- orbax checkpointing ----------------------------------------------------

def save_checkpoint(ckpt_dir: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ck:
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step, "epoch": state.epoch, "rng": state.rng}
        path = f"{ckpt_dir}/step_{int(state.step)}"
        ck.save(path, payload, force=True)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    import os
    import re
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", d)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return f"{ckpt_dir}/step_{max(steps)}"


def restore_checkpoint(ckpt_dir: str, state: TrainState) -> Optional[TrainState]:
    """Restore the latest checkpoint into the given (template) state;
    returns None when no checkpoint exists."""
    import orbax.checkpoint as ocp
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return None
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step, "epoch": state.epoch, "rng": state.rng}
    with ocp.StandardCheckpointer() as ck:
        restored = ck.restore(path, template)
    return state.replace(**restored)


def maybe_checkpoint_step(train_cfg, state: TrainState, step_index: int
                          ) -> None:
    """Mid-epoch checkpoint cadence (TrainConfig.checkpoint_every_steps),
    shared by the pipelined trainers so the cadence can't drift between
    drivers."""
    if (train_cfg.checkpoint_dir and train_cfg.checkpoint_every_steps
            and (step_index + 1) % train_cfg.checkpoint_every_steps == 0):
        save_checkpoint(train_cfg.checkpoint_dir, state)
