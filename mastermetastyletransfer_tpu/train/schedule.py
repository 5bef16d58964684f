"""Learning-rate schedule matching the reference's warmup + stepped
exponential decay (reference: train_only_inner_loop.py:321-341).

- Warmup (iteration < warmup): linear ramp from 1% of base lr to base lr.
- After warmup: lr = base * (1 - rate)^((it - warmup) // decay_every),
  floored at `decay_until`. The reference only *touches* optimizer lr at
  modulo boundaries; because the exponent uses floor division the closed
  form here is identical between boundaries.

Implemented as an optax-compatible schedule (step -> lr) built from jnp ops
so it traces cleanly inside a jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig):
    base = cfg.inner_lr
    warmup = cfg.warmup_iterations
    rate = cfg.lr_decay_rate
    every = max(int(cfg.lr_decay_every), 1)
    floor = cfg.lr_decay_until

    if not cfg.use_lr_schedule:
        return lambda step: jnp.asarray(base, jnp.float32)

    def schedule(step):
        # The reference's iteration counter starts at 1 (tqdm over
        # range(1, max_iterations+1)); optax steps start at 0.
        it = jnp.asarray(step, jnp.float32) + 1.0
        warm_lr = base * ((it / jnp.maximum(warmup, 1)) * 0.99 + 0.01)
        n_decays = jnp.floor(jnp.maximum(it - warmup, 0.0) / every)
        decay_lr = jnp.maximum(base * (1.0 - rate) ** n_decays, floor)
        return jnp.where(it < warmup, warm_lr, decay_lr).astype(jnp.float32)

    return schedule
