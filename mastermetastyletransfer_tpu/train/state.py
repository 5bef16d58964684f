"""Train state: params + optimizer state + step as one pytree, plus the
parameter-freezing masks that replace the reference's requires_grad toggling
(reference: train.py:216-218, train_only_inner_loop.py:306-318).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import optax

from mastermetastyletransfer_tpu.config import ExperimentConfig, TrainConfig
from mastermetastyletransfer_tpu.train.schedule import make_lr_schedule


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    def apply_gradients(self, tx: optax.GradientTransformation, grads):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return TrainState(step=self.step + 1,
                          params=optax.apply_updates(self.params, updates),
                          opt_state=new_opt)


def trainable_labels(params: dict, cfg: TrainConfig) -> dict:
    """Label each top-level param group "train" or "freeze".

    - plain/meta modes: swin frozen unless cfg.freeze_encoder is False
      (reference: train.py:216-218 freezes swin; --unfreeze_swin exists).
    - fast_adaptation: everything frozen except the style transformer's
      *encoder* (reference: train_only_inner_loop.py:306-318).
    """
    def sub(tree, label):
        return jax.tree_util.tree_map(lambda _: label, tree)

    if cfg.mode == "fast_adaptation":
        return {
            "swin": sub(params["swin"], "freeze"),
            "decoder": sub(params["decoder"], "freeze"),
            "style_transformer": {
                "encoder": sub(params["style_transformer"]["encoder"], "train"),
                "decoder": sub(params["style_transformer"]["decoder"], "freeze"),
            },
        }
    swin_label = "freeze" if cfg.freeze_encoder else "train"
    return {
        "swin": sub(params["swin"], swin_label),
        "decoder": sub(params["decoder"], "train"),
        "style_transformer": sub(params["style_transformer"], "train"),
    }


def make_optimizer(params: dict, cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with the reference's lr schedule, masked so frozen groups get
    zero updates (the TPU-native analog of requires_grad=False)."""
    schedule = make_lr_schedule(cfg)
    adam = optax.adam(learning_rate=schedule)
    labels = trainable_labels(params, cfg)
    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()}, labels)


def create_train_state(params: dict, cfg: TrainConfig,
                       tx: Optional[optax.GradientTransformation] = None):
    if tx is None:
        tx = make_optimizer(params, cfg)
    import jax.numpy as jnp
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params)), tx
