"""Jitted train steps: plain single-loop training and the Reptile-style meta
step, both as pure functions over (state, batch, rng).

Reference semantics covered:
- random layer count k in [1, max_layers] per step (train.py:448,
  train_only_inner_loop.py:519) via a traced k; the dispatch is
  StyleTransformerConfig.traced_k_impl — a masked lax.scan by default (the
  lax.switch variant runs only the sampled depth but its reverse-mode graph
  crashes this platform's XLA TPU compiler; see models/style_transformer.py).
- the 4 ImageNet-normalization flag combinations
  (train_only_inner_loop.py:494-575).
- Reptile meta loop (train.py:316-563): clone theta->omega, inner Adam steps
  on omega, outer update theta += outer_lr * (omega - theta). The reference's
  loss/backward sits *outside* its inner loop and is unreachable under
  default flags (SURVEY.md 3.2); this implements the intended algorithm —
  a real loss/step per inner iteration.

Data parallelism: pass a Mesh and the returned step is jitted with the batch
sharded over the "data" axis and params replicated — XLA inserts the gradient
all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mastermetastyletransfer_tpu.config import DataConfig, ExperimentConfig
from mastermetastyletransfer_tpu.losses.loss import perceptual_loss
from mastermetastyletransfer_tpu.models.master import imagenet_normalize, master_apply
from mastermetastyletransfer_tpu.train.state import TrainState, trainable_labels


def prepare_batch_for_model(content: jnp.ndarray, style: jnp.ndarray,
                            data_cfg: DataConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inputs the *model* sees: ImageNet-normalized iff the swin flag is on
    (reference: train_only_inner_loop.py:494-517)."""
    if data_cfg.use_imagenet_normalization_for_swin:
        return imagenet_normalize(content), imagenet_normalize(style)
    return content, style


def _loss_views(content: jnp.ndarray, style: jnp.ndarray, output: jnp.ndarray,
                data_cfg: DataConfig):
    """Inputs the *loss* sees: all three normalized iff the loss flag is on
    (reference: train_only_inner_loop.py:529-575 — the 4 flag combos reduce
    to exactly this)."""
    if data_cfg.use_imagenet_normalization_for_loss:
        return (imagenet_normalize(content), imagenet_normalize(style),
                imagenet_normalize(output))
    return content, style, output


def _make_loss_and_grad(cfg: ExperimentConfig, vgg_params):
    vgg = jax.tree_util.tree_map(jax.lax.stop_gradient, vgg_params)
    max_k = cfg.train.max_layers
    # Kernel policy under grad: the fused ATTENTION kernels are forward-only
    # and auto-fall back to the XLA chain when deterministic=False
    # (ops/attention.py:_pallas_ok); the fused LN+MLP+residual kernel has a
    # custom VJP (ops/pallas_mlp_vjp.py) and trains as-is.

    def forward(params, mc, ms, k, rng):
        return master_apply(params, mc, ms, cfg.model, k=k, max_k=max_k,
                            deterministic=False, rng=rng)

    if cfg.train.remat:
        # rematerialize the model forward in the backward pass: ~1/3 extra
        # FLOPs for a far smaller activation footprint (static args stay
        # static; k/rng are traced operands)
        forward = jax.checkpoint(forward, static_argnums=())

    def loss_fn(params, content, style, k, rng):
        mc, ms = prepare_batch_for_model(content, style, cfg.data)
        out = forward(params, mc, ms, k, rng)
        lc, ls, lo = _loss_views(content, style, out, cfg.data)
        losses = perceptual_loss(vgg, lc, ls, lo, cfg.loss,
                                 lambda_value=cfg.train.lambda_style)
        return losses["total"], losses

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    accum = max(int(cfg.train.grad_accum_steps), 1)
    if accum == 1:
        return grad_fn

    def accum_grad_fn(params, content, style, k, rng):
        """Sequential micro-batches, grads averaged (batch size must divide
        by grad_accum_steps; the loss is a mean so averaging is exact)."""
        b = content.shape[0]
        assert b % accum == 0, (b, accum)
        mb = b // accum
        c_mb = content.reshape((accum, mb) + content.shape[1:])
        s_mb = style.reshape((accum, mb) + style.shape[1:])
        rngs = jax.random.split(rng, accum)

        def body(carry, xs):
            g_acc, m_acc = carry
            c, s, r = xs
            (_, metrics), grads = grad_fn(params, c, s, k, r)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            m_acc = jax.tree_util.tree_map(jnp.add, m_acc, metrics)
            return (g_acc, m_acc), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
        zero = jnp.zeros((), jnp.float32)
        zero_m = {"content": zero, "style": zero, "total": zero}
        (g, m), _ = jax.lax.scan(body, (zero_g, zero_m), (c_mb, s_mb, rngs))
        g = jax.tree_util.tree_map(lambda x: x / accum, g)
        m = jax.tree_util.tree_map(lambda x: x / accum, m)
        return (m["total"], m), g

    return accum_grad_fn


def _sample_k(rng, max_layers: int):
    """Random k in [1, max_layers], matching random.randint(1, max_layers)
    (inclusive both ends; reference: train.py:448)."""
    return jax.random.randint(rng, (), 1, max_layers + 1)


def make_train_step(cfg: ExperimentConfig, vgg_params,
                    tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None):
    """Plain training step (train_only_inner_loop.py:389-614, incl. the
    fast-adaptation mode — freezing is baked into `tx` via trainable_labels).

    Returns jitted (state, content, style, rng) -> (state, metrics).
    `content`/`style`: NHWC float32 in [0,1], batch-leading; `style` already
    repeated to the content batch size (reference: train.py:411-416).
    """
    grad_fn = _make_loss_and_grad(cfg, vgg_params)

    def step(state: TrainState, content, style, rng):
        rng = jax.random.fold_in(rng, state.step)
        rng_k, rng_model = jax.random.split(rng)
        k = _sample_k(rng_k, cfg.train.max_layers)
        (_, metrics), grads = grad_fn(state.params, content, style, k, rng_model)
        new_state = state.apply_gradients(tx, grads)
        metrics = dict(metrics, k=k)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    batch_s = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(rep, batch_s, batch_s, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def _interp(theta, omega, labels, eta):
    """theta += eta * (omega - theta) on trainable leaves only
    (reference: train.py:524-534)."""
    def leaf(t, o, lbl):
        return t + eta * (o - t) if lbl == "train" else t
    return jax.tree_util.tree_map(leaf, theta, omega, labels)


def make_meta_train_step(cfg: ExperimentConfig, vgg_params,
                         inner_tx: optax.GradientTransformation,
                         mesh: Optional[Mesh] = None):
    """Reptile meta step (train.py:316-563, intended behavior — see module
    docstring).

    One call = one task: `contents` is (num_inner_updates, B, H, W, C) — a
    content batch per inner step — and `style` is one style image repeated to
    batch size B. The inner optimizer state persists across tasks inside
    TrainState.opt_state, matching the reference's single Adam over omega
    (train.py:392-398).

    Returns jitted (state, contents, style, rng) -> (state, metrics-of-last-
    inner-step). state.params are theta; omega lives only inside the step.
    """
    grad_fn = _make_loss_and_grad(cfg, vgg_params)
    eta = cfg.train.outer_lr

    def step(state: TrainState, contents, style, rng):
        rng = jax.random.fold_in(rng, state.step)
        theta = state.params
        labels = trainable_labels(theta, cfg.train)

        def inner(carry, xs):
            omega, opt_state = carry
            content, r = xs
            r_k, r_model = jax.random.split(r)
            k = _sample_k(r_k, cfg.train.max_layers)
            (_, metrics), grads = grad_fn(omega, content, style, k, r_model)
            updates, opt_state = inner_tx.update(grads, opt_state, omega)
            omega = optax.apply_updates(omega, updates)
            return (omega, opt_state), metrics

        rngs = jax.random.split(rng, cfg.train.num_inner_updates)
        (omega, opt_state), metrics = jax.lax.scan(
            inner, (theta, state.opt_state), (contents, rngs))
        theta = _interp(theta, omega, labels, eta)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return TrainState(step=state.step + 1, params=theta,
                          opt_state=opt_state), last

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    # contents has a leading inner-steps dim; shard the batch dim (axis 1).
    inner_batch_s = NamedSharding(mesh, P(None, "data"))
    batch_s = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(rep, inner_batch_s, batch_s, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
