"""Optimization: AdamW with minGPT-style decay partition, warmup-cosine
LR, EMA — as optax transforms.

Reference equivalents:
  decay/no-decay split  <- cond_transformer_multi_view.py:402-477
  warmup-cosine         <- utils/scheduler.py:3 (LambdaWarmUpCosineScheduler)
  EMA                   <- modules/stage2/ema.py (NVIDIA callback); here a
                           pure pytree transform — swap/offload machinery
                           is unnecessary in a functional framework.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# decay mask
# ---------------------------------------------------------------------------

_NO_DECAY_TOKENS = ("bias", "embedding", "scale", "norm", "q_scale", "k_scale",
                    "null_kv", "pos_emb", "camera_bias_emb", "bev_cam_pos_emb",
                    "codebook")

# the reference partition whitelists torch.nn.Linear ONLY — its Conv2d
# geometric embeds (img_embed/cam_embed/bev_embed) fall in neither set
# and land in the wd=0.0 group (cond_transformer_multi_view.py:413,
# 443-444), so their kernels must NOT be decayed here either
_NO_DECAY_MODULES = ("img_embed", "cam_embed", "bev_embed")


def decay_mask(params) -> Any:
    """True where weight decay applies: Linear kernels only — biases,
    norms, embeddings, the learned bias/scale tables AND the conv-based
    geometric embeds are excluded (minGPT partition,
    cond_transformer_multi_view.py:402-455)."""
    def is_decay(path, leaf):
        parts = [str(getattr(k, "key", k)).lower() for k in path]
        name = parts[-1] if parts else ""
        if any(p in _NO_DECAY_MODULES for p in parts):
            return False
        if name == "kernel":
            return True
        return not any(t in p for p in parts for t in _NO_DECAY_TOKENS)
    return jax.tree_util.tree_map_with_path(is_decay, params)


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  min_lr: float = 0.0):
    """Linear warmup then cosine decay to min_lr (utils/scheduler.py:3)."""
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * jnp.minimum(step / warmup_steps, 1.0)
        t = jnp.clip((step - warmup_steps) /
                     jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)
    return schedule


# ---------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------


def maskgit_optimizer(base_lr: float, warmup_steps: int = 500,
                      total_steps: int = 300_000, weight_decay: float = 0.01,
                      b1: float = 0.9, b2: float = 0.95,
                      grad_clip: Optional[float] = 1.0,
                      accumulate_steps: int = 1,
                      params_example=None) -> optax.GradientTransformation:
    """Stage-2 optimizer: AdamW(0.9, 0.95) + decay partition + warmup-cosine.

    accumulate_steps > 1 averages gradients over k micro-batches before
    each update (the reference's `trainer.accumulate_grad_batches`,
    generate.py:58 LR-scale factor) via optax.MultiSteps — the schedule
    still counts UPDATES, matching Lightning's accumulation semantics.
    """
    sched = warmup_cosine(base_lr, warmup_steps, total_steps)
    mask = decay_mask(params_example) if params_example is not None else None
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2))
    if mask is not None:
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    chain.append(optax.scale_by_schedule(lambda s: -sched(s)))
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def scaled_lr(base_lr: float, batch_size: int, num_devices: int = 1,
              accumulate_steps: int = 1) -> float:
    """The reference's LR-scaling rule:
    accumulate x devices x batch x base_lr (generate.py:58).

    The reference's `batch` is PER-DEVICE (Lightning DDP), hence the
    device factor. Pass num_devices=1 when batch_size is already the
    global batch (our sharded training loop)."""
    return base_lr * batch_size * num_devices * accumulate_steps


def vqgan_optimizer(lr: float) -> optax.GradientTransformation:
    """Stage-1 optimizer: Adam(0.5, 0.9) (vqgan.py:162-172)."""
    return optax.adam(lr, b1=0.5, b2=0.9)


# ---------------------------------------------------------------------------
# EMA
# ---------------------------------------------------------------------------


class EmaState(NamedTuple):
    params: Any
    count: jnp.ndarray


def ema_init(params) -> EmaState:
    return EmaState(params=jax.tree_util.tree_map(jnp.asarray, params),
                    count=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999,
               warmup: bool = False) -> EmaState:
    """In-graph EMA (ema.py:148-151's functional core: fixed-decay
    `ema = ema*decay + (1-decay)*current`, matching the executed
    reference). `warmup=True` opts into a count-based decay ramp
    (min(decay, (1+t)/(10+t)), the ema-pytorch convention) — NOT what
    the reference does; off by default for checkpoint-trajectory
    parity."""
    d = decay
    if warmup:
        d = jnp.minimum(decay, (1.0 + state.count) / (10.0 + state.count))
    new = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1 - d), state.params, params)
    return EmaState(params=new, count=state.count + 1)
