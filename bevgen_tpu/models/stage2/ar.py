"""Autoregressive sampling & training objective for the sparse GPT.

Reference: cond_transformer_multi_view.py:155-227 (`sample` — token-by-
token decode in permuter order, full forward per token, top-k ->
softmax -> multinomial) and :277-347 (`shared_step` — CE with optional
bbox-weighted positions).

TPU-native: the whole decode is ONE `lax.scan` over num_img_tokens
steps with on-device categorical sampling — no host round-trips (the
reference crosses the python boundary every token).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry
from bevgen_tpu.models.stage2.gpt import SparseGPT


def bbox_token_weights(cfg: MultiViewConfig, bboxes, weight: float):
    """Per-token CE weights from 2-D boxes (cond_transformer:281-347):
    latent cells overlapping any box get `1 + weight`, others 1.

    bboxes: (b, cam, k, 4) pixel boxes (left, top, right, bottom) in
    cam_res coordinates. Returns (b, cam * hw) float32.
    """
    H, W = cfg.cam_res
    h, w = cfg.cam_latent_res
    cell_h, cell_w = H / h, W / w
    rows = (jnp.arange(h, dtype=jnp.float32) + 0.5) * cell_h   # cell centers
    cols = (jnp.arange(w, dtype=jnp.float32) + 0.5) * cell_w
    cy = rows.reshape(1, 1, h, 1, 1)
    cx = cols.reshape(1, 1, 1, w, 1)
    bb = jnp.asarray(bboxes, jnp.float32)                       # (b,cam,k,4)
    left, top = bb[..., 0], bb[..., 1]
    right, bottom = bb[..., 2], bb[..., 3]
    # inside[b,cam,h,w,k]
    inside = ((cx >= left[:, :, None, None, :]) &
              (cx <= right[:, :, None, None, :]) &
              (cy >= top[:, :, None, None, :]) &
              (cy <= bottom[:, :, None, None, :]))
    hit = inside.any(axis=-1)                                   # (b,cam,h,w)
    weights = 1.0 + weight * hit.astype(jnp.float32)
    b = bb.shape[0]
    return weights.reshape(b, -1)


def top_k_logits(logits, k: int):
    """Keep top-k logits, -inf elsewhere (cond_transformer:149-153)."""
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def ar_sample(model: SparseGPT, params, bev_indices, intrinsics_inv,
              extrinsics_inv, rng, temperature: float = 1.0,
              top_k: Optional[int] = None,
              init_ids: Optional[jnp.ndarray] = None):
    """Decode all camera tokens autoregressively in the outward order.

    bev_indices: (b, nc) int32. Returns (b, cam, h, w) int32.
    init_ids: optional (b, cam, hw) with vocab_size marking positions to
    generate (partial decoding, cond_transformer:501-513).
    """
    cfg = model.cfg
    b = bev_indices.shape[0]
    cam, hw = cfg.num_cams, cfg.num_cam_tokens
    N = cfg.num_img_tokens

    fwd, _ = geometry.decode_order(cfg)
    fwd_cam = jnp.asarray(fwd // hw, jnp.int32)
    fwd_pos = jnp.asarray(fwd % hw, jnp.int32)

    ids = jnp.full((b, cam, hw), cfg.vocab_size, jnp.int32)
    if init_ids is not None:
        ids = jnp.asarray(init_ids, jnp.int32)
    keep = None if init_ids is None else (ids != cfg.vocab_size)

    def body(carry, step):
        ids = carry
        t_rng = step["rng"]
        c_i, p_i = step["cam"], step["pos"]
        logits = model.apply(params, ids, bev_indices, intrinsics_inv,
                             extrinsics_inv, sampling=True)
        raw = c_i * hw + p_i
        l = logits[:, raw].astype(jnp.float32) / temperature
        if top_k is not None:
            l = top_k_logits(l, top_k)
        tok = jax.random.categorical(t_rng, l).astype(jnp.int32)   # (b,)
        if keep is not None:
            tok = jnp.where(keep[:, c_i, p_i], ids[:, c_i, p_i], tok)
        ids = ids.at[:, c_i, p_i].set(tok)
        return ids, None

    xs = {"rng": jax.random.split(rng, N),
          "cam": fwd_cam, "pos": fwd_pos}
    ids, _ = jax.lax.scan(body, ids, xs)
    h, w = cfg.cam_latent_res
    return ids.reshape(b, cam, h, w)


def ar_loss(model: SparseGPT, params, tokens, bev_indices, intrinsics_inv,
            extrinsics_inv, weights: Optional[jnp.ndarray] = None,
            rng=None, deterministic: bool = False):
    """Teacher-forced CE over all image tokens (cond_transformer:277-347).

    tokens: (b, cam, hw) ground truth. weights: optional per-token
    multiplier (bbox up-weighting), same shape flattened (b, cam*hw).
    """
    cfg = model.cfg
    b = tokens.shape[0]
    logits = model.apply(params, tokens, bev_indices, intrinsics_inv,
                         extrinsics_inv, sampling=False,
                         deterministic=deterministic,
                         rngs=({"dropout": rng} if rng is not None else {}))
    targets = tokens.reshape(b, -1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if weights is not None:
        return (nll * weights).sum() / targets.size
    return nll.mean()
