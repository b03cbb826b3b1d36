"""KV-cached incremental decoding for the AR sparse GPT.

The reference (and our parity `ar.ar_sample`) runs a FULL transformer
forward over all gpt_block_size positions for every generated token
(cond_transformer_multi_view.py:172-227 — O(L) forwards of an O(L)
model). This module decodes incrementally: prefill the BEV-condition
positions once, then each step runs ONE sequence position through all
layers against cached K/V — an O(L)-fold compute reduction the torch
implementation never had.

Pure-jnp re-implementation of SparseGPT's math operating directly on
its parameter tree (same tree as models/stage2/gpt.py — verified
equivalent by tests/test_ar_cached.py teacher-forced logit comparison).
Sparsity: during decode, a position attends cols <= s AND its per-head
block-layout row; the row masks are built from indices + a dynamic
layout-row gather — no (H, L, L) mask materialization.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry, masks

NEG_INF = -1e9


def _ln(p, x):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * p["norm"]["scale"]
            + p["norm"]["bias"]).astype(x.dtype)


def _dense(p, x):
    if "kernel_q" in p:
        # int8 weights, bf16 compute (ops/quant.quantize_gpt_tree): the
        # s8->bf16 convert fuses into the dot's operand read, halving
        # the HBM weight traffic that bounds per-token decode.
        out = (x @ p["kernel_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        out = x @ p["kernel"]
    if "bias" in p:
        out = out + p["bias"]
    return out


class ARStatic(NamedTuple):
    """Token-independent per-run tensors."""
    cond_emb: jnp.ndarray     # (b, nc, d) cond embeddings incl pos/bev
    pos_ray: jnp.ndarray      # (b, N, d) raw-order ray + positional embed
    layouts: jnp.ndarray      # (H, nb, nb) int32
    bias_rows: Optional[jnp.ndarray]  # (L, L) additive bias or None


def precompute_static(params: Dict, cfg: MultiViewConfig, bev_indices,
                      intrinsics_inv, extrinsics_inv) -> ARStatic:
    """Embeddings that don't depend on decoded tokens
    (gpt.py image/bev/pos embedding math)."""
    p = params["params"]
    d = cfg.num_embed
    b = bev_indices.shape[0]
    nc = cfg.num_cond_tokens

    c_embed = None
    ray = 0.0
    if cfg.image_embed:
        plane = jnp.asarray(geometry.image_plane(cfg).reshape(3, -1))
        I_inv = intrinsics_inv.astype(jnp.float32)
        E_inv = extrinsics_inv.astype(jnp.float32)
        pts = jnp.einsum("bcij,jn->bcin", I_inv, plane)
        pts = jnp.concatenate([pts, jnp.ones_like(pts[:, :, :1])], axis=2)
        dirs = jnp.einsum("bcij,bcjn->bcin", E_inv, pts)
        c = E_inv[..., -1]
        d_emb = dirs.transpose(0, 1, 3, 2) @ p["img_embed"]["kernel"]
        c_embed = c @ p["cam_embed"]["kernel"]                # (b,cam,d)
        r = d_emb - c_embed[:, :, None, :]
        r = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-7)
        ray = r.reshape(b, cfg.num_img_tokens, d)

    pos_ray = ray + p["x_pos_emb"][:, :cfg.num_img_tokens]

    cond = jnp.take(p["cond_tok_emb"]["embedding"], bev_indices, axis=0)
    if cfg.bev_embed:
        grid = jnp.asarray(geometry.get_bev_grid(cfg)[:2].reshape(2, -1).T)
        grid_embed = grid @ p["bev_embed"]["kernel"] + p["bev_embed"]["bias"]
        c_exp = c_embed[:, :, None, :] if c_embed is not None else 0.0
        bev_cam = jnp.sum(p["bev_cam_pos_emb"] + c_exp, axis=1)
        cond = cond + (grid_embed[None] - bev_cam)
    cond = cond + p["cond_pos_emb"]

    sm = masks.sparse_masks(cfg)
    bias_rows = None
    if cfg.camera_bias:
        L = cfg.gpt_block_size
        tril = jnp.asarray(np.tril(np.ones((L, L), np.float32)))
        bias_rows = (p["camera_bias_emb"] * tril +
                     jnp.asarray(masks.camera_bias_matrix(cfg)))
    return ARStatic(cond_emb=cond, pos_ray=pos_ray,
                    layouts=jnp.asarray(sm.layouts, jnp.int32),
                    bias_rows=bias_rows)


def _expand_layout_rows(layout_rows, block: int, L: int):
    """(H, nb) block row -> (H, L) token mask."""
    return jnp.repeat(layout_rows, block, axis=-1)[:, :L]


def prefill(params: Dict, cfg: MultiViewConfig, static: ARStatic):
    """Run the nc condition positions, returning K/V caches sized for
    the full sequence + the logits predicting decode step 0."""
    p = params["params"]
    b, nc, d = static.cond_emb.shape
    L = cfg.gpt_block_size
    H = cfg.num_heads
    dh = cfg.hidden_size // H
    block = cfg.sparse_block_size

    # cond-block mask: cond rows attend all cond cols AND their layout
    nbc = -(-nc // block)
    sub = static.layouts[:, :nbc, :nbc]                      # (H, nbc, nbc)
    mask_cc = jnp.kron(sub, jnp.ones((block, block), jnp.int32))[
        :, :nc, :nc] > 0                                     # (H, nc, nc)

    bias_cc = (static.bias_rows[:nc, :nc][None, None]
               if static.bias_rows is not None else 0.0)

    x = static.cond_emb
    k_cache = []
    v_cache = []
    scale = 1.0 / float(np.sqrt(dh))

    for i in range(cfg.num_layers):
        blk = p[f"block_{i}"]
        xn = _ln(blk["ln1"], x)
        q = _dense(blk["query"], xn).reshape(b, nc, H, dh).transpose(0, 2, 1, 3)
        k = _dense(blk["key"], xn).reshape(b, nc, H, dh).transpose(0, 2, 1, 3)
        v = _dense(blk["value"], xn).reshape(b, nc, H, dh).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32),
                       k.astype(jnp.float32))
        s = (s + bias_cc) * scale
        s = jnp.where(mask_cc[None], s, NEG_INF)
        probs = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bhij,bhjd->bhid", probs,
                          v.astype(jnp.float32)).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, nc, cfg.hidden_size)
        x = xn + attn
        x = x + _mlp(blk, x)
        pad = ((0, 0), (0, 0), (0, L - nc), (0, 0))
        k_cache.append(jnp.pad(k, pad))
        v_cache.append(jnp.pad(v, pad))

    last = _ln(p["ln_f"], x[:, -1])
    logits0 = _dense(p["head"], last)
    return tuple(k_cache), tuple(v_cache), logits0.astype(jnp.float32)


def _mlp(blk, x):
    h = _dense(blk["mlp_fc"], _ln(blk["ln2"], x))
    h = jax.nn.gelu(h, approximate=False)
    return _dense(blk["mlp_proj"], h)


def decode_step(params: Dict, cfg: MultiViewConfig, static: ARStatic,
                k_cache, v_cache, s, x_s):
    """One sequence position s (= nc + t) through all layers.
    x_s: (b, d) input embedding. Returns (logits (b, vocab), caches)."""
    p = params["params"]
    b, d = x_s.shape
    L = cfg.gpt_block_size
    H = cfg.num_heads
    dh = cfg.hidden_size // H
    block = cfg.sparse_block_size
    scale = 1.0 / float(np.sqrt(dh))

    col = jnp.arange(L)
    lay_rows = jax.lax.dynamic_index_in_dim(
        static.layouts, s // block, axis=1, keepdims=False)   # (H, nb)
    lay = _expand_layout_rows(lay_rows, block, L) > 0          # (H, L)
    mask_row = lay & (col[None, :] <= s)                       # (H, L)
    if static.bias_rows is not None:
        bias_row = jax.lax.dynamic_index_in_dim(
            static.bias_rows, s, axis=0, keepdims=False)       # (L,)
    else:
        bias_row = 0.0

    x = x_s[:, None, :]                                        # (b,1,d)
    for i in range(cfg.num_layers):
        blk = p[f"block_{i}"]
        xn = _ln(blk["ln1"], x)
        q = _dense(blk["query"], xn).reshape(b, 1, H, dh).transpose(0, 2, 1, 3)
        k = _dense(blk["key"], xn).reshape(b, H, dh)
        v = _dense(blk["value"], xn).reshape(b, H, dh)
        k_i = jax.lax.dynamic_update_slice(
            k_cache[i], k[:, :, None, :].astype(k_cache[i].dtype),
            (0, 0, s, 0))
        v_i = jax.lax.dynamic_update_slice(
            v_cache[i], v[:, :, None, :].astype(v_cache[i].dtype),
            (0, 0, s, 0))
        k_cache = k_cache[:i] + (k_i,) + k_cache[i + 1:]
        v_cache = v_cache[:i] + (v_i,) + v_cache[i + 1:]
        scores = jnp.einsum("bhd,bhjd->bhj", q[:, :, 0].astype(jnp.float32),
                            k_i.astype(jnp.float32))   # (b,H,L)
        scores = (scores + bias_row) * scale
        scores = jnp.where(mask_row[None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhj,bhjd->bhd", probs,
                          v_i.astype(jnp.float32)).astype(x.dtype)
        attn = attn.reshape(b, 1, cfg.hidden_size)
        x = xn + attn
        x = x + _mlp(blk, x)

    out = _ln(p["ln_f"], x[:, 0])
    logits = _dense(p["head"], out)
    return logits.astype(jnp.float32), k_cache, v_cache


def token_embedding(params: Dict, cfg: MultiViewConfig, static: ARStatic,
                    token, raw_pos):
    """Input embedding of `token` at raw position raw_pos (b,) tokens."""
    p = params["params"]
    emb = jnp.take(p["x_tok_emb"]["embedding"], token, axis=0)   # (b, d)
    return emb + jax.lax.dynamic_index_in_dim(
        static.pos_ray, raw_pos, axis=1, keepdims=False)


def ar_sample_cached(model, params, bev_indices, intrinsics_inv,
                     extrinsics_inv, rng, temperature: float = 1.0,
                     top_k: Optional[int] = None,
                     init_ids: Optional[jnp.ndarray] = None):
    """Drop-in fast replacement for ar.ar_sample (same argument and
    rng-splitting structure; `model` provides cfg)."""
    from bevgen_tpu.models.stage2.ar import top_k_logits
    cfg: MultiViewConfig = model.cfg
    b = bev_indices.shape[0]
    cam, hw = cfg.num_cams, cfg.num_cam_tokens
    N = cfg.num_img_tokens
    nc = cfg.num_cond_tokens

    fwd, _ = geometry.decode_order(cfg)
    fwd_cam = jnp.asarray(fwd // hw, jnp.int32)
    fwd_pos = jnp.asarray(fwd % hw, jnp.int32)
    fwd_raw = jnp.asarray(fwd, jnp.int32)

    static = precompute_static(params, cfg, bev_indices, intrinsics_inv,
                               extrinsics_inv)
    k_cache, v_cache, logits0 = prefill(params, cfg, static)

    ids = jnp.full((b, cam, hw), cfg.vocab_size, jnp.int32)
    if init_ids is not None:
        ids = jnp.asarray(init_ids, jnp.int32)
    keep = None if init_ids is None else (ids != cfg.vocab_size)

    def sample_from(logits, key):
        l = logits / temperature
        if top_k is not None:
            l = top_k_logits(l, top_k)
        return jax.random.categorical(key, l).astype(jnp.int32)

    def body(carry, step):
        ids, k_cache, v_cache, logits = carry
        t, key = step["t"], step["rng"]
        c_i = step["cam"]
        p_i = step["pos"]
        tok = sample_from(logits, key)
        if keep is not None:
            tok = jnp.where(keep[:, c_i, p_i], ids[:, c_i, p_i], tok)
        ids = ids.at[:, c_i, p_i].set(tok)
        x_s = token_embedding(params, cfg, static, tok, step["raw"])
        logits, k_cache, v_cache = decode_step(
            params, cfg, static, k_cache, v_cache, nc + t, x_s)
        return (ids, k_cache, v_cache, logits), None

    xs = {"t": jnp.arange(N, dtype=jnp.int32),
          "rng": jax.random.split(rng, N),
          "cam": fwd_cam, "pos": fwd_pos, "raw": fwd_raw}
    (ids, _, _, _), _ = jax.lax.scan(
        body, (ids, k_cache, v_cache, logits0), xs)
    h, w = cfg.cam_latent_res
    return ids.reshape(b, cam, h, w)


def teacher_forced_logits(model, params, tokens, bev_indices,
                          intrinsics_inv, extrinsics_inv):
    """Cached-path logits for every decode step given ground-truth
    tokens — used to verify equivalence with the full forward."""
    cfg: MultiViewConfig = model.cfg
    b = tokens.shape[0]
    N = cfg.num_img_tokens
    nc = cfg.num_cond_tokens
    fwd, _ = geometry.decode_order(cfg)
    hw = cfg.num_cam_tokens

    static = precompute_static(params, cfg, bev_indices, intrinsics_inv,
                               extrinsics_inv)
    k_cache, v_cache, logits0 = prefill(params, cfg, static)
    flat = tokens.reshape(b, -1)

    def body(carry, step):
        k_cache, v_cache, logits = carry
        raw = step["raw"]
        tok = flat[:, raw]
        x_s = token_embedding(params, cfg, static, tok, raw)
        new_logits, k_cache, v_cache = decode_step(
            params, cfg, static, k_cache, v_cache, nc + step["t"], x_s)
        return (k_cache, v_cache, new_logits), logits

    xs = {"t": jnp.arange(N, dtype=jnp.int32),
          "raw": jnp.asarray(fwd, jnp.int32)}
    _, all_logits = jax.lax.scan(body, (k_cache, v_cache, logits0), xs)
    # all_logits[t] predicts decode step t -> scatter back to raw order
    out = jnp.zeros((b, N, all_logits.shape[-1]), jnp.float32)
    out = out.at[:, jnp.asarray(fwd, jnp.int32)].set(
        all_logits.transpose(1, 0, 2))
    return out
