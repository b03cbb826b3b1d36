"""Autoregressive sparse GPT over the multi-camera token sequence.

TPU-native equivalent of the reference minGPT-derived sparse transformer
(modules/transformer/mingpt_sparse.py:267-391): tokens are permuted into
the cross-camera "outward" decode order, run through pre-LN blocks whose
self-attention uses the per-head block-sparse layouts + mul-mask (and
optionally the learned camera bias), and logits are un-permuted back.

Architecture quirks reproduced for checkpoint fidelity:
  * the attention has NO output projection — q/k/v Linears only, heads
    reconcatenated raw (CustomSparseSelfAttention, mingpt_sparse.py:157);
  * Block's first residual adds onto the LayerNormed input, not the raw
    input (``x = ln1(x); x = x + attn`` — mingpt_sparse.py:240-253);
  * when not sampling, the last token of the last camera is replaced by
    the extra vocab_size id before embedding (mingpt_sparse.py:328-329);
  * the final sequence is padded to gpt_block_size with embeddings of
    the vocab_size id (mingpt_sparse.py:368-373);
  * camera bias is added to RAW attention scores (scaled with them).

Attention runs through bevgen_tpu.ops.attention (Pallas tile-skipping
kernel on TPU, dense XLA fallback elsewhere).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry, masks
from bevgen_tpu.ops.attention import make_sparse_attention

Dtype = Any


class TorchLayerNorm(nn.Module):
    """Standard LN with scale+bias, eps 1e-5 (torch nn.LayerNorm)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="norm")(x)


class SparseGPTBlock(nn.Module):
    cfg: MultiViewConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, attn_fn, deterministic: bool = True):
        cfg = self.cfg
        d = cfg.num_embed
        h = cfg.num_heads
        dh = cfg.hidden_size // h
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)

        xn = TorchLayerNorm(self.dtype, name="ln1")(x)
        b, L, _ = xn.shape
        q = dense(cfg.hidden_size, "query")(xn).reshape(b, L, h, dh)
        k = dense(cfg.hidden_size, "key")(xn).reshape(b, L, h, dh)
        v = dense(cfg.hidden_size, "value")(xn).reshape(b, L, h, dh)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = attn_fn(q, k, v, bias)                      # (b, h, L, dh)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, L, cfg.hidden_size)

        # reference quirk: residual off the NORMALIZED input
        x = xn + attn.astype(self.dtype)
        mlp_in = TorchLayerNorm(self.dtype, name="ln2")(x)
        mh = dense(4 * d, "mlp_fc")(mlp_in)
        mh = jax.nn.gelu(mh, approximate=False)
        mh = dense(d, "mlp_proj")(mh)
        if cfg.resid_pdrop > 0:
            mh = nn.Dropout(cfg.resid_pdrop)(mh, deterministic=deterministic)
        return x + mh


class SparseGPT(nn.Module):
    """The full AR model (mingpt_sparse.py:267 `GPT`)."""
    cfg: MultiViewConfig
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, cam_indices, bev_indices, intrinsics_inv,
                 extrinsics_inv, sampling: bool = False,
                 deterministic: bool = True):
        """cam_indices (b, cam, hw) int32, bev_indices (b, nc) int32 ->
        logits (b, num_img_tokens, vocab) in RAW (cam, h, w) order."""
        cfg = self.cfg
        b, cam, hw = cam_indices.shape
        d = cfg.num_embed
        nc = cfg.num_cond_tokens
        L = cfg.gpt_block_size

        emb = lambda n, name: nn.Embed(n, d, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        tok_emb = emb(cfg.vocab_size + 1, "x_tok_emb")

        if not sampling:
            cam_indices = cam_indices.at[:, -1, -1].set(cfg.vocab_size)

        x = tok_emb(cam_indices)                           # (b,cam,hw,d)

        c_embed = None
        if cfg.image_embed:
            plane = jnp.asarray(geometry.image_plane(cfg).reshape(3, -1))
            I_inv = intrinsics_inv.astype(jnp.float32)
            E_inv = extrinsics_inv.astype(jnp.float32)
            pts = jnp.einsum("bcij,jn->bcin", I_inv, plane)
            pts = jnp.concatenate([pts, jnp.ones_like(pts[:, :, :1])], axis=2)
            dirs = jnp.einsum("bcij,bcjn->bcin", E_inv, pts)
            c = E_inv[..., -1]
            img_dense = nn.Dense(d, use_bias=False, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="img_embed")
            cam_dense = nn.Dense(d, use_bias=False, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="cam_embed")
            d_emb = img_dense(dirs.transpose(0, 1, 3, 2).astype(self.dtype))
            c_embed = cam_dense(c.astype(self.dtype))
            ray = (d_emb - c_embed[:, :, None, :]).astype(jnp.float32)
            ray = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True) + 1e-7)
            x = x + ray.astype(self.dtype)

        cond = emb(cfg.cond_vocab_size, "cond_tok_emb")(bev_indices)
        if cfg.bev_embed:
            bev_grid = jnp.asarray(geometry.get_bev_grid(cfg)[:2].reshape(2, -1).T)
            grid_embed = nn.Dense(d, use_bias=True, dtype=self.dtype,
                                  param_dtype=jnp.float32, name="bev_embed")(
                                      bev_grid.astype(self.dtype))
            bev_cam_pos = self.param("bev_cam_pos_emb", nn.initializers.zeros,
                                     (1, cfg.num_cams, nc, d), jnp.float32)
            c_exp = c_embed[:, :, None, :] if c_embed is not None else 0.0
            bev_cam = jnp.sum(bev_cam_pos.astype(self.dtype) + c_exp, axis=1)
            cond = cond + (grid_embed[None] - bev_cam)

        x = x.reshape(b, cam * hw, d)
        x_pos = self.param("x_pos_emb", nn.initializers.zeros,
                           (1, cfg.num_img_tokens, d), jnp.float32)
        cond_pos = self.param("cond_pos_emb", nn.initializers.zeros,
                              (1, nc, d), jnp.float32)
        x = x + x_pos.astype(self.dtype)[:, :x.shape[1]]
        cond = cond + cond_pos.astype(self.dtype)

        fwd, _ = geometry.decode_order(cfg)
        x = x[:, jnp.asarray(fwd)]                         # decode order
        seq = jnp.concatenate([cond, x], axis=1)

        pad_len = L - seq.shape[1]
        if pad_len > 0:
            pad_ids = jnp.full((b, pad_len), cfg.vocab_size, jnp.int32)
            seq = jnp.concatenate([seq, tok_emb(pad_ids)], axis=1)

        bias = None
        if cfg.camera_bias:
            # full-matrix param + static tril mask (see transformer.py —
            # avoids a huge per-forward scatter)
            bias_full = self.param("camera_bias_emb", nn.initializers.zeros,
                                   (L, L), jnp.float32)
            tril_mask = jnp.asarray(np.tril(np.ones((L, L), np.float32)))
            bias = bias_full * tril_mask
            bias = bias + jnp.asarray(masks.camera_bias_matrix(cfg))

        sm = masks.sparse_masks(cfg)
        attn_fn = make_sparse_attention(sm.layouts, sm.allowed,
                                        block=cfg.sparse_block_size,
                                        use_pallas=self.use_pallas,
                                        num_cond_tokens=nc,
                                        num_pad_tokens=cfg.num_pad_tokens)

        if cfg.embd_pdrop > 0:
            seq = nn.Dropout(cfg.embd_pdrop)(seq, deterministic=deterministic)
        for i in range(cfg.num_layers):
            seq = SparseGPTBlock(cfg, self.dtype, name=f"block_{i}")(
                seq, bias, attn_fn, deterministic)
        seq = TorchLayerNorm(self.dtype, name="ln_f")(seq)
        logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name="head")(seq)
        logits = logits[:, : (L - pad_len) if pad_len else L]
        # logits at position p predict token p+1 (AR shift)
        ret = logits[:, nc - 1:-1]
        _, bwd = geometry.decode_order(cfg)
        return ret[:, jnp.asarray(bwd)]
