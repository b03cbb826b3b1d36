"""Stage-2 multi-view MaskGIT transformer, TPU-native.

Functional re-design of the reference `TransformerMultiView`
(modules/stage2/muse_maskgit_pytorch.py:204-384):

  * per-layer: cosine-similarity self-attention over the multi-camera
    image-token sequence (+ camera-bias additive logits), cross-attention
    to the BEV condition tokens, GEGLU feed-forward;
  * geometric embeddings: per-token camera-ray embedding (intrinsics/
    extrinsics), BEV metric-grid embedding on condition tokens;
  * per-sample `cond_keep` flag that drops the BEV context down to the
    learned null key/value — the real-CFG path (MuseConfig.real_cfg)
    batches the cond/null pair into ONE forward at 2x batch instead of
    two sequential forwards. (The reference's own inference CFG is a
    training-gated no-op — see models/stage2/maskgit.cfg_logits — so
    the faithful serving default never takes this path.)

Numerics notes (checkpoint fidelity):
  * attention: q,k are l2-normalized then scaled by learned per-dim
    q_scale/k_scale; logits multiplied by the fixed scale 8
    (muse_maskgit_pytorch.py:132-148 — its pre-l2norm ``q * 8`` is a
    numerical no-op and is dropped);
  * a learned null K/V column is prepended to every attention's keys;
  * LayerNorms are scale-only (beta is a zero buffer upstream), eps 1e-5;
  * the camera bias = learned lower-triangular table + the static
    angular-similarity prior (masks.camera_bias_matrix), sliced
    [img,img] for self-attention and [img,cond] for cross-attention.

Everything is fp32-param / `dtype`-compute; softmax and l2norm run fp32.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry, masks

Dtype = Any

NEG_INF = -0.7 * float(np.finfo(np.float32).max)


def _make_dense(quant: str, dtype):
    """Dense-layer factory for the hot matmuls: nn.Dense, or the W8A8
    int8 path (ops/quant.py) when the config requests it.

    `static` marks layers whose input is a scale-only-LayerNorm output:
    the int8 path then uses per-channel STATIC activation scales folded
    from the LN gamma (no per-row amax reduce — ops/quant.py). Must
    agree with quantize_dense_tree's structural rules."""
    if quant == "int8":
        from bevgen_tpu.ops.quant import QuantDense

        return lambda f, name, static=False: QuantDense(
            f, dtype=dtype, static_input=static, name=name)
    return lambda f, name, static=False: nn.Dense(
        f, use_bias=False, dtype=dtype, param_dtype=jnp.float32, name=name)


class _ScaleParam(nn.Module):
    """The LayerNorm gamma, at the same param path as nn.LayerNorm
    ('<name>/scale') so checkpoints are layout-identical across the
    fused/XLA paths."""
    dim: int

    @nn.compact
    def __call__(self):
        return self.param("scale", nn.initializers.ones, (self.dim,),
                          jnp.float32)


class LayerNormG(nn.Module):
    """Scale-only LayerNorm, eps 1e-5 (muse_maskgit_pytorch.py:62-69).

    A single-pass STANDALONE Pallas LN kernel exists
    (ops/pallas/layernorm.py) but is NOT wired by default: MEASURED
    SLOWER end-to-end (8.59 vs 9.2 img/s batch-2 flagship) — a
    standalone LN kernel forfeits XLA's fusion of the norm into the
    neighboring residual-add/matmul epilogues. use_fused=True opts in
    for experiments.

    `residual`: the round-4 FUSED path — returns
    (x_new = dtype(x + residual), LN(x_new) * gamma) from ONE Pallas
    pass (ops/pallas/fused_glue.py), removing the separate residual
    round-trip and the LN-stats read pass (the single biggest
    elementwise bucket in the b16 device budget). Falls back to plain
    XLA ops off-TPU; checkpoints are layout-identical either way."""
    dtype: Dtype = jnp.float32
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            from bevgen_tpu.ops.pallas.fused_glue import (
                make_residual_layernorm)
            scale = _ScaleParam(x.shape[-1], name="norm")()
            xd = x.astype(self.dtype)
            return make_residual_layernorm(self.use_fused)(
                xd, residual.astype(self.dtype), scale)
        use_fused = self.use_fused if self.use_fused is not None else False
        if use_fused and x.ndim >= 2 and x.shape[-2] >= 8:
            from bevgen_tpu.ops.pallas.layernorm import make_layernorm
            scale = _ScaleParam(x.shape[-1], name="norm")()
            return make_layernorm(eps=1e-5)(x, scale)
        return nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=True,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="norm")(x)


def l2norm(t, eps=1e-12):
    n = jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True)
    return (t.astype(jnp.float32) / jnp.maximum(n, eps))


class CosineAttention(nn.Module):
    """Cosine-sim attention with null-KV and optional additive bias
    (muse_maskgit_pytorch.py:90-169).

    On TPU the softmax(qk*scale + bias)v core runs through the fused
    Pallas kernel (ops/pallas/fused_attention.py) — the shared camera
    bias is read once per q-tile instead of materializing (B,H,N,M)
    fp32 scores in HBM. use_fused=None auto-selects by backend."""
    dim: int
    dim_head: int = 64
    heads: int = 8
    scale: float = 8.0
    dtype: Dtype = jnp.float32
    use_fused: Optional[bool] = None
    quant: str = "none"
    # jax.sharding.Mesh for multi-chip SPMD: the attention core (incl.
    # the Pallas kernel, which has no GSPMD partitioning rule) runs
    # inside shard_map — batch over dp, heads over tp, per-shard local
    # shapes. None = plain single-program path.
    mesh: Any = None

    def _attention_core(self, q, k, v, null_kv, q_scale, k_scale,
                        attn_bias, keep, k_prenormed: bool = False):
        """softmax(cos(q,k)*scale + bias) v with null-KV/CFG semantics.

        q: (b, h, n, dh); k, v: (b, h, m, dh) WITHOUT the null column;
        keep: (b,) bool/int CFG flag or None; attn_bias: (n, m) or None.
        k_prenormed: k is already l2-normalized and k_scale-d (decode
        cache). Dispatches the fused Pallas kernel on TPU, dense XLA
        elsewhere — per shard when wrapped in shard_map (local shapes)."""
        b, h = q.shape[0], q.shape[1]
        use_fused = (self.use_fused if self.use_fused is not None
                     else jax.default_backend() == "tpu")
        if use_fused:
            # the kernel runs the whole prologue (fp32 l2norm + learned
            # scales + null-KV fold-in) in VMEM and keeps the null
            # column visible to dropped-cond rows —
            # ops/pallas/fused_attention.py
            from bevgen_tpu.ops.pallas.fused_attention import (
                make_cosine_attention)
            fused = make_cosine_attention(sm_scale=self.scale,
                                          k_prenormed=k_prenormed)
            out = fused(q, k, v.astype(self.dtype), null_kv, q_scale,
                        k_scale, attn_bias, keep)
        else:
            dh = q.shape[-1]
            nk = jnp.broadcast_to(null_kv[0][None],
                                  (b, h, 1, dh)).astype(q.dtype)
            nv = jnp.broadcast_to(null_kv[1][None],
                                  (b, h, 1, dh)).astype(q.dtype)
            # l2norm + learned scales in fp32, then back to the compute
            # dtype so the MXU runs the similarity matmul at bf16 rate
            # (values are unit-norm — well inside bf16 range)
            qf = (l2norm(q) * q_scale).astype(self.dtype)
            if k_prenormed:
                nkf = (l2norm(nk) * k_scale).astype(self.dtype)
                kf = jnp.concatenate([nkf, k.astype(self.dtype)], axis=2)
            else:
                kf = (l2norm(jnp.concatenate([nk, k], axis=2))
                      * k_scale).astype(self.dtype)
            v = jnp.concatenate([nv, v], axis=2)
            # null-kv-padded shared bias (muse_maskgit_pytorch.py:155)
            bias = (jnp.pad(attn_bias.astype(jnp.float32), ((0, 0), (1, 0)))
                    if attn_bias is not None else None)
            sim = jnp.einsum("bhid,bhjd->bhij", qf, kf,
                             preferred_element_type=jnp.float32) * self.scale
            if bias is not None:
                sim = sim + bias[None, None]
            if keep is not None:
                # dropped-cond rows see only the null column 0
                col = jnp.arange(sim.shape[-1])
                valid = (keep[:, None] > 0) | (col[None] == 0)
                sim = jnp.where(valid[:, None, None, :], sim, NEG_INF)
            attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(self.dtype),
                             preferred_element_type=jnp.float32)
        return out.astype(self.dtype)

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, attn_bias=None,
                 cached_kv=None, precompute_kv: bool = False,
                 residual_delta=None, return_residual: bool = False):
        """residual_delta/return_residual: the fused-glue calling
        convention — x is the PRE-residual stream and residual_delta
        the previous op's output; the module folds the residual add
        into its LayerNorm (one Pallas pass, LayerNormG residual=) and
        returns (x_new, attn_out) so the caller chains deltas without
        ever materializing a separate residual op."""
        h, dh = self.heads, self.dim_head
        inner = h * dh
        dense = _make_dense(self.quant, self.dtype)

        if precompute_kv:
            # decode-cache build: `x` is the (step-invariant) context.
            # Returns (kf, v) in (b, h, m, dh) with K already
            # l2-normalized * k_scale (bf16) so every decode step skips
            # the kv projection, the head transpose AND the K norm.
            b, m = x.shape[0], x.shape[1]
            kv = dense(inner * 2, "to_kv", static=False)(x)
            kvt = kv.reshape(b, m, 2, h, dh).transpose(2, 0, 3, 1, 4)
            k, v = kvt[0], kvt[1]
            k_scale = self.param("k_scale", nn.initializers.ones, (dh,),
                                 jnp.float32)
            kf = (l2norm(k) * k_scale).astype(self.dtype)
            return kf, v

        b, n, _ = x.shape
        if residual_delta is not None:
            x_new, x = LayerNormG(self.dtype, name="norm")(
                x, residual=residual_delta)
        else:
            x_new = x
            x = LayerNormG(self.dtype, name="norm")(x)

        q = dense(inner, "to_q", static=True)(x)
        if cached_kv is None:
            kv_in = x if context is None else context
            m = kv_in.shape[1]
            # self-attention kv reads the LN'd x (static scales from the
            # same gamma); cross-attention kv reads the raw BEV context
            kv = dense(inner * 2, "to_kv", static=context is None)(kv_in)

        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, h, 1, dh), jnp.float32)
        q_scale = self.param("q_scale", nn.initializers.ones, (dh,), jnp.float32)
        k_scale = self.param("k_scale", nn.initializers.ones, (dh,), jnp.float32)

        # context_mask is per-sample constant by construction (CFG
        # cond-drop) -> a single keep flag per sample
        keep = context_mask[:, 0] if context_mask is not None else None

        # NOTE: a copy-minimal (b, L, h, dh) kernel entry exists
        # (ops/pallas/fused_attention.make_cosine_attention_nhd — ONE 5-d
        # permutation per operand instead of reshape+transpose) but
        # MEASURED SLOWER end-to-end (7.49 vs 7.80 img/s, batch-16
        # flagship): XLA lowers the (B,L,G,hg,D)->(B,G,hg,L,D)
        # permutation with 64-lane granularity, costing more than the
        # two simple copies it replaces. Kept tested but not wired.
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        if cached_kv is None:
            # split + two transposes. A single (b,m,2,h,dh)->(2,b,h,m,dh)
            # transpose was tried (round 4) and MEASURED WORSE at b16:
            # XLA materialized the 5-d permute PLUS two slice copies
            # (+300 ms/generate) and the sliced K's layout forced an
            # extra fp32 layout-change convert in the kernel wrapper's
            # K-norm (+260 ms) — same lesson as the nhd entry above.
            k, v = jnp.split(kv, 2, axis=-1)
            # K l2norm + learned scale HERE, in the projection's natural
            # (b, m, h, dh) layout, BEFORE the head transpose: the norm
            # fuses into the to_kv epilogue and the transpose moves bf16
            # bytes. Normalizing after the transpose (round-3 wrappers)
            # made XLA materialize the fp32 norm output through a
            # layout-change copy (+380 ms/b16-generate).
            kr = k.reshape(b, m, h, dh).astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(kr * kr, axis=-1, keepdims=True))
            kf = (kr / jnp.maximum(norm, 1e-12) * k_scale).astype(self.dtype)
            k = kf.transpose(0, 2, 1, 3)
            v = v.reshape(b, m, h, dh).transpose(0, 2, 1, 3)
        else:
            k, v = cached_kv
            m = k.shape[2]

        if self.mesh is not None and self.mesh.size > 1:
            # manual SPMD around the core: batch over dp, heads over tp
            # (attention is embarrassingly parallel over both); operands
            # get resharded to these specs at the boundary by GSPMD
            import inspect
            try:
                from jax import shard_map  # jax >= 0.8
            except ImportError:
                from jax.experimental.shard_map import shard_map
            # the replication-check kwarg was renamed check_rep ->
            # check_vma across jax versions; pick by the resolved
            # function's actual signature, not by which import succeeded
            sig_params = inspect.signature(shard_map).parameters
            sm_kwargs = ({"check_vma": False} if "check_vma" in sig_params
                         else {"check_rep": False})
            from jax.sharding import PartitionSpec as P
            # multi-slice meshes carry the slice axis on 'dcn'; the
            # batch dim shards over it jointly with dp (attention is
            # embarrassingly parallel over the batch, so no DCN
            # collective is introduced here)
            baxes = (("dcn", "dp") if "dcn" in self.mesh.axis_names
                     else "dp")
            spec = P(baxes, "tp", None, None)
            keep_arr = (jnp.ones((b,), jnp.float32) if keep is None
                        else jnp.asarray(keep).astype(jnp.float32))
            bias_arr = (jnp.zeros((n, m), jnp.float32) if attn_bias is None
                        else jnp.asarray(attn_bias, jnp.float32))
            # k arrives pre-normalized from BOTH sources (the in-layout
            # norm above, or the decode cache)
            out = shard_map(
                lambda *a: self._attention_core(*a, k_prenormed=True),
                mesh=self.mesh,
                in_specs=(spec, spec, spec, P(None, "tp", None, None),
                          P(None), P(None), P(None, None), P(baxes)),
                out_specs=spec, **sm_kwargs,
            )(q, k, v, null_kv, q_scale, k_scale, bias_arr, keep_arr)
        else:
            out = self._attention_core(q, k, v, null_kv, q_scale, k_scale,
                                       attn_bias, keep, k_prenormed=True)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = dense(self.dim, "to_out")(out)
        return (x_new, out) if return_residual else out


class _NestedScale(nn.Module):
    """The norm_mid gamma at its checkpoint path (<name>/norm/scale)
    for the fused GEGLU+LN pass, which needs the raw vector."""
    dim: int

    @nn.compact
    def __call__(self):
        return _ScaleParam(self.dim, name="norm")()


class _GegluProjIn(nn.Module):
    """proj_in with the fused-glue PADDED output layout: owns the
    checkpoint-identical (dim_in, 2*F) 'kernel' param but computes
    x @ [pad(Wa) | pad(Wg)] so the a/gate halves land 128-lane-aligned
    for the GEGLU+LN kernel (F=2730 is not a lane multiple; an
    in-kernel unaligned slice would relayout every call, and padding
    the ACTIVATIONS would cost a full extra pass over the biggest
    tensor in the block). The weight pad/reorder is scan-invariant —
    XLA hoists it out of the decode loop."""
    features: int    # 2*F (real)
    fpad: int        # padded half width (lane multiple)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), jnp.float32)
        f = self.features // 2
        pad = self.fpad - f
        kp = jnp.concatenate([
            jnp.pad(k[:, :f], ((0, 0), (0, pad))),
            jnp.pad(k[:, f:], ((0, 0), (0, pad)))], axis=-1)
        return x @ kp.astype(self.dtype)


class _GegluProjOut(nn.Module):
    """proj_out consuming the PADDED normalized GEGLU output: the
    checkpoint-identical (F, dim) 'kernel' param row-padded with zeros
    to eat the pad lanes (which the kernel writes as exact zeros)."""
    features: int    # dim
    in_real: int     # F
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_real, self.features), jnp.float32)
        kp = jnp.pad(k, ((0, z.shape[-1] - self.in_real), (0, 0)))
        return z @ kp.astype(self.dtype)


class GEGLUFeedForward(nn.Module):
    """LN -> Dense(2*inner) -> gate*gelu(x) -> LN -> Dense(dim)
    (muse_maskgit_pytorch.py:71-88).

    use_glue: fuse [residual+norm_in] and [gate*gelu+norm_mid] into
    single Pallas passes (ops/pallas/fused_glue.py) with the padded
    projection layout. None = OFF (measured slower e2e than XLA's own
    fusion of the same chain — see MultiViewTransformer; opt-in for
    experiments). Params are checkpoint-identical across all paths."""
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    quant: str = "none"
    use_glue: Optional[bool] = None

    @nn.compact
    def __call__(self, x, residual_delta=None, return_residual: bool = False):
        inner = int(self.dim * self.mult * 2 / 3)
        dense = _make_dense(self.quant, self.dtype)
        use_glue = (self.use_glue if self.use_glue is not None else False)
        if residual_delta is not None:
            x_new, h = LayerNormG(self.dtype, name="norm_in")(
                x, residual=residual_delta)
        else:
            x_new = x
            h = LayerNormG(self.dtype, name="norm_in")(x)
        if use_glue and self.quant == "none":
            from bevgen_tpu.ops.pallas.fused_glue import make_geglu_layernorm
            fpad = -(-inner // 128) * 128
            y = _GegluProjIn(inner * 2, fpad, self.dtype,
                             name="proj_in")(h)
            gamma = _NestedScale(inner, name="norm_mid")()
            gamma_p = jnp.pad(gamma, (0, fpad - inner))
            z = make_geglu_layernorm(inner)(y, gamma_p)
            out = _GegluProjOut(self.dim, inner, self.dtype,
                                name="proj_out")(z)
        else:
            h = dense(inner * 2, "proj_in", static=True)(h)
            a, gate = jnp.split(h, 2, axis=-1)
            h = gate * jax.nn.gelu(a, approximate=False)
            h = LayerNormG(self.dtype, name="norm_mid")(h)
            out = dense(self.dim, "proj_out", static=True)(h)
        return (x_new, out) if return_residual else out


class TransformerOutput(NamedTuple):
    logits: jnp.ndarray  # (b, cam, hw, vocab)
    embed: jnp.ndarray   # (b, cam*hw, dim)


class MultiViewTransformer(nn.Module):
    """The full stage-2 bidirectional transformer
    (muse_maskgit_pytorch.py:204-384). `mesh`: run every attention core
    in shard_map over (dp, tp) — see CosineAttention.mesh."""
    cfg: MultiViewConfig
    dtype: Dtype = jnp.float32
    mesh: Any = None
    # output head width: None -> vocab_size (the generator); 1 for the
    # TokenCritic variant (muse_maskgit_pytorch.py:423-426)
    dim_out: Optional[int] = None
    # the generator embeds vocab_size+1 ids (the [mask] token); the
    # TokenCritic only ever sees real tokens (add_mask_id default False
    # upstream, muse_maskgit_pytorch.py:222-225)
    add_mask_id: bool = True

    @nn.compact
    def __call__(self, ids, cond_ids, intrinsics_inv, extrinsics_inv,
                 cond_keep=None, deterministic: bool = True,
                 self_cond_embed=None, cache=None,
                 return_cache: bool = False):
        """cache / return_cache: the decode loop's step-INVARIANT work
        (camera-ray embedding, BEV context, camera-bias slices, every
        layer's cross-attention K/V — none of it depends on `ids`) is
        computed once per generate via `return_cache=True` and replayed
        into all subsequent forwards via `cache=` — the reference
        recomputes all of it in each of its ~70 python-loop forwards
        per batch (muse_maskgit_pytorch.py:283-384). Bit-identical
        outputs: the cached tensors are the same traced values."""
        cfg = self.cfg
        assert cfg.num_pad_tokens == 0, "MUSE dense path requires no pad tokens"
        b, cam, hw = ids.shape
        dim = cfg.num_embed
        nc = cfg.num_cond_tokens

        emb = lambda n, name: nn.Embed(n, dim, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)

        if cache is None:
            # ---- camera-ray embedding (muse_maskgit_pytorch.py:310-328)
            ray = None
            c_embed = None
            if cfg.image_embed:
                plane = jnp.asarray(geometry.image_plane(cfg).reshape(3, -1))
                I_inv = intrinsics_inv.astype(jnp.float32)    # (b,cam,3,3)
                E_inv = extrinsics_inv.astype(jnp.float32)    # (b,cam,4,4)
                pts = jnp.einsum("bcij,jn->bcin", I_inv, plane)  # (b,cam,3,hw)
                pts = jnp.concatenate(
                    [pts, jnp.ones_like(pts[:, :, :1])], axis=2)
                d = jnp.einsum("bcij,bcjn->bcin", E_inv, pts)  # (b,cam,4,hw)
                c = E_inv[..., -1]                             # (b,cam,4)
                img_dense = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                                     param_dtype=jnp.float32, name="img_embed")
                cam_dense = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                                     param_dtype=jnp.float32, name="cam_embed")
                d_emb = img_dense(d.transpose(0, 1, 3, 2).astype(self.dtype))
                c_embed = cam_dense(c.astype(self.dtype))      # (b,cam,dim)
                ray = (d_emb - c_embed[:, :, None, :]).astype(jnp.float32)
                ray = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True)
                             + 1e-7)

            # ---- BEV condition tokens (muse_maskgit_pytorch.py:333-341)
            context = emb(cfg.cond_vocab_size, "cond_token_emb")(cond_ids)
            if cfg.bev_embed:
                bev_grid = jnp.asarray(
                    geometry.get_bev_grid(cfg)[:2].reshape(2, -1).T)
                grid_embed = nn.Dense(dim, use_bias=True, dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      name="bev_embed")(
                                          bev_grid.astype(self.dtype))
                bev_cam_pos = self.param("bev_cam_pos_emb",
                                         nn.initializers.zeros,
                                         (1, cfg.num_cams, nc, dim),
                                         jnp.float32)
                c_exp = c_embed[:, :, None, :] if c_embed is not None else 0.0
                bev_cam = jnp.sum(bev_cam_pos.astype(self.dtype) + c_exp,
                                  axis=1)
                context = context + (grid_embed[None] - bev_cam)
            cond_pos = emb(nc, "cond_pos_emb")(jnp.arange(nc, dtype=jnp.int32))
            context = context + cond_pos[None]

            # ---- camera bias (muse_maskgit_pytorch.py:344-348) ----
            # Stored as a FULL (L, L) matrix masked by a static tril at
            # use — semantically identical to the reference's flat tril
            # param (the converter scatters host-side) but avoids a
            # 500k-element XLA scatter inside every forward, which
            # measured ~600 ms/step.
            self_bias = cross_bias = None
            if cfg.camera_bias:
                L = cfg.gpt_block_size
                bias_full = self.param("camera_bias_emb",
                                       nn.initializers.zeros, (L, L),
                                       jnp.float32)
                tril_mask = jnp.asarray(np.tril(np.ones((L, L), np.float32)))
                bias = bias_full * tril_mask
                bias = bias + jnp.asarray(masks.camera_bias_matrix(cfg))
                self_bias = bias[nc:, nc:]
                cross_bias = bias[nc:, :nc]
            cross_kv = (None,) * cfg.num_layers
        else:
            ray = cache["ray"]
            context = cache["context"]
            self_bias = cache["self_bias"]
            cross_bias = cache["cross_bias"]
            cross_kv = cache["cross_kv"]

        if return_cache:
            kvs = tuple(
                CosineAttention(dim, cfg.dim_head, cfg.num_heads,
                                dtype=self.dtype, quant=cfg.quant,
                                use_fused=cfg.use_fused_attention,
                                mesh=self.mesh,
                                name=f"layers_{layer}_cross_attn")(
                                    context, precompute_kv=True)
                for layer in range(cfg.num_layers))
            return {"ray": ray, "context": context, "self_bias": self_bias,
                    "cross_bias": cross_bias, "cross_kv": kvs}

        x = emb(cfg.vocab_size + int(self.add_mask_id),
                "token_emb")(ids)                            # (b,cam,hw,dim)
        if ray is not None:
            x = x + ray.astype(self.dtype)

        x = x.reshape(b, cam * hw, dim)
        pos = emb(cfg.num_img_tokens, "pos_emb")(
            jnp.arange(cam * hw, dtype=jnp.int32))
        x = x + pos[None]

        # classifier-free guidance: dropped-cond samples only see the null kv
        context_mask = jnp.ones((b, nc), dtype=bool)
        if cond_keep is not None:
            context_mask = context_mask & cond_keep[:, None]

        # ---- self-conditioning (muse_maskgit_pytorch.py:356-359) ----
        if cfg.self_cond:
            sc = (self_cond_embed if self_cond_embed is not None
                  else jnp.zeros_like(x))
            x = x + GEGLUFeedForward(
                dim, 4, dtype=self.dtype,
                name="self_cond_to_init_embed")(sc.astype(self.dtype))

        # ---- transformer blocks (muse_maskgit_pytorch.py:171-202) ----
        Attn = nn.remat(CosineAttention) if cfg.remat else CosineAttention
        FF = (nn.remat(GEGLUFeedForward) if cfg.remat
              else GEGLUFeedForward)
        # fused residual+LN glue (ops/pallas/fused_glue.py): every op
        # takes (stream, previous delta) and folds the residual add
        # into its LayerNorm in one Pallas pass. MEASURED OFF by
        # default: the kernels run at ~96% HBM bandwidth yet the b16
        # flagship e2e REGRESSED 17.48 -> 17.15 img/s — XLA's fusions
        # already fold the residual into the LN-stats pass and the
        # norm-apply into the matmul prologues, so they move FEWER
        # total HBM bytes than any standalone-kernel decomposition of
        # the same chain (docs/PERF_NOTES.md round-4). Kept as an
        # opt-in (cfg.use_fused_glue=True), fully tested.
        use_glue = (cfg.use_fused_glue if cfg.use_fused_glue is not None
                    else False)
        mk_attn = lambda name: Attn(dim, cfg.dim_head, cfg.num_heads,
                                    dtype=self.dtype, quant=cfg.quant,
                                    use_fused=cfg.use_fused_attention,
                                    mesh=self.mesh, name=name)
        mk_ff = lambda name: FF(dim, cfg.ff_mult, dtype=self.dtype,
                                quant=cfg.quant, use_glue=use_glue,
                                name=name)
        if use_glue:
            # The glue convention passes Python bools (return_residual=
            # True, precompute_kv=False) through the module call. Under
            # nn.remat those must be STATIC or jax.checkpoint traces
            # them and `if return_residual:` raises
            # TracerBoolConversionError — and jax's static_argnums only
            # binds POSITIONAL args (self is argnum 0), so the glue
            # path re-wraps with static_argnums and calls positionally.
            if cfg.remat:
                AttnG = nn.remat(CosineAttention, static_argnums=(6, 8))
                FFG = nn.remat(GEGLUFeedForward, static_argnums=(3,))
            else:
                AttnG, FFG = CosineAttention, GEGLUFeedForward
            mk_attn_g = lambda name: AttnG(
                dim, cfg.dim_head, cfg.num_heads, dtype=self.dtype,
                quant=cfg.quant, use_fused=cfg.use_fused_attention,
                mesh=self.mesh, name=name)
            mk_ff_g = lambda name: FFG(dim, cfg.ff_mult, dtype=self.dtype,
                                       quant=cfg.quant, use_glue=use_glue,
                                       name=name)
            d = None
            for layer in range(cfg.num_layers):
                # positional: (x, context, context_mask, attn_bias,
                #              cached_kv, precompute_kv, residual_delta,
                #              return_residual)
                x, d = mk_attn_g(f"layers_{layer}_attn")(
                    x, None, None, self_bias, None, False, d, True)
                x, d = mk_attn_g(f"layers_{layer}_cross_attn")(
                    x, context, context_mask, cross_bias,
                    cross_kv[layer], False, d, True)
                x, d = mk_ff_g(f"layers_{layer}_ff")(x, d, True)
            _, embed = LayerNormG(self.dtype, name="final_norm")(
                x, residual=d)
        else:
            for layer in range(cfg.num_layers):
                x = x + mk_attn(f"layers_{layer}_attn")(
                    x, attn_bias=self_bias)
                x = x + mk_attn(f"layers_{layer}_cross_attn")(
                    x, context=context, context_mask=context_mask,
                    attn_bias=cross_bias, cached_kv=cross_kv[layer])
                x = x + mk_ff(f"layers_{layer}_ff")(x)
            embed = LayerNormG(self.dtype, name="final_norm")(x)

        dim_out = self.dim_out if self.dim_out is not None else cfg.vocab_size
        logits = _make_dense(cfg.quant, self.dtype)(
            dim_out, "to_logits", static=True)(embed)
        return TransformerOutput(
            logits=logits.reshape(b, cam, hw, dim_out), embed=embed)


class SelfCriticHead(nn.Module):
    """Linear real/fake head over transformer embeddings
    (muse_maskgit_pytorch.py:388-414)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embed):
        return nn.Dense(1, use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_pred")(embed)[..., 0]
