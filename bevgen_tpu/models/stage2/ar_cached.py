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


def stack_layer_params(params: Dict, cfg: MultiViewConfig):
    """Stack the per-layer block dicts into ONE tree with a leading
    layer axis, fusing the Q/K/V projections into a single (d, 3d)
    matmul (independent output columns — bit-identical results).

    This is the decode-dispatch fix (round-4 verdict item 4): the
    per-token step then runs ONE lax.scan over layers instead of an
    unrolled 24-layer python loop, collapsing the step program by ~24x
    and letting XLA double-buffer each layer's weight DMA behind the
    previous layer's compute. Works for both the fp32/bf16 tree and the
    int8 tree (ops/quant.quantize_gpt_tree: kernel_q + per-out-channel
    scale concat the same way kernels do)."""
    p = params["params"]
    blocks = [p[f"block_{i}"] for i in range(cfg.num_layers)]
    stacked = dict(jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                          *blocks))
    q, k, v = stacked.pop("query"), stacked.pop("key"), stacked.pop("value")
    qkv = {}
    for field in q:
        axis = -1 if field in ("kernel", "kernel_q", "scale", "bias") else None
        assert axis is not None, f"unexpected dense field {field!r}"
        qkv[field] = jnp.concatenate([q[field], k[field], v[field]],
                                     axis=axis)
    stacked["qkv"] = qkv
    return stacked


def prefill(params: Dict, cfg: MultiViewConfig, static: ARStatic):
    """Run the nc condition positions, returning K/V caches
    ((num_layers, b, H, L, dh) arrays) sized for the full sequence +
    the logits predicting decode step 0."""
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
    return jnp.stack(k_cache), jnp.stack(v_cache), \
        logits0.astype(jnp.float32)


def _mlp(blk, x):
    h = _dense(blk["mlp_fc"], _ln(blk["ln2"], x))
    h = jax.nn.gelu(h, approximate=False)
    return _dense(blk["mlp_proj"], h)


PREFIX_BUCKET = 512


def _resolve_prefix_bucket() -> int:
    """Module var (tests override PREFIX_BUCKET); env knob
    BEVGEN_AR_PREFIX_BUCKET for on-chip A/Bs and as an escape hatch
    (0 disables bucketing -> full-width cache reads)."""
    import os
    return int(os.environ.get("BEVGEN_AR_PREFIX_BUCKET",
                              PREFIX_BUCKET)) or (1 << 30)


DECODE_IMPL = "unrolled"


def _resolve_decode_impl() -> str:
    """'unrolled' (default): per-layer cache arrays, python-unrolled
    layer loop — the static [:pl] prefix slices FUSE into the dots, so
    there are NO per-layer cache copies (the stacked variant's
    dynamic-index of layer i from the (nl, ...) array materialized a
    slice copy per layer-step = 34% of the b2 generate in the round-5
    trace). 'stacked': one lax.scan over stacked weights — ~24x
    smaller program, but pays the dynamic-slice copies."""
    import os
    return os.environ.get("BEVGEN_AR_DECODE", DECODE_IMPL)


def _fuse_qkv_per_layer(params: Dict, cfg: MultiViewConfig):
    """Per-layer dicts with query/key/value fused into one 'qkv' dense
    (independent output columns — bit-identical), for the unrolled
    decode path."""
    p = params["params"]
    out = []
    for i in range(cfg.num_layers):
        blk = dict(p[f"block_{i}"])
        q, k, v = blk.pop("query"), blk.pop("key"), blk.pop("value")
        qkv = {}
        for field in q:
            assert field in ("kernel", "kernel_q", "scale", "bias"), field
            qkv[field] = jnp.concatenate([q[field], k[field], v[field]],
                                         axis=-1)
        blk["qkv"] = qkv
        out.append(blk)
    return out


def decode_step_unrolled(params: Dict, cfg: MultiViewConfig,
                         static: ARStatic, k_list, v_list, s, x_s,
                         blocks=None, prefix: Optional[int] = None):
    """decode_step with PER-LAYER cache arrays (tuples) and an unrolled
    python layer loop: cache reads are static prefix slices that fuse
    straight into the bf16 dots — zero per-layer copies."""
    p = params["params"]
    L = cfg.gpt_block_size
    block = cfg.sparse_block_size
    b = x_s.shape[0]
    H = cfg.num_heads
    dh = cfg.hidden_size // H
    scale = 1.0 / float(np.sqrt(dh))
    pl = L if prefix is None else prefix
    if blocks is None:
        blocks = _fuse_qkv_per_layer(params, cfg)

    col = jnp.arange(L)
    lay_rows = jax.lax.dynamic_index_in_dim(
        static.layouts, s // block, axis=1, keepdims=False)   # (H, nb)
    lay = _expand_layout_rows(lay_rows, block, L) > 0          # (H, L)
    mask_pl = (lay & (col[None, :] <= s))[:, :pl]              # (H, pl)
    if static.bias_rows is not None:
        bias_pl = jax.lax.dynamic_index_in_dim(
            static.bias_rows, s, axis=0, keepdims=False)[:pl]  # (pl,)
    else:
        bias_pl = 0.0

    # BEVGEN_AR_ATTN=pallas: one-pass decode-attention kernel
    # (ops/pallas/decode_attention.py) instead of the ~5 XLA fusions
    # per layer. Env-gated (off by default until TPU-measured faster);
    # the addend folds mask+bias once per step: scores*scale + addend
    # == the inline (scores+bias)*scale then mask, to fp equivalence.
    import os
    use_kernel = os.environ.get("BEVGEN_AR_ATTN") == "pallas"
    if use_kernel:
        from bevgen_tpu.ops.pallas.decode_attention import decode_attention
        addend = jnp.where(mask_pl, jnp.asarray(bias_pl, jnp.float32)
                           * scale, NEG_INF)[:, :, None]    # (H, pl, 1)

    k_list, v_list = list(k_list), list(v_list)
    x = x_s[:, None, :]
    for i, blk in enumerate(blocks):
        xn = _ln(blk["ln1"], x)
        qkv = _dense(blk["qkv"], xn)[:, 0]                 # (b, 3*hidden)
        q, k, v = (qkv[:, :H * dh].reshape(b, H, dh),
                   qkv[:, H * dh:2 * H * dh].reshape(b, H, dh),
                   qkv[:, 2 * H * dh:].reshape(b, H, dh))
        k_list[i] = jax.lax.dynamic_update_slice(
            k_list[i], k[:, :, None, :].astype(k_list[i].dtype),
            (0, 0, s, 0))
        v_list[i] = jax.lax.dynamic_update_slice(
            v_list[i], v[:, :, None, :].astype(v_list[i].dtype),
            (0, 0, s, 0))
        k_i = k_list[i][:, :, :pl]
        v_i = v_list[i][:, :, :pl]
        if use_kernel:
            attn = decode_attention(
                q, k_i, v_i, addend, scale,
                interpret=jax.default_backend() != "tpu")
        else:
            scores = jnp.einsum("bhd,bhjd->bhj", q.astype(k_i.dtype),
                                k_i, preferred_element_type=jnp.float32)
            scores = (scores + bias_pl) * scale
            scores = jnp.where(mask_pl[None], scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhj,bhjd->bhd", probs.astype(v_i.dtype),
                              v_i, preferred_element_type=jnp.float32
                              ).astype(x.dtype)
        attn = attn.reshape(b, 1, cfg.hidden_size)
        x = xn + attn
        x = x + _mlp(blk, x)

    out = _ln(p["ln_f"], x[:, 0])
    logits = _dense(p["head"], out)
    return logits.astype(jnp.float32), tuple(k_list), tuple(v_list)


def bucket_ranges(L: int, nc: int, N: int, bucket: int):
    """Chunk the decode steps t in [0, N) by the static cache-prefix
    width their positions s = nc + t need: returns [(t0, t1, pl)] where
    every step in [t0, t1) attends only columns < pl = the bucket
    boundary above its s. The token scan then runs as ONE lax.scan per
    chunk with a STATIC prefix (XLA needs static shapes; a lax.switch
    over widths inside the step was tried first and CRASHED the TPU
    runtime — large carried caches through switch branches)."""
    out = []
    t = 0
    while t < N:
        c = (nc + t) // bucket
        pl = min((c + 1) * bucket, L)
        t1 = min(N, (c + 1) * bucket - nc)
        out.append((t, t1, pl))
        t = t1
    return out


def decode_step(params: Dict, cfg: MultiViewConfig, static: ARStatic,
                k_cache, v_cache, s, x_s, stacked=None,
                prefix: Optional[int] = None):
    """One sequence position s (= nc + t) through all layers.
    x_s: (b, d) input embedding; k_cache/v_cache: (nl, b, H, L, dh).
    Returns (logits (b, vocab), caches).

    Two memory-traffic structures (the per-token step is HBM-bound:
    weights + K/V cache reads dominate — docs/PERF_NOTES.md AR budget):

      * layers run as ONE lax.scan over the stacked weight tree
        (stack_layer_params) with the fused QKV projection — ~24x fewer
        ops in the step program than the round-3 unrolled python loop;
      * causal PREFIX slicing: position s only attends cols <= s, so
        with `prefix` = a STATIC width >= s+1 (drivers chunk the token
        scan by bucket_ranges) the scores/AV reads slice the cache to
        prefix columns. Mean cache-read traffic drops to
        ~(L/2 + bucket/2)/L of the full-width read — ~40% less at the
        nuScenes shapes — independent of sparsity density. Only
        exactly-zero softmax terms are removed, but XLA's
        width-dependent reduction order makes results equal to f32
        reassociation noise (~1e-4 relative), not bitwise
        (tests/test_ar_cached.py::test_prefix_bucketing_bit_identical).

    Pass `stacked` (built once per generate) to avoid restacking."""
    p = params["params"]
    L = cfg.gpt_block_size
    block = cfg.sparse_block_size
    if prefix is None:
        prefix = L
    if stacked is None:
        stacked = stack_layer_params(params, cfg)

    col = jnp.arange(L)
    lay_rows = jax.lax.dynamic_index_in_dim(
        static.layouts, s // block, axis=1, keepdims=False)   # (H, nb)
    lay = _expand_layout_rows(lay_rows, block, L) > 0          # (H, L)
    mask_row = lay & (col[None, :] <= s)                       # (H, L)
    if static.bias_rows is not None:
        bias_row = jax.lax.dynamic_index_in_dim(
            static.bias_rows, s, axis=0, keepdims=False)       # (L,)
    else:
        bias_row = None

    return _decode_step_prefix(p, cfg, stacked, mask_row, bias_row,
                               k_cache, v_cache, s, x_s, prefix)


def _decode_step_prefix(p, cfg, stacked, mask_row, bias_row,
                        k_cache, v_cache, s, x_s, pl: int):
    """The layer scan at a STATIC cache-prefix width pl (>= s+1)."""
    b, d = x_s.shape
    H = cfg.num_heads
    dh = cfg.hidden_size // H
    scale = 1.0 / float(np.sqrt(dh))
    mask_pl = mask_row[:, :pl]
    bias_pl = 0.0 if bias_row is None else bias_row[:pl]

    def layer(carry, xs_l):
        x, kc, vc = carry
        i, blk = xs_l["i"], xs_l["blk"]
        xn = _ln(blk["ln1"], x)
        qkv = _dense(blk["qkv"], xn)[:, 0]                 # (b, 3*hidden)
        q, k, v = (qkv[:, :H * dh].reshape(b, H, dh),
                   qkv[:, H * dh:2 * H * dh].reshape(b, H, dh),
                   qkv[:, 2 * H * dh:].reshape(b, H, dh))
        kc = jax.lax.dynamic_update_slice(
            kc, k[None, :, :, None, :].astype(kc.dtype), (i, 0, 0, s, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v[None, :, :, None, :].astype(vc.dtype), (i, 0, 0, s, 0))
        k_i = jax.lax.dynamic_index_in_dim(
            kc, i, 0, keepdims=False)[:, :, :pl]
        v_i = jax.lax.dynamic_index_in_dim(
            vc, i, 0, keepdims=False)[:, :, :pl]
        # bf16 operands + f32 MXU accumulation: bf16xbf16 products are
        # EXACT in f32, so this matches the old f32 dot up to reduction
        # order — while the upcast-to-f32 path made XLA MATERIALIZE f32
        # copies of both cache slices every layer-step
        # (dynamic-slice_bitcast fusions = 34% of the b2 generate in
        # the round-5 trace)
        scores = jnp.einsum("bhd,bhjd->bhj", q.astype(kc.dtype), k_i,
                            preferred_element_type=jnp.float32)
        scores = (scores + bias_pl) * scale
        scores = jnp.where(mask_pl[None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        # probs at the cache dtype for the AV read (flash-attention
        # convention); f32 accumulation
        attn = jnp.einsum("bhj,bhjd->bhd", probs.astype(vc.dtype), v_i,
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)
        attn = attn.reshape(b, 1, cfg.hidden_size)
        x = xn + attn
        x = x + _mlp(blk, x)
        return (x, kc, vc), None

    xs = {"i": jnp.arange(cfg.num_layers, dtype=jnp.int32), "blk": stacked}
    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer, (x_s[:, None, :], k_cache, v_cache), xs)

    out = _ln(p["ln_f"], x[:, 0])
    logits = _dense(p["head"], out)
    return logits.astype(jnp.float32), k_cache, v_cache


def _make_stepper(params, cfg, static, k_cache, v_cache):
    """Select the decode implementation (see _resolve_decode_impl) and
    adapt the prefill caches to its pytree shape. Returns
    (step_fn(kc, vc, s, x_s, pl) -> (logits, kc, vc), kc0, vc0)."""
    if _resolve_decode_impl() == "unrolled":
        blocks = _fuse_qkv_per_layer(params, cfg)
        kc0 = tuple(k_cache[i] for i in range(cfg.num_layers))
        vc0 = tuple(v_cache[i] for i in range(cfg.num_layers))

        def step(kc, vc, s, x_s, pl):
            return decode_step_unrolled(params, cfg, static, kc, vc, s,
                                        x_s, blocks=blocks, prefix=pl)
        return step, kc0, vc0

    stacked = stack_layer_params(params, cfg)

    def step(kc, vc, s, x_s, pl):
        return decode_step(params, cfg, static, kc, vc, s, x_s,
                           stacked=stacked, prefix=pl)
    return step, k_cache, v_cache


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
    step_fn, k_cache, v_cache = _make_stepper(params, cfg, static,
                                              k_cache, v_cache)

    ids = jnp.full((b, cam, hw), cfg.vocab_size, jnp.int32)
    if init_ids is not None:
        ids = jnp.asarray(init_ids, jnp.int32)
    keep = None if init_ids is None else (ids != cfg.vocab_size)

    def sample_from(logits, key):
        l = logits / temperature
        if top_k is not None:
            l = top_k_logits(l, top_k)
        return jax.random.categorical(key, l).astype(jnp.int32)

    def make_body(pl):
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
            logits, k_cache, v_cache = step_fn(k_cache, v_cache, nc + t,
                                               x_s, pl)
            return (ids, k_cache, v_cache, logits), None
        return body

    xs = {"t": jnp.arange(N, dtype=jnp.int32),
          "rng": jax.random.split(rng, N),
          "cam": fwd_cam, "pos": fwd_pos, "raw": fwd_raw}
    carry = (ids, k_cache, v_cache, logits0)
    # one lax.scan per static cache-prefix chunk (see bucket_ranges)
    L = cfg.gpt_block_size
    for t0, t1, pl in bucket_ranges(L, nc, N, _resolve_prefix_bucket()):
        chunk = jax.tree_util.tree_map(lambda x: x[t0:t1], xs)
        carry, _ = jax.lax.scan(make_body(pl), carry, chunk)
    ids = carry[0]
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
    step_fn, k_cache, v_cache = _make_stepper(params, cfg, static,
                                              k_cache, v_cache)
    flat = tokens.reshape(b, -1)

    def make_body(pl):
        def body(carry, step):
            k_cache, v_cache, logits = carry
            raw = step["raw"]
            tok = flat[:, raw]
            x_s = token_embedding(params, cfg, static, tok, raw)
            new_logits, k_cache, v_cache = step_fn(
                k_cache, v_cache, nc + step["t"], x_s, pl)
            return (k_cache, v_cache, new_logits), logits
        return body

    xs = {"t": jnp.arange(N, dtype=jnp.int32),
          "raw": jnp.asarray(fwd, jnp.int32)}
    carry = (k_cache, v_cache, logits0)
    chunks = []
    L = cfg.gpt_block_size
    for t0, t1, pl in bucket_ranges(L, nc, N, _resolve_prefix_bucket()):
        chunk = jax.tree_util.tree_map(lambda x: x[t0:t1], xs)
        carry, ys = jax.lax.scan(make_body(pl), carry, chunk)
        chunks.append(ys)
    all_logits = jnp.concatenate(chunks, axis=0)
    # all_logits[t] predicts decode step t -> scatter back to raw order
    out = jnp.zeros((b, N, all_logits.shape[-1]), jnp.float32)
    out = out.at[:, jnp.asarray(fwd, jnp.int32)].set(
        all_logits.transpose(1, 0, 2))
    return out
