"""int8 weight+activation quantization for the decode transformer.

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at twice the bf16 rate,
and the MaskGit decode (SURVEY §3.1 hot loop) is matmul-bound at ~50%
of the bf16 roofline — so quantizing the six big dense layers per block
(to_q/to_kv/to_out x2, proj_in/proj_out, + to_logits) buys real
throughput. This is a serving-path option the reference does not have
(it serves fp16); default stays bf16 for bit-comparable golden tests.

Scheme:
  * weights: per-output-channel symmetric int8, scale = amax/127,
    quantized once host-side from the trained fp32/bf16 kernel;
  * activations, STATIC path (the default for the big layers): every
    hot matmul's input in this architecture is a scale-only LayerNorm
    output, i.e. exactly `x_norm[t,k] * gamma_k` with x_norm row-wise
    unit-variance — so a per-CHANNEL static scale
    `a_k = clip_sigma * |gamma_k| / 127` is known host-side from the
    LN gamma, no calibration pass needed. `a_k` folds into the weight
    quantization (W'[k,j] = a_k * W[k,j], then per-column int8), so the
    runtime activation quantize is ONE fused multiply+round pass with
    NO reduce, and the output epilogue is a single per-column scale.
    Round 2 measured the dynamic path SLOWER than bf16 at batch 16
    (13.7 vs 15.8 img/s) — the per-row amax reduce + per-row output
    rescale over the (B, L, 5460) GEGLU strips ate the int8 MXU win;
    this static path removes both.
  * activations, DYNAMIC path (inputs that are not LN outputs: to_out,
    the cross-attention to_kv): per-token (row) symmetric int8, scale
    computed on the fly (one VPU amax pass);
  * matmul in int8 with int32 accumulation, rescaled in fp32.

The quantized model's param tree swaps each `kernel` for
`kernel_q`+`scale` (+ `in_scale` on the static path) under the SAME
module names, so `quantize_dense_tree` converts any trained checkpoint
in place.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# dense-layer module names eligible for int8 (the hot matmuls; the tiny
# geometry embeds, embeddings and norms stay fp32)
QUANT_LAYER_NAMES = ("to_q", "to_kv", "to_out", "proj_in", "proj_out",
                     "to_logits")

# static activation clip range in units of the LN'd per-channel signal
# (x_norm is row-wise zero-mean/unit-variance, so values beyond
# CLIP_SIGMA sigmas clip — at 8 the clip probability is negligible and
# the quantizer still spends ~7 effective bits on the +-4 sigma mass)
CLIP_SIGMA = 8.0


def quantize_activations(x: jnp.ndarray):
    """Per-row symmetric int8: returns (x_q int8, scale f32 (..., 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_activations_static(x: jnp.ndarray, inv_in: jnp.ndarray):
    """Per-channel STATIC int8: one fused multiply+round pass, no
    reduce. inv_in = 1 / in_scale, (in,) f32."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_in), -127, 127)
    return q.astype(jnp.int8)


def quantize_weight(w: np.ndarray):
    """Per-output-channel symmetric int8 for a (in, out) kernel."""
    wf = np.asarray(w, np.float32)
    amax = np.abs(wf).max(axis=0)                       # (out,)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_weight_static(w: np.ndarray, gamma: np.ndarray,
                           clip_sigma: float = CLIP_SIGMA):
    """Static-activation weight quantization: the per-channel activation
    scale a_k = clip_sigma * |gamma_k| / 127 (gamma = the preceding
    scale-only LayerNorm's gain) folds into the kernel BEFORE the
    per-output-channel int8 step, so
        sum_k round(x_k / a_k) * Wq[k,j] * s_j  ~=  sum_k x_k W[k,j].
    Returns (kernel_q int8, out scale (out,), in_scale a (in,))."""
    wf = np.asarray(w, np.float32)
    a = np.maximum(np.abs(np.asarray(gamma, np.float32)), 1e-8) \
        * (clip_sigma / 127.0)                          # (in,)
    wa = wf * a[:, None]
    amax = np.abs(wa).max(axis=0)                       # (out,)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(wa / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32), a.astype(np.float32)


def int8_matmul(x_q, x_scale, w_q, w_scale, out_dtype):
    """(rows, K) int8 @ (K, N) int8 -> int32, rescaled to out_dtype.
    x_scale None: static path — the activation scale already lives in
    w_scale (folded at quantization time)."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * w_scale
    if x_scale is not None:
        out = out * x_scale
    return out.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in for `nn.Dense(use_bias=False)` running W8A8 on the MXU.

    Params: kernel_q (in, out) int8 + scale (out,) f32, plus in_scale
    (in,) f32 when static_input — produced from a trained kernel by
    `quantize_dense_tree`, never trained directly. Fresh `init` draws a
    random int8 kernel with a lecun-normal-matched scale so an
    unconverted tree still produces a functioning (random) model
    instead of silent all-zero outputs.

    static_input=True (the big layers, whose inputs are scale-only-LN
    outputs): per-channel static activation scales — quantize is one
    fused multiply+round, no per-row reduce, no per-row output rescale.
    """
    features: int
    dtype: Any = jnp.bfloat16
    static_input: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]

        def init_kernel_q(key, shape):
            return jax.random.randint(key, shape, -127, 128, jnp.int8)

        def init_scale(key, shape):
            # lecun-normal std / (int8 spread std ~73) per channel
            std = float(np.sqrt(1.0 / in_features))
            return jnp.full(shape, std / 73.0, jnp.float32)

        w_q = self.param("kernel_q", init_kernel_q,
                         (in_features, self.features))
        w_scale = self.param("scale", init_scale, (self.features,))
        if self.static_input:
            in_scale = self.param(
                "in_scale", lambda k, s: jnp.full(s, CLIP_SIGMA / 127.0,
                                                  jnp.float32),
                (in_features,))
            x_q = quantize_activations_static(x, 1.0 / in_scale)
            return int8_matmul(x_q, None, w_q, w_scale, self.dtype)
        x_q, x_scale = quantize_activations(x)
        return int8_matmul(x_q, x_scale, w_q, w_scale, self.dtype)


def _map_named_modules(params, layer_names: Sequence[str], key: str,
                       transform):
    """Host-side walk of a flax param dict: for every sub-dict whose
    module name is in `layer_names` and that holds a 2-D `key` array,
    replace it with transform(subdict)."""
    def rec(node, name):
        if isinstance(node, dict):
            if (name in layer_names and key in node
                    and np.ndim(node[key]) == 2):
                return transform(node)
            return {k: rec(v, k) for k, v in node.items()}
        return node
    return rec(jax.tree_util.tree_map(np.asarray, params), "")


def _ln_gamma(node):
    """Gamma of a LayerNormG subtree ({'norm': {'scale': ...}})."""
    return np.asarray(node["norm"]["scale"], np.float32)


def _quant_node(node, gamma=None, clip_sigma: float = CLIP_SIGMA):
    out = {k: v for k, v in node.items() if k != "kernel"}
    if gamma is None:
        q, s = quantize_weight(node["kernel"])
        out.update(kernel_q=q, scale=s)
    else:
        q, s, a = quantize_weight_static(node["kernel"], gamma, clip_sigma)
        out.update(kernel_q=q, scale=s, in_scale=a)
    return out


def quantize_dense_tree(params, layer_names: Sequence[str] = QUANT_LAYER_NAMES,
                        clip_sigma: float = CLIP_SIGMA):
    """Replace {'kernel'} with {'kernel_q', 'scale'(, 'in_scale')} for
    every hot dense layer in a flax param dict (host-side, numpy).

    Structure-aware: layers whose runtime input is a scale-only
    LayerNorm output get the STATIC path (in_scale folded from the
    sibling LN's gamma — see module docstring); the rest (to_out,
    whose input is the attention output, and the cross-attention
    to_kv, whose input is the un-normalized BEV context) keep dynamic
    per-row scales. Mirrors transformer.py's static_input choices
    exactly — the param layouts must agree."""
    def rec(node, name):
        if not isinstance(node, dict):
            return node
        if name == "self_cond_to_init_embed":
            # runtime keeps this tiny FF in bf16 (_make_dense is only
            # swapped for the hot per-layer blocks + to_logits)
            return node
        out = {}
        is_attn = "to_q" in node and "norm" in node
        is_ff = "proj_in" in node and "norm_in" in node
        has_logits = "to_logits" in node and "final_norm" in node
        for k, v in node.items():
            if is_attn and k == "to_q":
                out[k] = _quant_node(v, _ln_gamma(node["norm"]), clip_sigma)
            elif is_attn and k == "to_kv":
                g = (None if "cross" in name
                     else _ln_gamma(node["norm"]))
                out[k] = _quant_node(v, g, clip_sigma)
            elif is_attn and k == "to_out":
                out[k] = _quant_node(v)
            elif is_ff and k == "proj_in":
                out[k] = _quant_node(v, _ln_gamma(node["norm_in"]), clip_sigma)
            elif is_ff and k == "proj_out":
                out[k] = _quant_node(v, _ln_gamma(node["norm_mid"]), clip_sigma)
            elif has_logits and k == "to_logits":
                out[k] = _quant_node(v, _ln_gamma(node["final_norm"]),
                                     clip_sigma)
            elif k in layer_names and isinstance(v, dict) and "kernel" in v \
                    and np.ndim(v["kernel"]) == 2:
                out[k] = _quant_node(v)
            else:
                out[k] = rec(v, k)
        return out
    return rec(jax.tree_util.tree_map(np.asarray, params), "")


# AR sparse-GPT dense layers (models/stage2/gpt.py tree — NB its
# attention has no output projection, a reference quirk): the KV-cached
# decoder's per-token GEMVs stream every weight from HBM each step, so
# int8 weights halve its bandwidth bound (W8, bf16 compute — see
# ar_cached._dense).
GPT_QUANT_LAYER_NAMES = ("query", "key", "value", "mlp_fc",
                         "mlp_proj", "head")


def quantize_gpt_tree(params):
    """int8-quantize the AR GPT's dense kernels in place (keeps biases):
    {'kernel': W, ...} -> {'kernel_q', 'scale', ...}."""
    return quantize_dense_tree(params, GPT_QUANT_LAYER_NAMES)


def dequantize_dense_tree(params, layer_names: Sequence[str] = QUANT_LAYER_NAMES):
    """Inverse structure map (lossy): kernel_q*scale(/in_scale) ->
    kernel fp32."""
    def dequant(node):
        k = (node["kernel_q"].astype(np.float32) *
             node["scale"].astype(np.float32))
        if "in_scale" in node:
            k = k / node["in_scale"].astype(np.float32)[:, None]
        out = {k2: v for k2, v in node.items()
               if k2 not in ("kernel_q", "scale", "in_scale")}
        out["kernel"] = k
        return out
    return _map_named_modules(params, layer_names, "kernel_q", dequant)
