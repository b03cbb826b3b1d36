"""int8 weight+activation quantization for the decode transformer.

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at twice the bf16 rate,
and the MaskGit decode (SURVEY §3.1 hot loop) is matmul-bound at ~50%
of the bf16 roofline — so quantizing the six big dense layers per block
(to_q/to_kv/to_out x2, proj_in/proj_out, + to_logits) buys real
throughput. This is a serving-path option the reference does not have
(it serves fp16); default stays bf16 for bit-comparable golden tests.

Scheme (standard dynamic W8A8):
  * weights: per-output-channel symmetric int8, scale = amax/127,
    quantized once host-side from the trained fp32/bf16 kernel;
  * activations: per-token (row) symmetric int8, scale computed on the
    fly (one VPU amax pass, comparable to a LayerNorm);
  * matmul in int8 with int32 accumulation, rescaled by
    s_x[t] * s_w[j] in fp32.

The quantized model's param tree swaps each `kernel` for
`kernel_q`+`scale` under the SAME module names, so
`quantize_dense_tree` converts any trained checkpoint in place.
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


def quantize_activations(x: jnp.ndarray):
    """Per-row symmetric int8: returns (x_q int8, scale f32 (..., 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight(w: np.ndarray):
    """Per-output-channel symmetric int8 for a (in, out) kernel."""
    wf = np.asarray(w, np.float32)
    amax = np.abs(wf).max(axis=0)                       # (out,)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def int8_matmul(x_q, x_scale, w_q, w_scale, out_dtype):
    """(rows, K) int8 @ (K, N) int8 -> int32, rescaled to out_dtype."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in for `nn.Dense(use_bias=False)` running W8A8 on the MXU.

    Params: kernel_q (in, out) int8 + scale (out,) f32 — produced from a
    trained kernel by `quantize_dense_tree`, never trained directly.
    Fresh `init` draws a random int8 kernel with a lecun-normal-matched
    scale so an unconverted tree still produces a functioning (random)
    model instead of silent all-zero outputs.
    """
    features: int
    dtype: Any = jnp.bfloat16

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


def quantize_dense_tree(params, layer_names: Sequence[str] = QUANT_LAYER_NAMES):
    """Replace {'kernel'} with {'kernel_q', 'scale'} for every module in
    `layer_names` anywhere in a flax param dict (host-side, numpy)."""
    def quant(node):
        q, s = quantize_weight(node["kernel"])
        out = {k: v for k, v in node.items() if k != "kernel"}
        out.update(kernel_q=q, scale=s)
        return out
    return _map_named_modules(params, layer_names, "kernel", quant)


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
    """Inverse structure map (lossy): kernel_q*scale -> kernel fp32."""
    def dequant(node):
        k = (node["kernel_q"].astype(np.float32) *
             node["scale"].astype(np.float32))
        out = {k2: v for k2, v in node.items()
               if k2 not in ("kernel_q", "scale")}
        out["kernel"] = k
        return out
    return _map_named_modules(params, layer_names, "kernel_q", dequant)
