"""Stage-1 conv backbone: taming-style ResNet encoder/decoder, TPU-native.

Design choices vs the reference (modules/stage1/model.py):
  * NHWC activations throughout (XLA's native TPU conv layout) — the
    checkpoint converter transposes torch NCHW weights.
  * bf16 compute / fp32 params via the `dtype` argument; GroupNorm runs
    in fp32 for stability.
  * the 16x16 single-head spatial attention is a plain batched matmul —
    512 tokens fits VMEM; XLA fuses softmax into the MXU pipeline.

Architecture parity (for checkpoint fidelity):
  Encoder/Decoder  <- model.py:342,436 (ch, ch_mult, 2 res blocks/level,
  attn at 16x16, mid block+attn+block, GroupNorm(32, eps 1e-6) + swish)
  Downsample       <- model.py:56-75 (asymmetric (0,1,0,1) pad, stride-2
  valid conv)
  Upsample         <- model.py:38-53 (nearest x2 + 3x3 conv)
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bevgen_tpu.core.config import Stage1Config

Dtype = Any


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm32(nn.Module):
    """GroupNorm(32, eps=1e-6) computed in fp32 (model.py:34-35)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xin = x.astype(jnp.float32)
        groups = min(32, x.shape[-1])  # reference always has >=128 channels
        out = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=jnp.float32,
                           name="norm")(xin)
        return out.astype(self.dtype)


def conv3x3(features: int, name: str, dtype: Dtype):
    return nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                   param_dtype=jnp.float32, name=name)


def conv1x1(features: int, name: str, dtype: Dtype, use_bias: bool = True):
    return nn.Conv(features, (1, 1), padding="VALID", use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class PaddedOutConv(nn.Module):
    """3x3 output conv whose few (3/7) output channels are padded to a
    lane-friendly width at the WEIGHT level (zeros, sliced off after).

    A 3-channel conv output forces XLA into a 3/128-lane MXU program
    with a degenerate output layout — the final RGB conv alone measured
    171 ms per b16 generate (scripts_dev/trace_tools.py budget). The
    zero-padded channels change no output value; param names/shapes are
    identical to nn.Conv ('kernel' HWIO + 'bias'), so checkpoints are
    unaffected. The weight pad is parameter-only — XLA hoists it."""
    features: int
    pad_to: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        pad = self.pad_to - self.features
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad)))
        bp = jnp.pad(b, (0, pad))
        y = jax.lax.conv_general_dilated(
            x, kp.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (y + bp.astype(self.dtype))[..., :self.features]


class ResnetBlock(nn.Module):
    """GN -> swish -> conv -> GN -> swish -> dropout -> conv, + shortcut
    (model.py:78-137)."""
    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = conv3x3(self.out_channels, "conv1", self.dtype)(h)
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv3x3(self.out_channels, "conv2", self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = conv1x1(self.out_channels, "nin_shortcut", self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention at low resolution
    (model.py:140-192)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = GroupNorm32(dtype=self.dtype, name="norm")(x)
        q = conv1x1(c, "q", self.dtype)(hn).reshape(b, h * w, c)
        k = conv1x1(c, "k", self.dtype)(hn).reshape(b, h * w, c)
        v = conv1x1(c, "v", self.dtype)(hn).reshape(b, h * w, c)
        attn = jnp.einsum("bic,bjc->bij", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(b, h, w, c)
        out = conv1x1(c, "proj_out", self.dtype)(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv (model.py:56-75)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(x)


class Upsample(nn.Module):
    """Nearest x2 + 3x3 conv (model.py:38-53)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv3x3(c, "conv", self.dtype)(x)


class Encoder(nn.Module):
    """Image -> z feature map, 2^(len(ch_mult)-1)x downsampled
    (model.py:342-433)."""
    cfg: Stage1Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        curr_res = cfg.resolution
        h = conv3x3(cfg.ch, "conv_in", self.dtype)(x.astype(self.dtype))
        for i_level, mult in enumerate(cfg.ch_mult):
            block_out = cfg.ch * mult
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(block_out, cfg.dropout, self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(
                                    h, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(self.dtype,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(cfg.ch_mult) - 1:
                h = Downsample(self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(h.shape[-1], cfg.dropout, self.dtype,
                        name="mid_block_1")(h, deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], cfg.dropout, self.dtype,
                        name="mid_block_2")(h, deterministic)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return conv3x3(out_ch, "conv_out", self.dtype)(h)


class Decoder(nn.Module):
    """z feature map -> image (model.py:436-537)."""
    cfg: Stage1Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        cfg = self.cfg
        num_res = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // (2 ** (num_res - 1))
        h = conv3x3(block_in, "conv_in", self.dtype)(z.astype(self.dtype))
        h = ResnetBlock(block_in, cfg.dropout, self.dtype,
                        name="mid_block_1")(h, deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, cfg.dropout, self.dtype,
                        name="mid_block_2")(h, deterministic)
        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_out, cfg.dropout, self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(
                                    h, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(self.dtype,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        if cfg.out_ch < 16:
            # 3/7-channel RGB/BEV outputs: lane-pad the weights
            return PaddedOutConv(cfg.out_ch, dtype=self.dtype,
                                 name="conv_out")(h)
        return conv3x3(cfg.out_ch, "conv_out", self.dtype)(h)
