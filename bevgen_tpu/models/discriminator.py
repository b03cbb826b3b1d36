"""PatchGAN discriminator + ActNorm.

Reference: modules/discriminator/model.py:17 (`NLayerDiscriminator` —
4x4 convs, stride 2, BatchNorm or ActNorm, LeakyReLU 0.2) and
utils/taming_utils.py:10 (`ActNorm`). NHWC, fp32 norm statistics.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init
    (taming_utils.py:10-99). In this functional framework the init is a
    plain parameter initialization; `initialize_from` computes the
    data-dependent loc/scale for a batch."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (c,), jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        return (scale * (x.astype(jnp.float32) + loc)).astype(self.dtype)


class BatchNorm(nn.Module):
    """Inference-style batchnorm computed per batch (the reference uses
    torch BatchNorm2d in train mode inside the GAN loss — batch stats)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(0, 1, 2))
        var = xf.var(axis=(0, 1, 2))
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        out = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return out.astype(self.dtype)


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN (discriminator/model.py:17-67)."""
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = ActNorm if self.use_actnorm else BatchNorm
        conv = lambda f, s, name, bias=True: nn.Conv(
            f, (4, 4), strides=(s, s), padding=((1, 1), (1, 1)),
            use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        h = conv(self.ndf, 2, "conv_0")(x.astype(self.dtype))
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = conv(self.ndf * nf, 2, f"conv_{n}", bias=self.use_actnorm)(h)
            h = norm(self.dtype, name=f"norm_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = conv(self.ndf * nf, 1, f"conv_{self.n_layers}",
                 bias=self.use_actnorm)(h)
        h = norm(self.dtype, name=f"norm_{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        return conv(1, 1, "conv_out")(h)
