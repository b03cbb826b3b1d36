"""LPIPS perceptual metric — VGG16 backbone + learned linear heads.

Reference: modules/losses/lpips.py:11 (vendored taming LPIPS with
`lpips/vgg.pth` weights). Here the VGG16 feature extractor and the
5 linear heads are flax modules; pretrained weights load from an npz
converted from the torchvision VGG16 + reference lin weights with
`convert_lpips_weights` (torchvision is not bundled in this image, so
conversion runs wherever the .pth files are available — the module
gates cleanly when no weights are present and LPIPS-dependent features
disable themselves).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# channel config of VGG16 conv stages (torchvision features indices)
_VGG_SLICES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv stack; returns activations after each stage's ReLUs
    (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs = []
        idx = 0
        for stage, (ch, n_convs) in enumerate(_VGG_SLICES):
            for c in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv_{stage}_{c}")(x)
                x = nn.relu(x)
            outs.append(x)
            if stage < len(_VGG_SLICES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outs


class LPIPS(nn.Module):
    """Perceptual distance d(x, y); inputs in [-1, 1] NHWC."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xn = (x - shift) / scale
        yn = (y - shift) / scale
        vgg = VGG16Features(self.dtype, name="vgg")
        fx = vgg(xn)
        fy = vgg(yn)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a.astype(jnp.float32), axis=-1,
                                     keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b.astype(jnp.float32), axis=-1,
                                     keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=jnp.float32,
                          param_dtype=jnp.float32, name=f"lin_{i}")
            total = total + jnp.mean(lin(diff), axis=(1, 2, 3))
        return total


def convert_lpips_weights(vgg_pth: str, lpips_pth: str, out_npz: str):
    """torchvision vgg16 state_dict + taming vgg.pth lin weights ->
    flax npz. Run where torch + the weight files exist."""
    import torch
    vgg_sd = torch.load(vgg_pth, map_location="cpu")
    if not isinstance(vgg_sd, dict):
        vgg_sd = vgg_sd.state_dict()
    lpips_sd = torch.load(lpips_pth, map_location="cpu")
    out = {}
    conv_ids = [i for i in range(31)
                if f"features.{i}.weight" in vgg_sd]
    stage, c = 0, 0
    for i in conv_ids:
        w = vgg_sd[f"features.{i}.weight"].numpy()
        b = vgg_sd[f"features.{i}.bias"].numpy()
        out[f"vgg/conv_{stage}_{c}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"vgg/conv_{stage}_{c}/bias"] = b
        c += 1
        if c == _VGG_SLICES[stage][1]:
            stage += 1
            c = 0
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        w = lpips_sd[key].numpy()
        out[f"lin_{i}/kernel"] = np.transpose(w, (2, 3, 1, 0))
    np.savez_compressed(out_npz, **out)


def load_lpips_params(npz_path: str):
    """npz -> flax params tree for LPIPS.apply; None if missing."""
    from bevgen_tpu.core.checkpoint import load_npz_tree
    return load_npz_tree(npz_path, missing_ok=True)
