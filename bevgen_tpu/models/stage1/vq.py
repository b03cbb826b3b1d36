"""Stage-1 VQ models: RGB VQ-GAN and BEV VQ-VAE.

Functional equivalents of the reference Lightning modules
(modules/stage1/vqgan.py:31-262): `encode` -> (quantized latents, loss,
indices), `decode`, `decode_code`. No trainer coupling — these are plain
flax modules; training lives in bevgen_tpu.training.

The optional geometric embedding (camera-ray features added to encoder
output, vqgan.py:62-69,:87-112) is implemented but off in the shipped
Argoverse configs.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bevgen_tpu.core.config import Stage1Config
from bevgen_tpu.models import geometry
from bevgen_tpu.models.stage1 import quantize as vq
from bevgen_tpu.models.stage1.backbone import Decoder, Encoder, conv1x1

Dtype = Any


class EncodeResult(NamedTuple):
    z_q: jnp.ndarray       # (b, h, w, embed_dim)
    loss: jnp.ndarray
    indices: jnp.ndarray   # (b, h, w) int32


class VQModel(nn.Module):
    """RGB VQ-GAN autoencoder (vqgan.py:31). Input/output NHWC fp images."""
    cfg: Stage1Config
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype, name="encoder")
        self.decoder = Decoder(self.cfg, self.dtype, name="decoder")
        self.quant_conv = conv1x1(self.cfg.embed_dim, "quant_conv", self.dtype)
        self.post_quant_conv = conv1x1(self.cfg.z_channels, "post_quant_conv",
                                       self.dtype)
        self.codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32,
                -1.0 / self.cfg.n_embed, 1.0 / self.cfg.n_embed),
            (self.cfg.n_embed, self.cfg.embed_dim))
        if self.cfg.geometric_embedding:
            self.img_embed = conv1x1(self.cfg.cam_emd_dim, "img_embed",
                                     self.dtype, use_bias=False)
            self.cam_embed = conv1x1(self.cfg.cam_emd_dim, "cam_embed",
                                     self.dtype, use_bias=False)

    def geometric_features(self, intrinsics_inv, extrinsics_inv):
        """Normalized camera-ray embedding at latent resolution
        (vqgan.py:87-112). intrinsics_inv (b,3,3), extrinsics_inv (b,4,4)
        already flattened over cameras."""
        h, w = self.cfg.cam_latent_res
        plane = generate_plane(self.cfg)                       # (3, h, w)
        flat = jnp.asarray(plane.reshape(3, -1), dtype=jnp.float32)
        cam = jnp.einsum("bij,jn->bin", intrinsics_inv.astype(jnp.float32), flat)
        cam = jnp.concatenate([cam, jnp.ones_like(cam[:, :1])], axis=1)  # (b,4,hw)
        d = jnp.einsum("bij,bjn->bin", extrinsics_inv.astype(jnp.float32), cam)
        d = d.transpose(0, 2, 1).reshape(-1, h, w, 4)          # (b,h,w,4)
        c = extrinsics_inv[:, :, -1].astype(jnp.float32)       # (b,4)
        d_emb = self.img_embed(d.astype(self.dtype))
        c_emb = self.cam_embed(c[:, None, None, :].astype(self.dtype))
        emb = (d_emb - c_emb).astype(jnp.float32)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return (emb / (norm + 1e-7)).astype(self.dtype)

    def encode(self, x, intrinsics_inv=None, extrinsics_inv=None,
               deterministic: bool = True) -> EncodeResult:
        h = self.encoder(x, deterministic)
        if self.cfg.geometric_embedding:
            h = h + self.geometric_features(intrinsics_inv, extrinsics_inv)
        h = self.quant_conv(h)
        z_q, loss, idx = vq.quantize(h, self.codebook, self.cfg.beta,
                                     self.cfg.legacy_beta)
        return EncodeResult(z_q=z_q, loss=loss, indices=idx.astype(jnp.int32))

    def decode(self, z_q, deterministic: bool = True):
        h = self.post_quant_conv(z_q)
        return self.decoder(h, deterministic)

    def decode_code(self, indices, deterministic: bool = True):
        """Codebook indices (b, h, w) -> image (b, H, W, out_ch)."""
        z_q = vq.codebook_lookup(indices, self.codebook).astype(self.dtype)
        return self.decode(z_q, deterministic)

    def __call__(self, x, deterministic: bool = True,
                 intrinsics_inv=None, extrinsics_inv=None):
        enc = self.encode(x, intrinsics_inv, extrinsics_inv, deterministic)
        rec = self.decode(enc.z_q, deterministic)
        return rec, enc.loss, enc.indices


class VQSegmentationModel(VQModel):
    """BEV VQ-VAE over n_labels-channel semantic rasters (vqgan.py:216).
    Same autoencoder; reconstruction readout is sigmoid-rounded."""

    def reconstruct_labels(self, logits):
        return jnp.round(jax.nn.sigmoid(logits))


def generate_plane(cfg: Stage1Config) -> np.ndarray:
    """Latent-resolution pixel plane (vqgan.py:62-66): channel 0 (x)
    scaled by image WIDTH, channel 1 (y) by HEIGHT. NB: stage 1 does
    NOT have the stage-2 (h,w)-swap quirk — that lives only in
    mingpt_sparse.py:291-292 / muse_maskgit_pytorch.py:246-248 and is
    reproduced in models/stage2, not here."""
    g = geometry.generate_grid(cfg.cam_latent_res[0], cfg.cam_latent_res[1]).copy()
    g[0] *= cfg.cam_res[1]   # x over width
    g[1] *= cfg.cam_res[0]   # y over height
    return g
