"""Stage-1 training losses.

The shipped reference configs use only `DummyLoss`
(losses/vqperceptual.py:5 — plain reconstruction + codebook loss); the
full VQ-GAN objective (L1 + LPIPS + adaptive-weight PatchGAN hinge
loss) lives on the reference's training branch and is reconstructed
here from the taming-transformers lineage the code vendors, for
capability parity (SURVEY §7 step 7). Segmentation models use
BCE-with-logits + codebook loss (losses/segmentation.py:11).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


def l1(a, b):
    return jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(nn_relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn_relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real)) +
                  jnp.mean(jax.nn.softplus(logits_fake)))


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def adopt_weight(weight: float, global_step, threshold: int):
    """Zero until `threshold` steps (disc warmup gate)."""
    return jnp.where(global_step < threshold, 0.0, weight)


def adaptive_disc_weight(nll_grad_norm, g_grad_norm,
                         disc_weight_max: float = 1e4):
    """taming adaptive balance: |grad nll| / |grad g| on the decoder's
    last layer."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, disc_weight_max))


class Stage1LossOutput(NamedTuple):
    loss: jnp.ndarray
    log: Dict[str, jnp.ndarray]


def dummy_loss(qloss, x, xrec, split: str = "train") -> Stage1LossOutput:
    """The shipped eval-path loss (losses/vqperceptual.py:5): rec L1 +
    codebook loss, no discriminator."""
    rec = jnp.mean(l1(x, xrec))
    total = rec + qloss
    return Stage1LossOutput(total, {
        f"{split}/rec_loss": rec, f"{split}/quant_loss": qloss,
        f"{split}/total_loss": total})


def bce_seg_loss(qloss, x, logits, codebook_weight: float = 1.0,
                 split: str = "train") -> Stage1LossOutput:
    """BCEWithLogits + codebook loss for the BEV VQ-VAE
    (losses/segmentation.py:11)."""
    xf = x.astype(jnp.float32)
    lf = logits.astype(jnp.float32)
    bce = jnp.mean(nn_relu(lf) - lf * xf + jnp.log1p(jnp.exp(-jnp.abs(lf))))
    total = bce + codebook_weight * qloss
    return Stage1LossOutput(total, {
        f"{split}/bce_loss": bce, f"{split}/quant_loss": qloss,
        f"{split}/total_loss": total})


def vqgan_generator_loss(qloss, x, xrec, logits_fake,
                         perceptual, global_step,
                         disc_start: int = 0,
                         disc_weight: jnp.ndarray = jnp.float32(1.0),
                         disc_factor: float = 1.0,
                         perceptual_weight: float = 1.0,
                         codebook_weight: float = 1.0,
                         split: str = "train") -> Stage1LossOutput:
    """Generator side of the VQ-GAN objective. `perceptual` is the
    already-computed LPIPS(x, xrec) per-sample vector (or 0.0 when no
    weights are available); `disc_weight` the adaptive weight."""
    rec = l1(x, xrec)
    if perceptual_weight > 0:
        rec = rec + perceptual_weight * jnp.reshape(
            perceptual, (-1,) + (1,) * (rec.ndim - 1))
    nll = jnp.mean(rec)
    g_loss = -jnp.mean(logits_fake.astype(jnp.float32))
    factor = adopt_weight(disc_factor, global_step, disc_start)
    total = nll + disc_weight * factor * g_loss + codebook_weight * qloss
    return Stage1LossOutput(total, {
        f"{split}/nll_loss": nll, f"{split}/g_loss": g_loss,
        f"{split}/quant_loss": qloss, f"{split}/d_weight": disc_weight,
        f"{split}/total_loss": total})


def vqgan_discriminator_loss(x, xrec, disc_apply, disc_params, global_step,
                             disc_start: int = 0, disc_factor: float = 1.0,
                             loss_type: str = "hinge",
                             split: str = "train") -> Stage1LossOutput:
    logits_real = disc_apply(disc_params, jax.lax.stop_gradient(x))
    logits_fake = disc_apply(disc_params, jax.lax.stop_gradient(xrec))
    fn = hinge_d_loss if loss_type == "hinge" else vanilla_d_loss
    factor = adopt_weight(disc_factor, global_step, disc_start)
    d_loss = factor * fn(logits_real.astype(jnp.float32),
                         logits_fake.astype(jnp.float32))
    return Stage1LossOutput(d_loss, {
        f"{split}/disc_loss": d_loss,
        f"{split}/logits_real": jnp.mean(logits_real),
        f"{split}/logits_fake": jnp.mean(logits_fake)})
