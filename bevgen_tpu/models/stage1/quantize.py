"""Nearest-codebook vector quantization — pure functions on a codebook.

TPU-first re-design of the reference `VectorQuantizer2`
(modules/stage1/quantize.py:213-329): the distance argmin is one big
MXU matmul (``z @ E^T``) over the whole latent grid instead of a
row-by-row nearest-neighbor loop; the straight-through estimator uses
``stop_gradient``. The reference's `legacy` beta placement
(quantize.py:290-295) is reproduced.

Codebook layout: [n_embed, embed_dim] fp32 (matches torch
`embedding.weight`, converted directly).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizeResult(NamedTuple):
    z_q: jnp.ndarray        # quantized latents, same shape as z (..., d)
    loss: jnp.ndarray       # codebook + commitment loss (scalar)
    indices: jnp.ndarray    # codebook indices, shape z.shape[:-1]


def nearest_indices(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """argmin_j ||z - e_j||^2 over the last dim, computed as
    ||z||^2 + ||e||^2 - 2 z.e with the cross term on the MXU."""
    zf = z.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    z2 = jnp.sum(zf * zf, axis=-1, keepdims=True)           # (..., 1)
    e2 = jnp.sum(cb * cb, axis=-1)                          # (n,)
    cross = jnp.einsum("...d,nd->...n", zf, cb,
                       preferred_element_type=jnp.float32)  # (..., n)
    d = z2 + e2 - 2.0 * cross
    return jnp.argmin(d, axis=-1)


def quantize(z: jnp.ndarray, codebook: jnp.ndarray, beta: float = 0.25,
             legacy: bool = True) -> QuantizeResult:
    """Quantize `z` (..., d) against `codebook` (n, d) with an STE.

    legacy=True keeps the reference's swapped beta placement
    (quantize.py:290-295): loss = mean((sg[zq]-z)^2) + beta*mean((zq-sg[z])^2).
    """
    idx = nearest_indices(z, codebook)
    z_q = jnp.take(codebook, idx, axis=0).astype(z.dtype)
    zf = z.astype(jnp.float32)
    qf = z_q.astype(jnp.float32)
    commit = jnp.mean((jax.lax.stop_gradient(qf) - zf) ** 2)
    embed = jnp.mean((qf - jax.lax.stop_gradient(zf)) ** 2)
    if legacy:
        loss = commit + beta * embed
    else:
        loss = beta * commit + embed
    z_q = z + jax.lax.stop_gradient(z_q - z)
    return QuantizeResult(z_q=z_q, loss=loss, indices=idx)


def codebook_lookup(indices: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """indices (...) -> embeddings (..., d) (quantize.py:314-329)."""
    return jnp.take(codebook, indices, axis=0)


def codebook_stats(indices: jnp.ndarray, n_embed: int):
    """Usage histogram, perplexity and active-code fraction — the
    latent-code observability the reference logs as histograms
    (SURVEY §5.5)."""
    counts = jnp.bincount(indices.reshape(-1), length=n_embed)
    probs = counts / jnp.maximum(counts.sum(), 1)
    entropy = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0))
    return {
        "codebook_perplexity": jnp.exp(entropy),
        "codebook_usage": jnp.mean((counts > 0).astype(jnp.float32)),
    }


# ---------------------------------------------------------------------------
# variant quantizers (reference quantize.py:110-209, :331-444 — used by
# the GumbelVQ / EMAVQ model variants)
# ---------------------------------------------------------------------------


def gumbel_quantize(logits: jnp.ndarray, codebook: jnp.ndarray, rng,
                    temperature: float = 1.0, hard: bool = True,
                    kl_weight: float = 5e-4) -> QuantizeResult:
    """Gumbel-softmax relaxed VQ (reference `GumbelQuantize`,
    quantize.py:110-209): `logits` (..., n_embed) are projected scores;
    soft one-hot mixes the codebook, KL-to-uniform regularizer.
    `rng=None` zeroes the gumbel noise (deterministic eval)."""
    n = codebook.shape[0]
    g = (jnp.zeros(logits.shape, jnp.float32) if rng is None
         else jax.random.gumbel(rng, logits.shape, dtype=jnp.float32))
    lf = logits.astype(jnp.float32)
    soft = jax.nn.softmax((lf + g) / temperature, axis=-1)
    if hard:
        idx = jnp.argmax(soft, axis=-1)
        onehot = jax.nn.one_hot(idx, n, dtype=soft.dtype)
        soft = soft + jax.lax.stop_gradient(onehot - soft)
    else:
        idx = jnp.argmax(soft, axis=-1)
    z_q = jnp.einsum("...n,nd->...d", soft,
                     codebook.astype(jnp.float32))
    probs = jax.nn.softmax(lf, axis=-1)
    kl = kl_weight * jnp.mean(
        jnp.sum(probs * jnp.log(probs * n + 1e-10), axis=-1))
    return QuantizeResult(z_q=z_q, loss=kl, indices=idx)


def ema_quantize(z: jnp.ndarray, codebook: jnp.ndarray,
                 cluster_size: jnp.ndarray, embed_avg: jnp.ndarray,
                 beta: float = 0.25, decay: float = 0.99,
                 eps: float = 1e-5, update: bool = True):
    """EMA-codebook VQ (reference `EMAVectorQuantizer`,
    quantize.py:361-444): nearest lookup + STE commit loss, codebook
    maintained by exponential moving averages instead of gradients.

    Returns (QuantizeResult, (new_codebook, new_cluster_size,
    new_embed_avg)).
    """
    n, d = codebook.shape
    idx = nearest_indices(z, codebook)
    z_q = jnp.take(codebook, idx, axis=0).astype(z.dtype)
    zf = z.astype(jnp.float32)
    loss = beta * jnp.mean((jax.lax.stop_gradient(z_q.astype(jnp.float32))
                            - zf) ** 2)
    out = z + jax.lax.stop_gradient(z_q - z)

    if update:
        onehot = jax.nn.one_hot(idx.reshape(-1), n, dtype=jnp.float32)
        counts = onehot.sum(0)
        sums = onehot.T @ zf.reshape(-1, d)
        new_cluster = cluster_size * decay + counts * (1 - decay)
        new_avg = embed_avg * decay + sums * (1 - decay)
        tot = new_cluster.sum()
        smoothed = (new_cluster + eps) / (tot + n * eps) * tot
        new_codebook = new_avg / smoothed[:, None]
    else:
        new_cluster, new_avg, new_codebook = cluster_size, embed_avg, codebook
    res = QuantizeResult(z_q=out, loss=loss, indices=idx)
    return res, (new_codebook, new_cluster, new_avg)
