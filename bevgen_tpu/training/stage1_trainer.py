"""Stage-1 (VQ-GAN / VQ-VAE) training steps.

Functional re-design of the reference's two-optimizer Lightning setup
(vqgan.py:162-172: Adam(0.5, 0.9) over AE params + Adam over the
discriminator): one jitted step computes reconstruction, the adaptive
discriminator weight (taming lineage: |grad_nll| / |grad_g| on the
decoder's output conv — done with two VJP pullbacks through the
decoder, no autograd graph needed), then applies both optimizer
updates. The BEV segmentation model uses the single-optimizer BCE path
(vqgan.py:221-229).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from bevgen_tpu.models.discriminator import NLayerDiscriminator
from bevgen_tpu.models.stage1.vq import VQModel
from bevgen_tpu.training import losses
from bevgen_tpu.training.optim import vqgan_optimizer


class Stage1TrainState(NamedTuple):
    step: jnp.ndarray
    params_ae: Any
    params_disc: Any
    opt_ae: Any
    opt_disc: Any


def create_stage1_state(model: VQModel, disc: Optional[NLayerDiscriminator],
                        rng, sample_batch, lr: float) -> Tuple[
                            Stage1TrainState, Any, Any]:
    r1, r2 = jax.random.split(rng)
    params_ae = model.init(r1, sample_batch)
    tx_ae = vqgan_optimizer(lr)
    if disc is not None:
        params_disc = disc.init(r2, sample_batch)
        tx_disc = vqgan_optimizer(lr)
        opt_disc = tx_disc.init(params_disc["params"])
    else:
        params_disc, tx_disc, opt_disc = None, None, None
    state = Stage1TrainState(
        step=jnp.zeros((), jnp.int32),
        params_ae=params_ae, params_disc=params_disc,
        opt_ae=tx_ae.init(params_ae["params"]), opt_disc=opt_disc)
    return state, tx_ae, tx_disc


def make_vqgan_train_step(model: VQModel, disc: NLayerDiscriminator,
                          tx_ae, tx_disc,
                          lpips_fn: Optional[Callable] = None,
                          disc_start: int = 0,
                          perceptual_weight: float = 1.0,
                          codebook_weight: float = 1.0):
    """Returns step(state, x, rng) -> (state, metrics). x: (b,H,W,C)."""

    def ae_loss_fn(p_ae, p_disc, x, step):
        variables = {"params": p_ae}
        xrec, qloss, _ = model.apply(variables, x)
        logits_fake = disc.apply({"params": p_disc}, xrec)

        if lpips_fn is not None and perceptual_weight > 0:
            perceptual = lpips_fn(x, xrec)
        else:
            perceptual = jnp.zeros((x.shape[0],), jnp.float32)

        # adaptive weight: grads of nll / g through the decoder's output
        # conv kernel only (taming's last_layer trick, vqgan.py:174-175)
        def rec_of_kernel(kern):
            p2 = jax.tree_util.tree_map(lambda v: v, p_ae)  # shallow copy
            p2 = _set_path(p2, ("decoder", "conv_out", "kernel"), kern)
            xr, _, _ = model.apply({"params": p2}, x)
            return xr

        kern = p_ae["decoder"]["conv_out"]["kernel"]
        xr2, dec_vjp = jax.vjp(rec_of_kernel, kern)

        def nll_of(xr):
            rec = losses.l1(x, xr)
            if lpips_fn is not None and perceptual_weight > 0:
                rec = rec + perceptual_weight * jnp.reshape(
                    lpips_fn(x, xr), (-1, 1, 1, 1))
            return jnp.mean(rec)

        def g_of(xr):
            return -jnp.mean(
                disc.apply({"params": p_disc}, xr).astype(jnp.float32))

        _, nll_cot = jax.vjp(nll_of, xr2)
        _, g_cot = jax.vjp(g_of, xr2)
        nll_grad = dec_vjp(nll_cot(jnp.float32(1.0))[0])[0]
        g_grad = dec_vjp(g_cot(jnp.float32(1.0))[0])[0]
        # the weight is a DETACHED statistic (taming vqgan.py:176
        # d_weight.detach()): stop_gradient keeps the outer jax.grad
        # from differentiating through these vjps (second-order chains
        # that ballooned the step ~100x when left attached)
        d_weight = jax.lax.stop_gradient(losses.adaptive_disc_weight(
            jnp.linalg.norm(nll_grad), jnp.linalg.norm(g_grad)))

        out = losses.vqgan_generator_loss(
            qloss, x, xrec, logits_fake, perceptual, step,
            disc_start=disc_start, disc_weight=d_weight,
            perceptual_weight=perceptual_weight,
            codebook_weight=codebook_weight)
        return out.loss, (out.log, xrec)

    def disc_loss_fn(p_disc, x, xrec, step):
        out = losses.vqgan_discriminator_loss(
            x, xrec, lambda p, y: disc.apply({"params": p["params"]}, y),
            {"params": p_disc}, step, disc_start=disc_start)
        return out.loss, out.log

    def train_step(state: Stage1TrainState, x, rng):
        del rng
        (loss_ae, (log_ae, xrec)), grads_ae = jax.value_and_grad(
            ae_loss_fn, has_aux=True)(state.params_ae["params"],
                                      state.params_disc["params"], x,
                                      state.step)
        upd, opt_ae = tx_ae.update(grads_ae, state.opt_ae,
                                   state.params_ae["params"])
        new_ae = optax.apply_updates(state.params_ae["params"], upd)

        (loss_d, log_d), grads_d = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.params_disc["params"], x,
                                        xrec, state.step)
        upd_d, opt_disc = tx_disc.update(grads_d, state.opt_disc,
                                         state.params_disc["params"])
        new_disc = optax.apply_updates(state.params_disc["params"], upd_d)

        new_state = Stage1TrainState(
            step=state.step + 1,
            params_ae={"params": new_ae}, params_disc={"params": new_disc},
            opt_ae=opt_ae, opt_disc=opt_disc)
        return new_state, {**log_ae, **log_d, "loss_ae": loss_ae,
                           "loss_disc": loss_d}

    return train_step


def make_seg_train_step(model: VQModel, tx_ae,
                        codebook_weight: float = 1.0):
    """BEV VQ-VAE: single optimizer, BCE loss (vqgan.py:221-239)."""

    def loss_fn(p_ae, x):
        logits, qloss, _ = model.apply({"params": p_ae}, x)
        out = losses.bce_seg_loss(qloss, x, logits, codebook_weight)
        return out.loss, out.log

    def train_step(state: Stage1TrainState, x, rng):
        del rng
        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_ae["params"], x)
        upd, opt_ae = tx_ae.update(grads, state.opt_ae,
                                   state.params_ae["params"])
        new_ae = optax.apply_updates(state.params_ae["params"], upd)
        new_state = state._replace(step=state.step + 1,
                                   params_ae={"params": new_ae},
                                   opt_ae=opt_ae)
        return new_state, {**log, "loss": loss}

    return train_step


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node[p] = dict(node[p])
        node = node[p]
    node[path[-1]] = value
    return tree
