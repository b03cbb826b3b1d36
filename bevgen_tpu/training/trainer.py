"""Stage-2 training: sharded train step over a (dp, tp) mesh.

Replaces the reference's PL Trainer + DeepSpeed ZeRO-2 stack
(SURVEY §2.8): one pure `train_step` function — grads, AdamW update,
EMA — jitted with GSPMD shardings (batch over dp, attention/FFN weights
over tp, optimizer moments ZeRO-sharded over dp). bf16 forward/backward
with fp32 params/moments; no loss-scaling needed on TPU (bf16 keeps
fp32's exponent range — SURVEY §7 hard-part 6).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bevgen_tpu.models.stage2.maskgit import MaskGit, maskgit_loss
from bevgen_tpu.parallel import sharding as shd
from bevgen_tpu.training import optim


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: optim.EmaState


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params["params"]),
                      ema=optim.ema_init(params["params"]))


def make_train_step(model: MaskGit, tx: optax.GradientTransformation,
                    ema_decay: float = 0.9999,
                    skip_nonfinite: bool = True,
                    ema_every: int = 1,
                    ema_warmup: bool = False,
                    grad_constraint=None):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict with tokens (b,cam,hw) int32, cond_ids (b,nc) int32,
    intrinsics_inv (b,cam,3,3), extrinsics_inv (b,cam,4,4).

    skip_nonfinite: drop the update when the loss/grads are non-finite
    and keep the previous state — the bf16 analogue of DeepSpeed's
    fp16 loss-scale NaN retry (README.md:109), without the retry loop.

    ema_every: set to the gradient-accumulation factor when tx is an
    optax.MultiSteps so the EMA advances once per APPLIED update, not
    per micro-batch (its decay horizon is defined in updates).

    grad_constraint: optional fn(grads)->grads applied right after the
    backward pass. make_sharded_train_step uses it to pin the grads to
    the ZeRO moment shardings (a reduce-scatter — ZeRO-2's grad
    placement) so the optimizer update runs fully dp-sharded instead of
    XLA inventing a tp sharding for small grads and involuntarily
    rematerializing the dp-sharded moments against it.
    """
    def loss_fn(variables_params, variables_rest, rng, batch):
        variables = {"params": variables_params, **variables_rest}
        out = maskgit_loss(model, variables, rng, batch["tokens"],
                           batch["cond_ids"], batch["intrinsics_inv"],
                           batch["extrinsics_inv"])
        return out.loss, out

    def train_step(state: TrainState, batch, rng):
        params = state.params["params"]
        rest = {k: v for k, v in state.params.items() if k != "params"}
        rng = jax.random.fold_in(rng, state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rest, rng, batch)
        if grad_constraint is not None:
            grads = grad_constraint(grads)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if skip_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, params)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: (jnp.where(ok, new, old)
                                  if hasattr(new, "shape") else new),
                opt_state, state.opt_state)
        else:
            ok = jnp.bool_(True)
        # ema_warmup=True ramps the decay from 0 (ema-pytorch style) so
        # early EMA checkpoints track params in from-scratch runs; the
        # default is the reference's fixed decay (ema.py:148-151) —
        # matching its trajectory, including its near-init early EMA
        ema_cand = optim.ema_update(state.ema, new_params, ema_decay,
                                    warmup=ema_warmup)
        if ema_every > 1:
            # only the final micro-batch of each accumulation cycle
            # applies an optimizer update (optax.MultiSteps counts in
            # lockstep with state.step since tx.update runs once here)
            apply_ema = (state.step + 1) % ema_every == 0
            ema = optim.EmaState(
                params=jax.tree_util.tree_map(
                    lambda c, e: jnp.where(apply_ema, c, e),
                    ema_cand.params, state.ema.params),
                count=jnp.where(apply_ema, ema_cand.count, state.ema.count))
        else:
            ema = ema_cand
        new_state = TrainState(step=state.step + 1,
                               params={"params": new_params, **rest},
                               opt_state=opt_state, ema=ema)
        metrics = {"loss": loss, "ce_loss": aux.ce_loss,
                   "critic_loss": aux.critic_loss,
                   "grad_norm": grad_norm,
                   "update_applied": ok.astype(jnp.float32)}
        return new_state, metrics

    return train_step


def make_sharded_train_step(model: MaskGit, tx, mesh: Mesh,
                            state: TrainState, ema_decay: float = 0.9999,
                            ema_warmup: bool = False,
                            ema_every: int = 1):
    """jit the train step with explicit in/out shardings over `mesh`.

    Returns (jitted_step, sharded_state): params replicated / TP-sharded,
    optimizer moments ZeRO-sharded over dp, batch sharded over dp.

    Runs the attention cores inside shard_map under a real mesh —
    pallas_call has no GSPMD partitioning rule (see
    pipelines.make_sharded_generate).
    """
    if mesh.size > 1:
        model = MaskGit(model.cfg, model.muse, model.dtype, mesh=mesh)
    # pin grads to the ZeRO moment shardings (ZeRO-2's reduce-scattered
    # grad placement): without this XLA is free to leave small grads
    # tp-sharded from the backward pass, and the dp-sharded Adam moments
    # then reshard against them via involuntary full rematerialization
    # (observed on cond_pos_emb/bev_cam_pos_emb in the 8-device dryrun)
    grad_sh = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, shd.moment_pspec(path, leaf, mesh)),
        state.params["params"])

    def grad_constraint(grads):
        return jax.lax.with_sharding_constraint(grads, grad_sh)

    step_fn = make_train_step(model, tx, ema_decay, ema_every=ema_every,
                              ema_warmup=ema_warmup,
                              grad_constraint=(grad_constraint
                                               if mesh.size > 1 else None))

    param_sh = shd.param_shardings(state.params, mesh)
    opt_sh = shd.opt_state_shardings(state.opt_state, mesh)
    ema_sh = optim.EmaState(
        params=shd.opt_state_shardings(state.ema.params, mesh),
        count=NamedSharding(mesh, P()))
    state_sh = TrainState(step=NamedSharding(mesh, P()), params=param_sh,
                          opt_state=opt_sh, ema=ema_sh)
    batch_sh = NamedSharding(mesh, P(shd.batch_axes(mesh)))
    rng_sh = NamedSharding(mesh, P())
    metrics_sh = NamedSharding(mesh, P())

    # donate the state: params/moments/EMA are pure old->new rewrites, so
    # XLA aliases the buffers in place of holding two copies of the
    # optimizer state across the update (the skip_nonfinite jnp.where
    # reads of the old tree happen inside the computation and are safe)
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, rng_sh),
        out_shardings=(state_sh, metrics_sh),
        donate_argnums=(0,),
    )
    # Donation requires every flattened argument to own a distinct buffer.
    # ema_init seeds the EMA tree with the SAME arrays as the params (and a
    # resume without an -EMA sibling does the same), so the state tree can
    # hold one buffer in two leaves — Execute() then rejects the donation
    # ("attempt to donate the same buffer twice"). Copy repeat occurrences.
    seen: set = set()

    def _unalias(x):
        if id(x) in seen:
            return jnp.array(x, copy=True)
        seen.add(id(x))
        return x

    state = jax.tree_util.tree_map(_unalias, state)
    sharded_state = jax.device_put(state, state_sh)
    return jitted, sharded_state


# ---------------------------------------------------------------------------
# AR (SparseGPT) sharded training
# ---------------------------------------------------------------------------


class ARTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_ar_train_state(params, tx: optax.GradientTransformation):
    """params: the full flax variables dict {'params': ...}; the
    optimizer state covers the inner 'params' tree (the decay-mask
    partition in optim.maskgit_optimizer is built against it)."""
    return ARTrainState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_state=tx.init(params["params"]))


def make_ar_sharded_train_step(model, tx, mesh: Mesh, state: ARTrainState):
    """Sharded train step for the AR SparseGPT family.

    The reference's AR path is data-parallel only (DDP / DeepSpeed
    ZeRO-2 — SURVEY §2.8, no TP), so the whole loss+backward runs
    inside ONE shard_map over the mesh's batch axes with params
    replicated: the Pallas block-sparse attention kernel (fwd AND its
    custom-vjp bwd) executes per-shard at local shapes — pallas_call
    has no GSPMD partitioning rule, exactly like the MUSE attention
    cores (CosineAttention.mesh). Gradients are pmean-ed across the
    batch axes; the optimizer update then runs replicated inside the
    same jit. Returns (jitted_step, sharded_state).

    Replaces: the reference's torch.distributed layout broadcast +
    DDP allreduce around DeepSpeed sparse attention
    (sparse_self_attention.py:48-52, mingpt_sparse.py:240-253).
    """
    import inspect
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from bevgen_tpu.models.stage2.ar import ar_loss

    sig_params = inspect.signature(shard_map).parameters
    sm_kwargs = ({"check_vma": False} if "check_vma" in sig_params
                 else {"check_rep": False})
    baxes = shd.batch_axes(mesh)
    bspec = P(baxes)
    rep = P()

    def local_grads(variables, tokens, cond, ii, ei):
        rest = {k: v for k, v in variables.items() if k != "params"}
        loss, grads = jax.value_and_grad(
            lambda p: ar_loss(model, {"params": p, **rest}, tokens, cond,
                              ii, ei, deterministic=True))(
                                  variables["params"])
        # equal per-shard batch sizes (shard_batch pads/validates), so
        # the global mean is the mean of shard means
        loss = jax.lax.pmean(loss, baxes)
        grads = jax.lax.pmean(grads, baxes)
        return loss, grads

    grads_fn = shard_map(
        local_grads, mesh=mesh,
        in_specs=(rep, bspec, bspec, bspec, bspec),
        out_specs=(rep, rep), **sm_kwargs)

    def train_step(state: ARTrainState, batch):
        loss, grads = grads_fn(state.params, batch["tokens"],
                               batch["cond_ids"], batch["intrinsics_inv"],
                               batch["extrinsics_inv"])
        inner = state.params["params"]
        updates, opt_state = tx.update(grads, state.opt_state, inner)
        new_inner = optax.apply_updates(inner, updates)
        params = dict(state.params, params=new_inner)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return ARTrainState(state.step + 1, params, opt_state), metrics

    rep_sh = NamedSharding(mesh, rep)
    batch_sh = NamedSharding(mesh, P(baxes))
    jitted = jax.jit(train_step,
                     in_shardings=(rep_sh, batch_sh),
                     out_shardings=(rep_sh, rep_sh),
                     donate_argnums=(0,))
    sharded_state = jax.device_put(state, rep_sh)
    return jitted, sharded_state
