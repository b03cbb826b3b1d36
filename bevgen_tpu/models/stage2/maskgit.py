"""MaskGIT: iterative masked-token generation + training objective.

TPU-native re-design of the reference `MaskGit`
(modules/stage2/muse_maskgit_pytorch.py:467-729):

  * `generate` is ONE jitted `lax.scan` over the decode steps — per
    step, the FAITHFUL default runs just two 1x-batch transformer
    forwards (demask + critic): the reference's classifier-free
    guidance is training-gated and therefore a NO-OP in its eval-mode
    generate, and its SelfCritic discards the null pass — see
    cfg_logits/cfg_critic. The final step's critic forward is also
    peeled off (its scores feed nothing). The reference spends 4
    sequential python-loop forwards per step computing the same numbers.
    MuseConfig.real_cfg=True opts into ACTUAL guidance (cond+null
    batched at 2x batch, mixed by cond_scale).
  * the dynamic "mask the k lowest-scored tokens" (k varies per step)
    is rank-based: sort once, compare ranks against the traced k —
    static shapes, no dynamic top-k.
  * training loss: cosine-schedule random masking per camera image,
    CE on masked positions, optional self-critic BCE.

Semantics matched step-for-step to the reference, including:
  score initialization at 0, per-camera mask budgets `max(1, ...)`,
  temperature annealed by steps-remaining/T, critic noise decayed the
  same way, and non-critic scores pinned to -1e5 on unmasked tokens.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bevgen_tpu.core.config import MultiViewConfig, MuseConfig
from bevgen_tpu.models.stage2.transformer import (MultiViewTransformer,
                                                  SelfCriticHead,
                                                  TransformerOutput)

Dtype = Any


class MaskGit(nn.Module):
    """Transformer + optional self-critic head as one parameter tree.
    `mesh`: shard_map the attention cores for multi-chip SPMD."""
    cfg: MultiViewConfig
    muse: MuseConfig
    dtype: Dtype = jnp.float32
    mesh: Any = None

    def setup(self):
        assert not (self.muse.self_token_critic and self.muse.token_critic), \
            "self_token_critic and token_critic are mutually exclusive " \
            "(muse_maskgit_pytorch.py:496)"
        self.transformer = MultiViewTransformer(self.cfg, self.dtype,
                                                mesh=self.mesh,
                                                name="transformer")
        if self.muse.self_token_critic:
            self.critic = SelfCriticHead(self.dtype, name="critic")
        if self.muse.token_critic:
            # separate critic transformer with a scalar head
            # (TokenCritic, muse_maskgit_pytorch.py:423-426)
            self.token_critic = MultiViewTransformer(
                self.cfg, self.dtype, mesh=self.mesh, dim_out=1,
                add_mask_id=False, name="token_critic")

    def __call__(self, ids, cond_ids, intrinsics_inv, extrinsics_inv,
                 cond_keep=None, deterministic: bool = True,
                 self_cond_embed=None, cache=None):
        return self.transformer(ids, cond_ids, intrinsics_inv, extrinsics_inv,
                                cond_keep, deterministic,
                                self_cond_embed=self_cond_embed, cache=cache)

    def critic_logits(self, ids, cond_ids, intrinsics_inv, extrinsics_inv,
                      cond_keep=None, deterministic: bool = True, cache=None):
        b, cam, hw = ids.shape
        if self.muse.token_critic:
            out = self.token_critic(ids, cond_ids, intrinsics_inv,
                                    extrinsics_inv, cond_keep, deterministic,
                                    cache=cache)
            return out.logits[..., 0]
        out = self.transformer(ids, cond_ids, intrinsics_inv, extrinsics_inv,
                               cond_keep, deterministic, cache=cache)
        return self.critic(out.embed).reshape(b, cam, hw)

    def build_cache(self, cond_ids, intrinsics_inv, extrinsics_inv):
        """Step-invariant decode cache (see MultiViewTransformer): one
        dict per transformer ('gen', and 'critic' for the TokenCritic
        variant), built once per generate and replayed into all ~35
        decode forwards."""
        b = cond_ids.shape[0]
        cfg = self.cfg
        dummy = jnp.zeros((b, cfg.num_cams, cfg.num_cam_tokens), jnp.int32)
        gen = self.transformer(dummy, cond_ids, intrinsics_inv,
                               extrinsics_inv, return_cache=True)
        crit = None
        if self.muse.token_critic:
            crit = self.token_critic(dummy, cond_ids, intrinsics_inv,
                                     extrinsics_inv, return_cache=True)
        return {"gen": gen, "critic": crit}

    def init_all(self, ids, cond_ids, intrinsics_inv, extrinsics_inv):
        """Touch every submodule so `init` creates the full param tree."""
        out = self.transformer(ids, cond_ids, intrinsics_inv, extrinsics_inv)
        if self.muse.self_token_critic:
            self.critic(out.embed)
        if self.muse.token_critic:
            self.token_critic(ids, cond_ids, intrinsics_inv, extrinsics_inv)
        return out


# ---------------------------------------------------------------------------
# classifier-free-guided forwards (cond+null batched)
# ---------------------------------------------------------------------------


def _cfg_batch(x):
    return jnp.concatenate([x, x], axis=0)


def cfg_logits(model: MaskGit, params, ids, cond_ids, ii, ei,
               cond_scale: float, self_cond_embed=None,
               real_cfg: bool = False, cache=None):
    """Decode-step logits. Returns (logits, cond_embed); cond_embed
    feeds the next step's self-conditioning
    (muse_maskgit_pytorch.py:576-585).

    Default (faithful): ONE cond-only forward. The reference's
    forward_with_cond_scale (muse_maskgit_pytorch.py:262-281) does run a
    second "null" forward with cond_drop_prob=1, but the drop is gated
    on `self.training` (:353-355) and generate() runs under
    eval_decorator — the null forward sees the full condition, so
    `null + (cond - null) * scale` cancels to the cond logits exactly.
    We skip the forward the reference throws away (halving the
    demask-pass FLOPs) and return bit-equal logits.

    real_cfg=True: ACTUAL classifier-free guidance — cond+null batched
    into one 2x-batch forward with the null half's condition dropped to
    the learned null-KV, mixed by cond_scale. A deliberate deviation
    (MuseConfig.real_cfg)."""
    if not real_cfg:
        out: TransformerOutput = model.apply(
            params, ids, cond_ids, ii, ei, cond_keep=None,
            self_cond_embed=self_cond_embed, cache=cache)
        return out.logits.astype(jnp.float32), out.embed
    b = ids.shape[0]
    keep = jnp.concatenate([jnp.ones((b,), bool), jnp.zeros((b,), bool)])
    sc = (_cfg_batch(self_cond_embed) if self_cond_embed is not None
          else None)
    out: TransformerOutput = model.apply(
        params, _cfg_batch(ids), _cfg_batch(cond_ids), _cfg_batch(ii),
        _cfg_batch(ei), cond_keep=keep, self_cond_embed=sc)
    logits = out.logits.astype(jnp.float32)
    cond, null = logits[:b], logits[b:]
    return null + (cond - null) * cond_scale, out.embed[:b]


def cfg_critic(model: MaskGit, params, ids, cond_ids, ii, ei,
               cond_scale: float, real_cfg: bool = False, cache=None):
    """Critic scores for re-masking (muse_maskgit_pytorch.py:602-607).

    Faithful semantics are cond-only in BOTH critic modes:
      * SelfCritic.forward_with_cond_scale (:393-395) returns
        to_pred(embed) where the embed comes from the COND pass only
        (forward_with_cond_scale's return_embed path, :272-279) — the
        null forward's result is discarded for scores, in training and
        eval alike.
      * TokenCritic.forward_with_cond_scale does mix its scalar logits,
        but the null forward's cond-drop is training-gated (:353-355)
        and generate() runs in eval — the mix cancels to the cond
        logits exactly.
    So the default runs ONE cond forward at 1x batch. real_cfg=True
    additionally CFG-mixes the TokenCritic scores with a real null pass
    (SelfCritic scores stay cond-only even upstream of the gate)."""
    if model.muse.token_critic and real_cfg:
        b = ids.shape[0]
        keep = jnp.concatenate([jnp.ones((b,), bool),
                                jnp.zeros((b,), bool)])
        scores = model.apply(
            params, _cfg_batch(ids), _cfg_batch(cond_ids), _cfg_batch(ii),
            _cfg_batch(ei), cond_keep=keep, method=MaskGit.critic_logits)
        scores = scores.astype(jnp.float32)
        cond, null = scores[:b], scores[b:]
        return null + (cond - null) * cond_scale
    crit_cache = ((cache["critic"] if model.muse.token_critic
                   else cache["gen"]) if cache is not None else None)
    scores = model.apply(params, ids, cond_ids, ii, ei,
                         method=MaskGit.critic_logits, cache=crit_cache)
    return scores.astype(jnp.float32)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def _rank_desc(scores):
    """rank[i] = position of element i in a descending sort of `scores`
    (last axis). rank < k  <=>  element is in the top-k."""
    order = jnp.argsort(-scores, axis=-1)
    return jnp.argsort(order, axis=-1)


def gumbel_sample(rng, logits, temperature):
    g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits / jnp.maximum(temperature, 1e-10) + g, axis=-1)


def top_k_filter(logits, thres: float):
    """Keep the top ceil((1-thres)*V) logits, -inf elsewhere
    (muse_maskgit_pytorch.py:453-458).

    jax.lax.top_k drags an s32 iota payload through a stable variadic
    sort for indices this filter never uses (7.3 ms/step at the b16
    decode shape) — but the values-only jnp.sort alternative MEASURED
    SLIGHTLY SLOWER on TPU (156 vs 133 ms/b16-generate; XLA's TopK
    emitter beats its generic sort even with the dead payload), so
    top_k stays."""
    v = logits.shape[-1]
    k = max(1, math.ceil((1 - thres) * v))
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def generate(model: MaskGit, params, cond_ids, intrinsics_inv, extrinsics_inv,
             rng, init_ids: Optional[jnp.ndarray] = None,
             timesteps: Optional[int] = None,
             force_not_use_token_critic: bool = False,
             can_remask_prev_masked: bool = False,
             return_trajectory: bool = False):
    """Iteratively decode image tokens for every camera.

    Args:
      cond_ids: (b, num_cond) int32 BEV tokens.
      intrinsics_inv / extrinsics_inv: (b, cam, 3, 3) / (b, cam, 4, 4).
      init_ids: optional (b, cam, hw) with mask_id at positions to
        generate (partial decoding, cond_transformer_multi_view_muse.py:125).
      force_not_use_token_critic: serve a critic-trained checkpoint with
        confidence-based re-masking instead of the critic pass — drops
        one of the two transformer forwards per step
        (muse_maskgit_pytorch.py:521,556).
      can_remask_prev_masked: in the confidence (non-critic) scoring
        path, let already-committed tokens compete for re-masking
        instead of pinning them to -1e5
        (muse_maskgit_pytorch.py:613-617) — only meaningful for
        checkpoints trained with no_mask_token_prob > 0.
      return_trajectory: additionally return the (T, b, cam, hw) int32
        post-commit ids after EVERY decode step (the fidelity dossier
        compares bf16-vs-int8 decode trajectories step by step —
        docs/FIDELITY.md).
    Returns: (b, cam, h, w) int32 codebook indices, or
      (ids, trajectory) when return_trajectory.
    """
    cfg, muse = model.cfg, model.muse
    use_critic = ((muse.self_token_critic or muse.token_critic)
                  and not force_not_use_token_critic)
    if can_remask_prev_masked and not use_critic:
        # same guard as the reference (muse_maskgit_pytorch.py:616-617)
        assert muse.no_mask_token_prob > 0.0, (
            "without training with some of the non-masked tokens forced "
            "to predict, not sure if the logits will be meaningful for "
            "these token")
    T = timesteps or muse.sample_iterations
    b = cond_ids.shape[0]
    cam, hw = cfg.num_cams, cfg.num_cam_tokens
    mask_id = cfg.mask_token_id

    ids = jnp.full((b, cam, hw), mask_id, dtype=jnp.int32)
    scores = jnp.zeros((b, cam, hw), dtype=jnp.float32)
    # self-conditioning carry: previous step's cond-pass embeddings
    # (zeros at step 0 — muse_maskgit_pytorch.py:562,576-585)
    sc_embed = (jnp.zeros((b, cfg.num_img_tokens, cfg.num_embed),
                          jnp.float32) if cfg.self_cond else None)
    if init_ids is not None:
        keep_init = init_ids != mask_id
    else:
        keep_init = None

    # per-step schedules (static)
    ts = np.linspace(0.0, 1.0, T)
    num_masked = np.maximum((np.cos(ts * np.pi / 2) * hw).astype(np.int64), 1)
    steps_until = np.arange(T - 1, -1, -1, dtype=np.float32)
    temps = muse.temperature * (steps_until / T)
    noise = muse.critic_noise_scale * (steps_until / T)

    xs = dict(k=jnp.asarray(num_masked, jnp.int32),
              temp=jnp.asarray(temps, jnp.float32),
              noise=jnp.asarray(noise, jnp.float32),
              rngs=jax.random.split(rng, T))

    # step-invariant decode cache: ray embedding, BEV context, camera
    # bias, per-layer cross-attention K/V — built ONCE, closed over by
    # the scan body (the reference recomputes it every forward). The
    # real-CFG path runs at 2x batch with a dropped-cond half, which the
    # 1x cache does not represent — it keeps the uncached path.
    dec_cache = (None if muse.real_cfg else model.apply(
        params, cond_ids, intrinsics_inv, extrinsics_inv,
        method=MaskGit.build_cache))
    gen_cache = dec_cache["gen"] if dec_cache is not None else None

    def body(carry, step, last=False):
        ids, scores, sc = carry
        rng_s, rng_g, rng_n = jax.random.split(step["rngs"], 3)

        rank = _rank_desc(scores)
        ids = jnp.where(rank < step["k"], mask_id, ids)
        if keep_init is not None:
            ids = jnp.where(keep_init, init_ids, ids)

        logits, embed = cfg_logits(model, params, ids, cond_ids,
                                   intrinsics_inv, extrinsics_inv,
                                   muse.cond_scale, self_cond_embed=sc,
                                   real_cfg=muse.real_cfg, cache=gen_cache)
        if cfg.self_cond:
            sc = embed.astype(jnp.float32)
        filtered = top_k_filter(logits, muse.topk_filter_thres)
        pred = gumbel_sample(rng_g, filtered, step["temp"]).astype(jnp.int32)

        is_mask = ids == mask_id
        ids = jnp.where(is_mask, pred, ids)

        if last:
            # the final step's scores feed nothing (they only select the
            # NEXT step's re-masking) — skip the dead critic forward.
            # Output-identical to the reference, which uniformly runs it
            # (muse_maskgit_pytorch.py:601-611) and discards the result.
            return (ids, scores, sc), (ids if return_trajectory else None)
        if use_critic:
            scores = cfg_critic(model, params, ids, cond_ids, intrinsics_inv,
                                extrinsics_inv, muse.cond_scale,
                                real_cfg=muse.real_cfg, cache=dec_cache)
            u = jax.random.uniform(rng_n, scores.shape, jnp.float32)
            scores = scores + (u - 0.5) * step["noise"]
        else:
            probs = jax.nn.softmax(logits, axis=-1)
            chosen = jnp.take_along_axis(probs, pred[..., None], axis=-1)[..., 0]
            scores = 1.0 - chosen
            if not can_remask_prev_masked:
                scores = jnp.where(is_mask, scores, -1e5)
        return (ids, scores, sc), (ids if return_trajectory else None)

    # scan the first T-1 steps; peel the last (no score computation)
    head = jax.tree_util.tree_map(lambda x: x[:-1], xs)
    tail = jax.tree_util.tree_map(lambda x: x[-1], xs)
    carry, traj = jax.lax.scan(body, (ids, scores, sc_embed), head)
    (ids, _, _), last_ids = body(carry, tail, last=True)
    h, w = cfg.cam_latent_res
    out = ids.reshape(b, cam, h, w)
    if return_trajectory:
        return out, jnp.concatenate([traj, last_ids[None]], axis=0)
    return out


# ---------------------------------------------------------------------------
# training objective
# ---------------------------------------------------------------------------

class MaskGitLoss(NamedTuple):
    loss: jnp.ndarray
    ce_loss: jnp.ndarray
    critic_loss: jnp.ndarray


def masked_cross_entropy(logits, labels, ignore_index: int = -1):
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def maskgit_loss(model: MaskGit, params, rng, tokens, cond_ids,
                 intrinsics_inv, extrinsics_inv,
                 mask_override=None) -> MaskGitLoss:
    """Training loss (muse_maskgit_pytorch.py:629-729).

    tokens: (b, cam, hw) ground-truth codebook indices.
    Cosine-schedule random masking drawn independently per camera image;
    CE on masked positions; self-critic BCE on resampled fakes.
    mask_override: optional (b, cam, hw) bool — replace the random
    cosine-schedule mask (deterministic parity tests against the
    executed reference, which draws its mask from torch RNG).
    """
    cfg, muse = model.cfg, model.muse
    b, cam, hw = tokens.shape
    mask_id = cfg.mask_token_id
    # one up-front split: jax.random.split(k, n) prefixes coincide across
    # different n, so re-splitting the same base key would alias streams
    (r_t, r_perm, r_drop, r_temp, r_gum, r_drop2, r_sub, r_do1,
     r_do2, r_sc) = jax.random.split(rng, 10)

    t = jax.random.uniform(r_t, (b, cam))
    mask_prob = jnp.cos(t * jnp.pi / 2)
    num_masked = jnp.clip(jnp.round(hw * mask_prob), 1, hw)       # (b,cam)

    noise = jax.random.uniform(r_perm, (b, cam, hw))
    rank = _rank_desc(-noise)                                     # random perm rank
    mask = rank < num_masked[..., None]
    if mask_override is not None:
        mask = jnp.asarray(mask_override, bool)

    labels = jnp.where(mask, tokens, -1)

    if muse.no_mask_token_prob > 0.0:
        # keep a random `prob` fraction of the masked positions at their
        # ORIGINAL token while still predicting them — labels computed
        # above retain these positions (muse_maskgit_pytorch.py:671-675).
        # We use a proper rank-based subset of the masked positions; the
        # reference's get_mask_subset_prob (:45-58) uses a single argsort
        # where a rank computation needs two, a training-time RNG quirk
        # with no checkpoint impact, so it is not reproduced.
        sub_noise = jnp.where(mask, jax.random.uniform(r_sub, mask.shape),
                              -1.0)
        sub_rank = _rank_desc(sub_noise)
        num_keep = mask.sum(-1, keepdims=True) * muse.no_mask_token_prob
        mask = mask & ~(sub_rank < num_keep)

    x = jnp.where(mask, mask_id, tokens).astype(jnp.int32)

    # self-conditioning: a no-grad pre-forward's embeddings feed the
    # main forward with probability self_cond_prob
    # (muse_maskgit_pytorch.py:677-692); the "off" branch multiplies to
    # the zeros embedding the reference uses when None
    sc_embed = None
    if cfg.self_cond:
        def _pre_forward(_):
            pre: TransformerOutput = model.apply(
                params, x, cond_ids, intrinsics_inv, extrinsics_inv,
                cond_keep=None, deterministic=True)
            return jax.lax.stop_gradient(pre.embed.astype(jnp.float32))

        embed_sd = jax.eval_shape(_pre_forward, None)
        flag = jax.random.uniform(r_sc, ()) < muse.self_cond_prob
        # lax.cond executes ONE branch under jit: the (1 - prob)
        # fraction of steps skips the whole extra transformer forward,
        # like the reference's python-level branch (:677-692)
        sc_embed = jax.lax.cond(
            flag, _pre_forward,
            lambda _: jnp.zeros(embed_sd.shape, embed_sd.dtype), None)

    cond_keep = jax.random.uniform(r_drop, (b,)) >= muse.cond_drop_prob
    out: TransformerOutput = model.apply(
        params, x, cond_ids, intrinsics_inv, extrinsics_inv,
        cond_keep=cond_keep, deterministic=False,
        rngs={"dropout": r_do1}, self_cond_embed=sc_embed)
    ce = masked_cross_entropy(out.logits, labels)

    if not (muse.self_token_critic or muse.token_critic):
        return MaskGitLoss(ce, ce, jnp.zeros_like(ce))

    temp = jax.random.uniform(r_temp, ())
    sampled = gumbel_sample(r_gum, out.logits.astype(jnp.float32), temp)
    critic_input = jnp.where(mask, sampled.astype(jnp.int32), x)
    critic_labels = (tokens != critic_input).astype(jnp.float32)

    cond_keep2 = jax.random.uniform(r_drop2, (b,)) >= muse.cond_drop_prob
    critic_logits = model.apply(
        params, critic_input, cond_ids, intrinsics_inv, extrinsics_inv,
        cond_keep=cond_keep2, deterministic=False,
        rngs={"dropout": r_do2},
        method=MaskGit.critic_logits).astype(jnp.float32)

    bce = jnp.mean(
        jnp.maximum(critic_logits, 0) - critic_logits * critic_labels +
        jnp.log1p(jnp.exp(-jnp.abs(critic_logits))))

    total = ce + muse.critic_loss_weight * bce
    return MaskGitLoss(total, ce, bce)
