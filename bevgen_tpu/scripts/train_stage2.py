"""Stage-2 MaskGit training CLI.

  python -m bevgen_tpu.scripts.train_stage2 preset=argoverse_muse \
      steps=1000 batch_size=8 tokens_dir=/data/tokens dp=4 tp=2 \
      ckpt_dir=ckpts base_lr=1e-4

Token source: `tokens_dir` (pre-tokenized shards, data/tokens.py) or
fake random tokens (`fake=true`, default when no dir given). Runs the
sharded train step (DP batch + TP attention/FFN + ZeRO moments) over a
(dp, tp) mesh, EMA, wall-clock + step checkpointing, metric logging.
"""
from __future__ import annotations

import json
import time

import numpy as np

from bevgen_tpu.scripts import cli


def main(argv=None):
    args = cli.parse_argv(argv)
    args = cli.setup_platform(args)
    cfg, args = cli.build_config(args)

    import jax
    import jax.numpy as jnp
    from bevgen_tpu.data import datamodule as dm
    from bevgen_tpu.models import geometry
    from bevgen_tpu.models.stage2.maskgit import MaskGit
    from bevgen_tpu.parallel import sharding as shd
    from bevgen_tpu.training import optim, trainer
    from bevgen_tpu.training.checkpoints import CheckpointManager

    tf = cfg.transformer
    steps = int(args.pop("steps", 1000))
    # batch_size is a PipelineConfig field, so `batch_size=N` lands in cfg
    batch_size = cfg.batch_size or 8
    tokens_dir = args.pop("tokens_dir", None)
    val_tokens_dir = args.pop("val_tokens_dir", None)
    eval_every = int(args.pop("eval_every", 0))
    base_lr = float(args.pop("base_lr", 1e-4))
    accumulate = int(args.pop("accumulate", 1))
    # ema_warmup=true ramps the EMA decay from 0 for from-scratch runs
    # (default: the reference's fixed decay, ema.py:148-151)
    ema_warmup = args.pop("ema_warmup", "false").lower() == "true"
    # eval_ema=true (default): run validation with the EMA weight tree,
    # matching the reference EMA callback's swap-for-val/test behavior
    # (modules/stage2/ema.py:94-146)
    eval_ema = args.pop("eval_ema", "true").lower() == "true"
    # reference LR rule: accumulate x devices x per-device-batch x base_lr
    # (generate.py:58). Our batch_size is the GLOBAL batch (the loader
    # yields it whole and shard_batch splits it over dp), so the device
    # count is already inside it — scale by accumulate x global batch.
    if args.pop("scale_lr", "false").lower() == "true":
        base_lr = optim.scaled_lr(base_lr, batch_size,
                                  accumulate_steps=accumulate)
        print(f"scaled base_lr -> {base_lr:.3g}")
    warmup = int(args.pop("warmup_steps", 500))
    ckpt_dir = args.pop("ckpt_dir", None)
    ckpt_minutes = float(args.pop("ckpt_minutes", 30))
    # ckpt_async=true writes checkpoints from a background worker so
    # the loop only pays the host snapshot
    ckpt_async = args.pop("ckpt_async", "false").lower() == "true"
    log_every = int(args.pop("log_every", 50))
    dp = args.pop("dp", None)
    tp = int(args.pop("tp", 1))
    # dcn>1 builds a multi-slice (dcn, dp, tp) mesh: grads cross the DCN
    # once per step, everything else rides ICI. dcn=auto groups devices
    # by slice_index (the real multi-slice job path).
    dcn = args.pop("dcn", "1")
    seed = int(args.pop("seed", cfg.seed))
    if args:
        print(f"[train_stage2] ignoring unknown args: {sorted(args)}")

    if dcn == "auto":
        mesh = shd.make_multislice_mesh(tp=tp)
    else:
        mesh = shd.make_mesh(dp=int(dp) if dp else None, tp=tp,
                             dcn=int(dcn))
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")
    if batch_size % shd.data_parallelism(mesh) != 0:
        raise SystemExit(
            f"batch_size={batch_size} must be divisible by the total "
            f"data-parallel ways dcn*dp={shd.data_parallelism(mesh)} "
            f"(mesh {dict(mesh.shape)})")

    model = MaskGit(tf, cfg.muse, dtype=jnp.dtype(cfg.dtype))

    # ---- data ------------------------------------------------------------
    def fake_batches():
        rng = np.random.default_rng(seed)
        ii, ei = geometry.canonical_rig_inverses(tf, batch_size)
        while True:
            yield {
                "tokens": rng.integers(
                    0, tf.vocab_size,
                    (batch_size, tf.num_cams, tf.num_cam_tokens)).astype(np.int32),
                "cond_ids": rng.integers(
                    0, tf.cond_vocab_size,
                    (batch_size, tf.num_cond_tokens)).astype(np.int32),
                "intrinsics_inv": ii, "extrinsics_inv": ei,
            }

    if tokens_dir:
        from bevgen_tpu.data.tokens import TokenDataset
        ds = TokenDataset(tokens_dir)
        loader = dm.DataLoader(ds, batch_size, shuffle=True, seed=seed,
                               num_workers=2)

        def epochs():
            while True:
                for b in loader:
                    b.pop("sample_token", None)
                    b["tokens"] = b["tokens"].reshape(
                        batch_size, tf.num_cams, -1)
                    yield b
        batches = epochs()
    else:
        batches = fake_batches()

    # ---- state -----------------------------------------------------------
    sample = next(batches)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.asarray(sample["tokens"]),
                        jnp.asarray(sample["cond_ids"]),
                        jnp.asarray(sample["intrinsics_inv"]),
                        jnp.asarray(sample["extrinsics_inv"]),
                        method=MaskGit.init_all)
    # the schedule ticks once per APPLIED update (optax.MultiSteps), and
    # the loop runs `steps` micro-batches -> steps//accumulate updates
    tx = optim.maskgit_optimizer(base_lr, warmup_steps=warmup,
                                 total_steps=max(1, steps // accumulate),
                                 accumulate_steps=accumulate,
                                 params_example=params["params"])
    state = trainer.create_train_state(params, tx)

    # resume: restore the latest params checkpoint if present
    if ckpt_dir:
        from bevgen_tpu.training.checkpoints import CheckpointManager as _CM
        probe = _CM(ckpt_dir, ckpt_minutes)
        restored = probe.restore_latest(
            jax.tree_util.tree_map(np.asarray, state.params))
        if restored is not None:
            restored = jax.tree_util.tree_map(jnp.asarray, restored)
            # Re-seed the EMA too: create_train_state initialized it from
            # the RANDOM init params, and with decay 0.9999 a resumed
            # run's EMA would stay dominated by that noise for ~10k
            # updates. Prefer a saved -EMA sibling of the restored tag.
            import os as _os
            ema_params = restored["params"]
            tag = probe.latest()
            if tag and _os.path.isdir(tag + "-EMA"):
                from bevgen_tpu.core import checkpoint as _ckpt_io
                ema_tree = _ckpt_io.restore_checkpoint(
                    tag + "-EMA", jax.tree_util.tree_map(
                        np.asarray, ema_params))
                ema_params = jax.tree_util.tree_map(jnp.asarray, ema_tree)
                print(f"resumed EMA from {tag}-EMA")
            state = state._replace(params=restored,
                                   ema=optim.ema_init(ema_params))
            print(f"resumed params from {tag}")

    step_fn, state = trainer.make_sharded_train_step(model, tx, mesh, state,
                                                     ema_every=accumulate,
                                                     ema_warmup=ema_warmup)

    mgr = (CheckpointManager(ckpt_dir, ckpt_minutes, async_save=ckpt_async)
           if ckpt_dir else None)
    rng = jax.random.PRNGKey(seed + 1)

    # validation: mean masked-CE over a held-out token set
    val_batches = None
    if val_tokens_dir and eval_every:
        from bevgen_tpu.data.tokens import TokenDataset
        from bevgen_tpu.models.stage2.maskgit import maskgit_loss
        vds = TokenDataset(val_tokens_dir)
        vloader = dm.DataLoader(vds, batch_size, shuffle=False,
                                num_workers=0)

        @jax.jit
        def val_loss(params, batch, vrng):
            out = maskgit_loss(model, params, vrng, batch["tokens"],
                               batch["cond_ids"], batch["intrinsics_inv"],
                               batch["extrinsics_inv"])
            return out.ce_loss

        def run_validation(params):
            losses, vrng = [], jax.random.PRNGKey(0)
            for vb in vloader:
                vb.pop("sample_token", None)
                vb["tokens"] = vb["tokens"].reshape(
                    -1, tf.num_cams, tf.num_cam_tokens)
                vrng, k = jax.random.split(vrng)
                losses.append(float(val_loss(
                    params, {kk: jnp.asarray(v) for kk, v in vb.items()}, k)))
            return float(np.mean(losses)) if losses else float("nan")
        val_batches = run_validation

    from bevgen_tpu.training.preemption import PreemptionGuard

    t0 = time.perf_counter()
    last_step = 0
    with mesh, PreemptionGuard() as guard:
        for i in range(steps):
            batch = shd.shard_batch(
                {k: np.asarray(v) for k, v in next(batches).items()}, mesh)
            state, metrics = step_fn(state, batch, rng)
            last_step = i + 1
            if (i + 1) % log_every == 0 or i == 0:
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                m["steps_per_sec"] = round((i + 1) / dt, 3)
                print(json.dumps({"step": i + 1, **m}))
            if mgr is not None:
                # save_step no-ops (and must not touch the device) until
                # the wall-clock interval elapses; _save host-transfers
                # lazily. Keep the -EMA sibling in lockstep so a resume
                # can restore both.
                if mgr.save_step(i + 1, state.params):
                    mgr.save_ema(i + 1, state.ema.params)
            if val_batches is not None and (i + 1) % eval_every == 0:
                # EMA weights for validation (reference ema.py:94-146)
                vparams = state.ema.params if eval_ema else state.params
                print(json.dumps({"step": i + 1,
                                  "val_ce": round(val_batches(vparams), 4),
                                  "val_ema": eval_ema}))
            if guard.should_stop:
                print(json.dumps({"step": last_step, "preempted": True}))
                break
    if mgr is not None:
        # tag = COMPLETED steps: a preemption before the first step must
        # not label the untrained state as step_{steps}
        mgr.save_step(last_step, state.params, force=True)
        mgr.save_ema(last_step, state.ema.params)
        mgr.wait()
    print("done")


if __name__ == "__main__":
    main()
