"""Benchmark / profiling CLI — the reference scripts/inference.py
equivalent (fake-batch fwd / fwd+bwd timing, peak memory, traces).

  python -m bevgen_tpu.scripts.inference preset=argoverse_muse \
      mode=forward|train|decode batch_size=8 profile=true
"""
from __future__ import annotations

import json

import numpy as np

from bevgen_tpu.scripts import cli


def main(argv=None):
    args = cli.parse_argv(argv)
    args = cli.setup_platform(args)
    cfg, args = cli.build_config(args)

    import jax
    import jax.numpy as jnp
    from bevgen_tpu.models import geometry
    from bevgen_tpu.models.stage2.maskgit import (MaskGit, generate,
                                                  maskgit_loss)
    from bevgen_tpu.utils import profiling

    tf = cfg.transformer
    mode = args.pop("mode", "forward")
    # batch_size is a PipelineConfig field, so `batch_size=N` lands in cfg
    batch_size = cfg.batch_size or 8
    reps = int(args.pop("reps", 5))
    do_profile = args.pop("profile", "false").lower() == "true"
    trace_dir = args.pop("trace_dir", "output/trace")
    if args:
        print(f"[inference] ignoring unknown args: {sorted(args)}")

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(
        0, tf.vocab_size, (batch_size, tf.num_cams, tf.num_cam_tokens)),
        jnp.int32)
    cond = jnp.asarray(rng.integers(
        0, tf.cond_vocab_size, (batch_size, tf.num_cond_tokens)), jnp.int32)
    ii, ei = map(jnp.asarray,
                 geometry.canonical_rig_inverses(tf, batch_size))

    key = jax.random.PRNGKey(1)
    # NB: params are always ARGUMENTS of the jitted fns — closing over
    # them inlines hundreds of MB of constants into the program (see
    # docs/PERF_NOTES.md).
    if mode in ("forward", "train", "decode"):
        model = MaskGit(tf, cfg.muse, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), tokens, cond, ii, ei,
                            method=MaskGit.init_all)
        if mode == "forward":
            fn = jax.jit(lambda p, t: model.apply(p, t, cond, ii, ei).logits)
            run = lambda: fn(params, tokens)
        elif mode == "train":
            def loss(p, t, r):
                return maskgit_loss(model, p, r, t, cond, ii, ei).loss
            grad_fn = jax.jit(jax.grad(loss))
            run = lambda: grad_fn(params, tokens, key)
        else:
            fn = jax.jit(lambda p, c, r: generate(model, p, c, ii, ei, r))
            run = lambda: fn(params, cond, key)
    elif mode in ("stage1_train", "stage1_recon"):
        from bevgen_tpu.models.discriminator import NLayerDiscriminator
        from bevgen_tpu.models.stage1.vq import VQModel
        from bevgen_tpu.training import stage1_trainer
        s1 = VQModel(cfg.first_stage, dtype=jnp.bfloat16)
        H, W = cfg.first_stage.cam_res
        imgs = jnp.asarray(rng.normal(0, 1, (batch_size, H, W, 3)),
                           jnp.float32)
        if mode == "stage1_recon":
            p1 = s1.init(jax.random.PRNGKey(0), imgs[:1])
            fn = jax.jit(lambda p, x: s1.apply(p, x)[0])
            run = lambda: fn(p1, imgs)
        else:
            disc = NLayerDiscriminator(dtype=jnp.bfloat16)
            s1state, tx_ae, tx_disc = stage1_trainer.create_stage1_state(
                s1, disc, jax.random.PRNGKey(0), imgs[:1], lr=1e-4)
            step1 = jax.jit(stage1_trainer.make_vqgan_train_step(
                s1, disc, tx_ae, tx_disc))
            run = lambda: step1(s1state, imgs, key)
    elif mode in ("ar_train", "ar_decode", "ar_decode_int8",
                  "ar_decode_full"):
        from bevgen_tpu.models.stage2 import ar as ar_mod
        from bevgen_tpu.models.stage2.ar_cached import ar_sample_cached
        from bevgen_tpu.models.stage2.gpt import SparseGPT
        gpt = SparseGPT(tf, dtype=jnp.bfloat16)
        gparams = gpt.init(jax.random.PRNGKey(0), tokens, cond, ii, ei)
        if mode == "ar_decode_int8":
            # int8 weights halve the HBM traffic that bounds the
            # per-token GEMVs of cached decode (ops/quant.py)
            from bevgen_tpu.ops.quant import quantize_gpt_tree
            gparams = jax.tree_util.tree_map(
                jnp.asarray,
                {"params": quantize_gpt_tree(gparams["params"])})
            mode_impl = "ar_decode"
        else:
            mode_impl = mode
        if mode_impl == "ar_train":
            # fwd+bwd — comparable to the reference's
            # scripts/inference.py:170-179 density-sweep microbenchmarks
            def loss(p, t):
                return ar_mod.ar_loss(gpt, p, t, cond, ii, ei,
                                      deterministic=True)
            grad_fn = jax.jit(jax.grad(loss))
            run = lambda: grad_fn(gparams, tokens)
        elif mode_impl == "ar_decode":
            fn = jax.jit(lambda p, c, r: ar_sample_cached(
                gpt, p, c, ii, ei, r, top_k=100))
            run = lambda: fn(gparams, cond, key)
        else:
            fn = jax.jit(lambda p, c, r: ar_mod.ar_sample(
                gpt, p, c, ii, ei, r, top_k=100))
            run = lambda: fn(gparams, cond, key)
    else:
        raise SystemExit(f"unknown mode {mode}")

    stats = profiling.benchmark(run, reps=reps)
    if do_profile:
        with profiling.trace(trace_dir):
            run()
        stats["trace"] = trace_dir
    print(json.dumps({"mode": mode, "batch_size": batch_size,
                      **{k: round(v, 3) if isinstance(v, float) else v
                         for k, v in stats.items()}}))


if __name__ == "__main__":
    main()
