"""Stage-1 VQ autoencoder training CLI.

  python -m bevgen_tpu.scripts.train_stage1 preset=argoverse_muse \
      model=cam|bev steps=1000 batch_size=8 base_lr=4.5e-6 \
      ckpt_dir=ckpts [disc=true perceptual_weights=lpips.npz]

model=cam trains the RGB VQ-GAN (optionally with PatchGAN + LPIPS);
model=bev trains the segmentation VQ-VAE with BCE. Data: real
Argoverse images when ARGOVERSE_DATA_DIR is set, else the fake fixture.
LR scaling follows the global-batch form of the reference rule
(generate.py:58): batch x base_lr — batch_size is already the global
image batch of this single-program loop, so no device factor.
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
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.models.discriminator import NLayerDiscriminator
    from bevgen_tpu.models.stage1.vq import VQModel, VQSegmentationModel
    from bevgen_tpu.training import stage1_trainer
    from bevgen_tpu.training.checkpoints import CheckpointManager

    which = args.pop("model", "cam")
    steps = int(args.pop("steps", 100))
    batch_size = cfg.batch_size or 4
    base_lr = float(args.pop("base_lr", cfg.base_lr))
    use_disc = args.pop("disc", "true" if which == "cam" else "false"
                        ).lower() == "true"
    perceptual_npz = args.pop("perceptual_weights", None)
    ckpt_dir = args.pop("ckpt_dir", None)
    log_every = int(args.pop("log_every", 20))
    image_every = int(args.pop("image_every", 0))
    run_dir = args.pop("run_dir", "output/stage1")
    seed = int(args.pop("seed", cfg.seed))
    augment = args.pop("augment", "true").lower() == "true"
    if args:
        print(f"[train_stage1] ignoring unknown args: {sorted(args)}")

    s1cfg = cfg.first_stage if which == "cam" else cfg.cond_stage
    model = (VQModel if which == "cam" else VQSegmentationModel)(s1cfg)
    # reference LR rule (generate.py:58); batch_size here is the global
    # batch of this single-program loop, so no device factor
    from bevgen_tpu.training.optim import scaled_lr
    lr = scaled_lr(base_lr, batch_size)
    print(f"lr = {lr:.3e} (base {base_lr} x batch {batch_size})")

    # cam training uses the single-camera PER-FRAME dataset mode (every
    # frame of every camera, BEV matched by lidar sync — reference
    # argoverse.py:307-333): one sample = one image, so scenes==images.
    # bev training needs one raster per synchronized sweep -> multi mode.
    scenes_per_batch = batch_size
    real_loader_obj = real_iter = None
    import os as _os
    if _os.environ.get("ARGOVERSE_DATA_DIR"):
        try:
            from bevgen_tpu.data import datamodule as dm
            from bevgen_tpu.data.argoverse import ArgoverseDataset
            ds = ArgoverseDataset(
                split="train", cam_res=s1cfg.cam_res,
                multi_camera=(which != "cam"),
                augment_cam_img=augment and which == "cam",
                augment_bev_img=augment and which == "bev",
                seed=seed)
            real_loader_obj = dm.DataLoader(ds, scenes_per_batch,
                                            shuffle=True, seed=seed,
                                            drop_last=True, num_workers=2)
            real_iter = iter(real_loader_obj)
            print(f"training on ArgoverseDataset ({len(ds)} samples, "
                  f"{'per-frame' if which == 'cam' else 'multi-camera'})")
        except FileNotFoundError as e:
            print(f"{e}; falling back to the fake fixture")

    def next_real():
        nonlocal real_iter
        try:
            return next(real_iter)
        except StopIteration:
            # re-iterate the SAME loader so its per-epoch reshuffle
            # (seeded by (seed, epoch)) advances
            real_iter = iter(real_loader_obj)
            return next(real_iter)

    batch_rng = np.random.default_rng(seed)

    def get_batch(i):
        fb = next_real() if real_iter is not None else fake_batch(
            cfg, scenes_per_batch, seed=seed + i)
        if which == "cam":
            img = np.asarray(fb["image"])
            flat = img.reshape((-1,) + img.shape[2:])   # (scenes*cams, ...)
            if flat.shape[0] > batch_size:
                # random image subset so EVERY camera gets trained on
                idx = batch_rng.choice(flat.shape[0], batch_size,
                                       replace=False)
                flat = flat[idx]
            return flat
        return fb["segmentation"]

    x0 = jnp.asarray(get_batch(0))
    lpips_fn = None
    if perceptual_npz:
        from bevgen_tpu.metrics.quality import LPIPSMetric
        from bevgen_tpu.data.camera_geometry import (ARGOVERSE_MEAN,
                                                     ARGOVERSE_STD)
        m = LPIPSMetric(perceptual_npz)
        if m.available:
            # x/xrec are Argoverse mean/std-normalized; the VGG head
            # expects [-1, 1]. Denormalize to [0, 1] first (no clip —
            # clipping would kill gradients on out-of-range xrec).
            def lpips_fn(a, b, _m=m):
                a = (a * ARGOVERSE_STD + ARGOVERSE_MEAN) * 2 - 1
                b = (b * ARGOVERSE_STD + ARGOVERSE_MEAN) * 2 - 1
                return _m.model.apply(_m.params, a, b)
        else:
            print(f"LPIPS weights not found at {perceptual_npz}; "
                  "training without perceptual loss")

    if which == "cam" and use_disc:
        disc = NLayerDiscriminator()
        state, tx_ae, tx_disc = stage1_trainer.create_stage1_state(
            model, disc, jax.random.PRNGKey(seed), x0, lr)
        step_fn = jax.jit(stage1_trainer.make_vqgan_train_step(
            model, disc, tx_ae, tx_disc, lpips_fn=lpips_fn,
            perceptual_weight=1.0 if lpips_fn else 0.0))
    else:
        state, tx_ae, _ = stage1_trainer.create_stage1_state(
            model, None, jax.random.PRNGKey(seed), x0, lr)
        if which == "bev":
            step_fn = jax.jit(stage1_trainer.make_seg_train_step(model, tx_ae))
        else:
            # no-disc RGB training: L1 + codebook loss (VQNoDiscModel path)
            import optax
            from bevgen_tpu.training import losses as L

            def loss_fn(p, x):
                xrec, qloss, _ = model.apply({"params": p}, x)
                out = L.dummy_loss(qloss, x, xrec)
                return out.loss, out.log

            def nd_step(state, x, rng):
                (loss, log), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params_ae["params"], x)
                upd, opt_ae = tx_ae.update(grads, state.opt_ae,
                                           state.params_ae["params"])
                new = optax.apply_updates(state.params_ae["params"], upd)
                return state._replace(step=state.step + 1,
                                      params_ae={"params": new},
                                      opt_ae=opt_ae), {**log, "loss": loss}
            step_fn = jax.jit(nd_step)

    from bevgen_tpu.training.preemption import PreemptionGuard

    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None
    t0 = time.perf_counter()
    last_step = 0
    guard = PreemptionGuard()
    with guard:
      for i in range(steps):
        if guard.should_stop:
            print(json.dumps({"step": last_step, "preempted": True}))
            break
        x = jnp.asarray(get_batch(i))
        state, metrics = step_fn(state, x, jax.random.PRNGKey(seed + i))
        last_step = i + 1
        if (i + 1) % log_every == 0 or i == 0:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            m["steps_per_sec"] = round((i + 1) / (time.perf_counter() - t0), 3)
            print(json.dumps({"step": i + 1, **m}))
        if image_every and (i + 1) % image_every == 0:
            # reconstruction viz (the reference's log_images,
            # vqgan.py:177-199 / :244-261)
            import numpy as _np
            from bevgen_tpu.utils.image import Im, make_grid
            from bevgen_tpu.utils.viz import viz_bev
            from bevgen_tpu.data.camera_geometry import denormalize_image
            rec, _, _ = model.apply(state.params_ae, x)
            if which == "cam":
                panel = make_grid(
                    [denormalize_image(_np.asarray(a, _np.float32))
                     for pair in zip(_np.asarray(x), _np.asarray(rec))
                     for a in pair], nrow=2)
            else:
                rec_bin = _np.round(1 / (1 + _np.exp(-_np.asarray(
                    rec, _np.float32))))
                panel = make_grid(
                    [viz_bev(a).np for pair in zip(_np.asarray(x), rec_bin)
                     for a in pair], nrow=2)
            Im(panel).save(f"{run_dir}/recon_{i + 1:06d}.png")
        if mgr is not None:
            # save_step only materializes the tree when the wall-clock
            # interval elapsed (_save does the np.asarray); transferring
            # here would stall every step on a full device->host copy.
            mgr.save_step(i + 1, state.params_ae)
    if mgr is not None:
        # tag = COMPLETED steps: a preemption before the first step must
        # not label the untrained state as step_{steps} — and at 0
        # completed steps there is nothing worth saving at all (a
        # step_00000000 tag would take the LATEST pointer away from any
        # real checkpoint of a previous run)
        if last_step > 0:
            mgr.save_step(last_step, state.params_ae, force=True)
        mgr.wait()
    print("done")


if __name__ == "__main__":
    main()
