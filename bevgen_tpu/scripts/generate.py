"""Batch generation CLI — the reference `generate.py` equivalent.

Usage (mirrors README.md:64-75):

  python -m bevgen_tpu.scripts.generate preset=argoverse_muse \
      batch_size=4 eval_generate=/data/out ckpt_path=pretrained.ckpt \
      datamodule.split=val

Data source resolution order: `fake=N` (fake-batch fixture, no dataset
needed) > ARGOVERSE_DATA_DIR dataset. Outputs the reference-compatible
sample/ sample_gt/ bev.npz tree so metrics scripts run unchanged, and
resumes by skipping already-generated tokens.
"""
from __future__ import annotations

import json
import os
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
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.pipelines.generate import BEVGenPipeline
    from bevgen_tpu.training.checkpoints import load_weights
    from bevgen_tpu.utils.outputs import GenerationWriter

    batch_size = cfg.batch_size or 1  # `batch_size=N` lands in cfg
    fake = int(args.pop("fake", 0))
    save_dir = args.pop("eval_generate",
                        os.path.join(os.environ.get("SAVE_DATA_DIR", "output"),
                                     "eval_generate"))
    ckpt_path = args.pop("ckpt_path", None)
    # ema=true: evaluate with the -EMA weight tree (the reference swaps
    # EMA weights in for val/test, modules/stage2/ema.py:94-146)
    use_ema = args.pop("ema", "false").lower() == "true"
    seed = int(args.pop("seed", cfg.seed))
    split = args.pop("datamodule.split", "val")
    limit = int(args.pop("limit_batches", 0))
    layout = args.pop("layout", "argoverse")
    save_rec = args.pop("save_rec", "false").lower() == "true"
    # rand_str: random suffix per token so repeated runs into one dir
    # don't collide (reference README.md:95-97, utils/callback.py)
    rand_str = args.pop("rand_str", "false").lower() == "true"
    # mini_dataset=N: truncate the dataset (reference extras.mini_dataset)
    mini_dataset = int(args.pop("mini_dataset", 0)) or None
    # bev_dir_name: pre-generated raster tree name (reference README.md:47)
    bev_dir_name = args.pop("bev_dir_name", "bev_seg_full_11_14")
    # partial decoding: keep these cameras' GT tokens fixed and only
    # regenerate the rest (cond_transformer_multi_view_muse.py:125-132)
    keep_cameras = [c for c in args.pop("keep_cameras", "").split(",") if c]
    # pipeline=muse (default, MaskGit) | ar (KV-cached sparse GPT — the
    # reference's legacy cond_transformer_multi_view sampling path);
    # quant=int8 forces the int8 serving tree; quant=auto picks
    # int8/bf16 from the measured batch crossover
    pipeline = args.pop("pipeline", "muse")
    quant = args.pop("quant", "none")
    # multi-chip serving: dp/tp (+ dcn=N|auto for multi-slice jobs)
    # build a device mesh and run the whole decode SPMD
    # (pipelines.make_sharded_generate / make_sharded_ar_generate)
    dp = args.pop("dp", None)
    tp = int(args.pop("tp", 1))
    dcn = args.pop("dcn", "1")
    if args.pop("print_config", "true").lower() == "true":
        cli.print_config_tree(cfg, extra={
            "eval_generate": save_dir, "ckpt_path": ckpt_path,
            "pipeline": pipeline, "quant": quant, "split": split,
            "fake": fake})
    if args:
        print(f"[generate] ignoring unknown args: {sorted(args)}")

    if pipeline == "ar":
        from bevgen_tpu.pipelines.ar_generate import ARPipeline
        pipe = ARPipeline.create(cfg, dtype=jnp.bfloat16)
    else:
        pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
    params = pipe.init_params(jax.random.PRNGKey(seed))
    if ckpt_path:
        if use_ema:
            from bevgen_tpu.training.checkpoints import resolve_ema_path
            ckpt_path = resolve_ema_path(ckpt_path)
        params = load_weights(ckpt_path, params)
        print(f"loaded weights from {ckpt_path}")
    elif use_ema:
        raise SystemExit("ema=true requires ckpt_path=")
    if quant in ("int8", "auto"):
        # quantize AFTER loading weights (host-side tree conversion).
        # quant=int8 FORCES int8 (the user may want the halved weight
        # footprint regardless of speed); quant=auto consults the
        # measured batch->mode crossover and keeps bf16 at batches
        # where int8 measured slower (docs/PERF_NOTES.md sweep).
        hint = batch_size if quant == "auto" else None
        pipe, params = pipe.quantized(params, batch_hint=hint)
    elif quant != "none":
        raise SystemExit(f"unknown quant={quant!r} (none|int8|auto)")

    if fake:
        batches = [fake_batch(cfg, batch_size, seed=seed + i)
                   for i in range(max(1, fake // batch_size))]
    else:
        from bevgen_tpu.data.argoverse import ArgoverseDataset
        ds = ArgoverseDataset(split=split, eval_generate=save_dir,
                              cam_res=cfg.transformer.cam_res,
                              mini_dataset=mini_dataset,
                              bev_dir_name=bev_dir_name)
        loader = dm.DataLoader(ds, batch_size, shuffle=False,
                               drop_last=True)
        batches = iter(loader)

    mesh = None
    if dp or tp > 1 or dcn != "1":
        from bevgen_tpu.parallel import sharding as shd
        mesh = (shd.make_multislice_mesh(tp=tp) if dcn == "auto" else
                shd.make_mesh(dp=int(dp) if dp else None, tp=tp,
                              dcn=int(dcn)))
        print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    if mesh is not None:
        if keep_cameras:
            raise SystemExit("keep_cameras (partial decode) is not "
                             "supported together with a device mesh")
        ways = shd.data_parallelism(mesh)
        if batch_size % ways != 0:
            raise SystemExit(f"batch_size={batch_size} must be divisible "
                             f"by the data-parallel ways ({ways})")
        if pipeline == "ar":
            from bevgen_tpu.pipelines.ar_generate import (
                make_sharded_ar_generate)
            sharded_run, shard_params, shard_arrays = \
                make_sharded_ar_generate(pipe, mesh)
        else:
            from bevgen_tpu.pipelines.generate import make_sharded_generate
            sharded_run, shard_params, shard_arrays = \
                make_sharded_generate(pipe, mesh)
        params = shard_params(params)

        def run(p, s, ii, ei, r, init):
            with mesh:
                s, ii, ei = shard_arrays(s, ii, ei)
                return sharded_run(p, s, ii, ei, r)
    else:
        run = jax.jit(lambda p, s, ii, ei, r, init: pipe.generate_fn(
            p, s, ii, ei, r, init_ids=init))
    # background writer: JPEG encode/IO overlaps the next device batch
    writer = GenerationWriter(save_dir, layout=layout, background=True,
                              rand_str=rand_str)
    rng = jax.random.PRNGKey(seed)

    recon = None
    if save_rec:
        @jax.jit
        def recon(params, image):
            toks = pipe.encode_images(params, image)
            b, cam = image.shape[:2]
            h, w = cfg.transformer.cam_latent_res
            return pipe.decode_tokens(params, toks.reshape(b, cam, h, w))

    n_done = 0
    t_start = time.perf_counter()
    for i, batch in enumerate(batches):
        if limit and i >= limit:
            break
        rng, step_rng = jax.random.split(rng)
        init_ids = None
        if keep_cameras and "image" in batch:
            tf = cfg.transformer
            gt_tokens = pipe.encode_images(
                params, jnp.asarray(batch["image"]))      # (b, cam, hw)
            mask_id = tf.mask_token_id
            init_ids = jnp.full_like(gt_tokens, mask_id)
            for c, name in enumerate(tf.camera_names):
                if name in keep_cameras:
                    init_ids = init_ids.at[:, c].set(gt_tokens[:, c])
        images, ids = run(params, jnp.asarray(batch["segmentation"]),
                          jnp.asarray(batch["intrinsics_inv"]),
                          jnp.asarray(batch["extrinsics_inv"]), step_rng,
                          init_ids)
        images = np.asarray(images, np.float32)
        rec = (np.asarray(recon(params, jnp.asarray(batch["image"])),
                          np.float32)
               if recon is not None and "image" in batch else None)
        writer.write_batch(images, batch, gt_images=batch.get("image"),
                           rec_images=rec)
        n_done += images.shape[0] * images.shape[1]
        print(f"batch {i}: {images.shape[0]} scenes -> {save_dir}")
    writer.flush()
    dt = time.perf_counter() - t_start
    print(json.dumps({"images": n_done, "seconds": round(dt, 2),
                      "images_per_sec": round(n_done / dt, 3) if dt else 0}))


if __name__ == "__main__":
    main()
