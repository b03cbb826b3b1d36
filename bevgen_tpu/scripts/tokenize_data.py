"""Tokenize a dataset once with stage-1 -> token shards for stage-2
training (data/tokens.py; the idiomatic-TPU input pipeline the
reference lacks — SURVEY §7 hard-part 4).

  python -m bevgen_tpu.scripts.tokenize_data preset=argoverse_muse \
      out_dir=/data/tokens ckpt_path=stage1.ckpt datamodule.split=train \
      [fake=64]  # fake batches instead of a dataset, for smoke tests
"""
from __future__ import annotations

from bevgen_tpu.scripts import cli


def main(argv=None):
    args = cli.parse_argv(argv)
    args = cli.setup_platform(args)
    cfg, args = cli.build_config(args)

    import jax
    import jax.numpy as jnp
    from bevgen_tpu.data import datamodule as dm
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.data.tokens import tokenize_dataset
    from bevgen_tpu.pipelines.generate import BEVGenPipeline
    from bevgen_tpu.training.checkpoints import load_weights

    out_dir = args.pop("out_dir")
    ckpt_path = args.pop("ckpt_path", None)
    split = args.pop("datamodule.split", "train")
    batch_size = cfg.batch_size or 8
    shard_size = int(args.pop("shard_size", 1024))
    fake = int(args.pop("fake", 0))
    seed = int(args.pop("seed", cfg.seed))
    if args:
        print(f"[tokenize_data] ignoring unknown args: {sorted(args)}")

    pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
    params = pipe.init_params(jax.random.PRNGKey(seed))
    if ckpt_path:
        params = load_weights(ckpt_path, params)
        print(f"loaded stage-1 weights from {ckpt_path}")

    if fake:
        batches = [fake_batch(cfg, batch_size, seed=seed + i)
                   for i in range(max(1, fake // batch_size))]
    else:
        from bevgen_tpu.data.argoverse import ArgoverseDataset
        ds = ArgoverseDataset(split=split,
                              cam_res=cfg.transformer.cam_res)
        batches = dm.DataLoader(ds, batch_size, shuffle=False,
                                drop_last=True)

    n = tokenize_dataset(pipe, params, batches, out_dir,
                         shard_size=shard_size)
    print(f"tokenized {n} samples -> {out_dir}")


if __name__ == "__main__":
    main()
