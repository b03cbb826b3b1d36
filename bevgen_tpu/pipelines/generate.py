"""End-to-end generation pipeline: BEV raster -> tokens -> images.

One jit-compiled function runs the whole reference `generate.py` hot path
(SURVEY §3.1): BEV VQ-VAE encode -> 18-step MaskGit decode (CFG + self-
critic, all on device) -> RGB VQ-GAN decode — no host round-trips inside
a batch. The reference instead crosses the python/framework boundary
~70x per batch.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from bevgen_tpu.core.config import PipelineConfig
from bevgen_tpu.models.stage1.vq import VQModel, VQSegmentationModel
from bevgen_tpu.models.stage2.maskgit import MaskGit, generate as maskgit_generate


def encode_bev_fn(cond_stage, params, segmentation) -> jnp.ndarray:
    """(b, bev, bev, n_labels) -> (b, num_cond) int32 tokens
    (cond_transformer_multi_view_muse.py:149-155)."""
    enc = cond_stage.apply(params["cond_stage"], segmentation,
                           method=VQSegmentationModel.encode)
    return enc.indices.reshape(segmentation.shape[0], -1)


def encode_images_fn(first_stage, params, images) -> jnp.ndarray:
    """(b, cam, H, W, 3) -> (b, cam, hw) tokens."""
    b, cam = images.shape[:2]
    flat = images.reshape((b * cam,) + images.shape[2:])
    enc = first_stage.apply(params["first_stage"], flat,
                            method=VQModel.encode)
    return enc.indices.reshape(b, cam, -1)


def decode_tokens_fn(first_stage, params, ids) -> jnp.ndarray:
    """(b, cam, h, w) int32 -> (b, cam, H, W, 3) images."""
    b, cam, h, w = ids.shape
    img = first_stage.apply(params["first_stage"], ids.reshape(b * cam, h, w),
                            method=VQModel.decode_code)
    return img.reshape(b, cam, *img.shape[1:])


class BEVGenPipeline(NamedTuple):
    """Bundles the three models + their configs. Params are kept as a
    single dict {'first_stage': ..., 'cond_stage': ..., 'maskgit': ...}."""
    config: PipelineConfig
    first_stage: VQModel
    cond_stage: VQSegmentationModel
    maskgit: MaskGit

    @classmethod
    def create(cls, config: PipelineConfig, dtype=None) -> "BEVGenPipeline":
        dtype = dtype or jnp.dtype(config.dtype)
        return cls(
            config=config,
            first_stage=VQModel(config.first_stage, dtype=dtype),
            cond_stage=VQSegmentationModel(config.cond_stage, dtype=dtype),
            maskgit=MaskGit(config.transformer, config.muse, dtype=dtype),
        )

    def init_params(self, rng) -> Dict[str, Any]:
        cfg = self.config.transformer
        r1, r2, r3 = jax.random.split(rng, 3)
        b, cam = 1, cfg.num_cams
        H, W = cfg.cam_res
        bev = self.config.cond_stage.resolution
        n_labels = self.config.cond_stage.in_channels
        img = jnp.zeros((b, H, W, 3))
        seg = jnp.zeros((b, bev, bev, n_labels))
        ii = jnp.eye(3)[None, None].repeat(cam, 1)
        ei = jnp.eye(4)[None, None].repeat(cam, 1)
        ids = jnp.zeros((b, cam, cfg.num_cam_tokens), jnp.int32)
        cond = jnp.zeros((b, cfg.num_cond_tokens), jnp.int32)
        return {
            "first_stage": self.first_stage.init(r1, img),
            "cond_stage": self.cond_stage.init(r2, seg),
            "maskgit": self.maskgit.init(r3, ids, cond, ii, ei,
                                         method=MaskGit.init_all),
        }

    # ---- stage-1 wrappers (shared with ARPipeline) ------------------------

    def encode_bev(self, params, segmentation) -> jnp.ndarray:
        return encode_bev_fn(self.cond_stage, params, segmentation)

    def encode_images(self, params, images) -> jnp.ndarray:
        return encode_images_fn(self.first_stage, params, images)

    def decode_tokens(self, params, ids) -> jnp.ndarray:
        return decode_tokens_fn(self.first_stage, params, ids)

    # ---- the headline path ------------------------------------------------

    def generate_fn(self, params, segmentation, intrinsics_inv,
                    extrinsics_inv, rng,
                    init_ids: Optional[jnp.ndarray] = None,
                    force_not_use_token_critic: bool = False,
                    return_trajectory: bool = False):
        """BEV raster in, camera images out. Jit this.

        return_trajectory: also return the (T, b, cam, hw) per-step
        decode ids (int8-vs-bf16 fidelity dossier, docs/FIDELITY.md)."""
        cond_ids = self.encode_bev(params, segmentation)
        res = maskgit_generate(
            self.maskgit, params["maskgit"], cond_ids,
            intrinsics_inv, extrinsics_inv, rng, init_ids=init_ids,
            force_not_use_token_critic=force_not_use_token_critic,
            return_trajectory=return_trajectory)
        ids, traj = res if return_trajectory else (res, None)
        images = self.decode_tokens(params, ids)
        return (images, ids, traj) if return_trajectory else (images, ids)

    # fallback crossover when the measured table is absent: int8 wins
    # below this batch, bf16 at or above it (round-4 sweep summary —
    # at large batch the quant/requant elementwise overhead rides the
    # already-saturated VPU/HBM while small batches are matmul-bound
    # where the double-rate int8 MXU pays)
    INT8_CROSSOVER_BATCH = 8

    @staticmethod
    def int8_beats_bf16(batch_hint: int) -> Optional[bool]:
        """Consult the shipped measured table
        (configs/int8_crossover.json, regenerable by
        scripts_dev/crossover_sweep.py): True/False from the nearest
        measured batch that has both modes, None when the table is
        missing/unusable (caller falls back to INT8_CROSSOVER_BATCH)."""
        import json
        import os
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs", "int8_crossover.json")
        try:
            with open(path) as f:
                meas = json.load(f)["measurements"]
            both = {int(b): v for b, v in meas.items()
                    if "bf16" in v and "int8" in v}
            if not both:
                return None
            nearest = min(both, key=lambda b: (abs(b - batch_hint), b))
            return both[nearest]["int8"] > both[nearest]["bf16"]
        except (OSError, ValueError, KeyError):
            return None

    def quantized(self, params, batch_hint: Optional[int] = None):
        """int8 W8A8 serving variant: returns (pipeline, params) with the
        decode transformer's hot dense layers quantized (ops/quant.py).
        Stage-1 convs stay bf16 (they are ~2% of the budget).

        batch_hint: intended serving batch — where the MEASURED table
        (configs/int8_crossover.json) says bf16 is faster, the call
        auto-selects bf16 (returns self unchanged, with a notice)
        instead of handing the user a slower "optimized" pipeline.
        Pass batch_hint=None to force quantization regardless (the
        bench does, to publish the honest int8-at-b16 row; the CLI's
        explicit quant=int8 does too — the user may want the halved
        weight footprint)."""
        import dataclasses
        from bevgen_tpu.ops.quant import quantize_dense_tree
        if batch_hint is not None:
            wins = self.int8_beats_bf16(batch_hint)
            if wins is None:  # no table — baked fallback threshold
                wins = batch_hint < self.INT8_CROSSOVER_BATCH
            if not wins:
                print(f"[quantized] bf16 measured faster than int8 at "
                      f"batch {batch_hint} (configs/int8_crossover.json) "
                      "— keeping bf16")
                return self, params
        cfg = dataclasses.replace(
            self.config, transformer=self.config.transformer.replace(
                quant="int8"))
        pipe = BEVGenPipeline.create(cfg, dtype=self.maskgit.dtype)
        qparams = dict(params)
        qparams["maskgit"] = jax.tree_util.tree_map(
            jnp.asarray, {"params": quantize_dense_tree(
                params["maskgit"]["params"])})
        return pipe, qparams


def make_jitted_generate(pipe: BEVGenPipeline):
    @jax.jit
    def run(params, segmentation, intrinsics_inv, extrinsics_inv, rng):
        return pipe.generate_fn(params, segmentation, intrinsics_inv,
                                extrinsics_inv, rng)
    return run


def make_sharded_generate(pipe: BEVGenPipeline, mesh):
    """Multi-chip serving: batch sharded over dp, attention/FFN weights
    over tp — the whole decode scan runs SPMD with XLA collectives over
    ICI. Returns (jitted_fn, shard_params, shard_batch).

    The attention cores run inside shard_map (batch over dp, heads over
    tp): pallas_call has no GSPMD partitioning rule, so the fused kernel
    must be invoked per-shard with local shapes rather than left opaque
    inside the GSPMD program (where XLA would replicate its operands).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bevgen_tpu.parallel import sharding as shd

    if mesh.size > 1:
        pipe = pipe._replace(maskgit=MaskGit(
            pipe.maskgit.cfg, pipe.maskgit.muse, pipe.maskgit.dtype,
            mesh=mesh))

    def shard_params(params):
        return jax.device_put(params, shd.param_shardings(params, mesh))

    batch_sh = NamedSharding(mesh, P(shd.batch_axes(mesh)))
    rng_sh = NamedSharding(mesh, P())

    jitted = jax.jit(
        lambda params, seg, ii, ei, rng: pipe.generate_fn(
            params, seg, ii, ei, rng),
        in_shardings=(None, batch_sh, batch_sh, batch_sh, rng_sh),
    )

    def shard_batch(*arrays):
        return tuple(jax.device_put(a, batch_sh) for a in arrays)

    return jitted, shard_params, shard_batch
