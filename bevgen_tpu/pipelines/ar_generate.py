"""End-to-end AR generation pipeline: BEV raster -> tokens -> images.

The legacy/nuScenes counterpart of pipelines/generate.BEVGenPipeline —
the reference serves this path through the same Net2Net interface with
`model=stage_2` (cond_transformer_multi_view.py:155-227 sampling). Here:
BEV VQ-VAE encode -> KV-cached AR decode in outward order
(models/stage2/ar_cached.py) -> RGB VQ-GAN decode, one jitted program.

Supports the int8-weight serving tree (ops/quant.quantize_gpt_tree) and
partial decoding via init_ids (keep chosen cameras' GT tokens).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from bevgen_tpu.core.config import PipelineConfig
from bevgen_tpu.models.stage1.vq import VQModel, VQSegmentationModel
from bevgen_tpu.models.stage2 import ar_cached
from bevgen_tpu.models.stage2.gpt import SparseGPT
from bevgen_tpu.pipelines import generate as generate_mod


class ARPipeline(NamedTuple):
    config: PipelineConfig
    first_stage: VQModel
    cond_stage: VQSegmentationModel
    gpt: SparseGPT

    @classmethod
    def create(cls, config: PipelineConfig, dtype=None,
               use_pallas=None) -> "ARPipeline":
        dtype = dtype or jnp.dtype(config.dtype)
        return cls(
            config=config,
            first_stage=VQModel(config.first_stage, dtype=dtype),
            cond_stage=VQSegmentationModel(config.cond_stage, dtype=dtype),
            gpt=SparseGPT(config.transformer, dtype=dtype,
                          use_pallas=use_pallas),
        )

    def init_params(self, rng) -> Dict[str, Any]:
        from bevgen_tpu.models import geometry
        cfg = self.config.transformer
        r1, r2, r3 = jax.random.split(rng, 3)
        b, cam = 1, cfg.num_cams
        H, W = cfg.cam_res
        bev = self.config.cond_stage.resolution
        n_labels = self.config.cond_stage.in_channels
        ids = jnp.zeros((b, cam, cfg.num_cam_tokens), jnp.int32)
        cond = jnp.zeros((b, cfg.num_cond_tokens), jnp.int32)
        ii, ei = map(jnp.asarray, geometry.canonical_rig_inverses(cfg, b))
        return {
            "first_stage": self.first_stage.init(r1, jnp.zeros((b, H, W, 3))),
            "cond_stage": self.cond_stage.init(
                r2, jnp.zeros((b, bev, bev, n_labels))),
            "gpt": self.gpt.init(r3, ids, cond, ii, ei),
        }

    def quantized(self, params, batch_hint: Optional[int] = None):
        """int8-weight GPT serving tree (kept bf16 compute; ~neutral
        speed — the sequential decode is op-latency bound — but halves
        the weight footprint).

        batch_hint is accepted for API symmetry with
        BEVGenPipeline.quantized but INTENTIONALLY UNUSED: there is no
        batch crossover on this path (int8 never measured slower), so
        quantization always applies."""
        from bevgen_tpu.ops.quant import quantize_gpt_tree
        qparams = dict(params)
        qparams["gpt"] = jax.tree_util.tree_map(
            jnp.asarray, {"params": quantize_gpt_tree(
                params["gpt"]["params"])})
        return self, qparams

    # stage-1 wrappers shared with BEVGenPipeline (pipelines/generate.py)
    def encode_bev(self, params, segmentation) -> jnp.ndarray:
        return generate_mod.encode_bev_fn(self.cond_stage, params,
                                          segmentation)

    def encode_images(self, params, images) -> jnp.ndarray:
        return generate_mod.encode_images_fn(self.first_stage, params,
                                             images)

    def decode_tokens(self, params, ids) -> jnp.ndarray:
        return generate_mod.decode_tokens_fn(self.first_stage, params, ids)

    def generate_fn(self, params, segmentation, intrinsics_inv,
                    extrinsics_inv, rng, temperature: float = 1.0,
                    top_k: Optional[int] = 100,
                    init_ids: Optional[jnp.ndarray] = None,
                    cached: bool = True):
        """BEV raster in, camera images out. Jit this.

        cached=True uses the KV-cached incremental decoder (O(L)x less
        compute, verified equivalent — models/stage2/ar_cached.py);
        cached=False runs the reference-parity full-forward-per-token
        loop (cond_transformer_multi_view.py:155-227)."""
        cond_ids = self.encode_bev(params, segmentation)
        if cached:
            ids = ar_cached.ar_sample_cached(
                self.gpt, params["gpt"], cond_ids, intrinsics_inv,
                extrinsics_inv, rng, temperature=temperature, top_k=top_k,
                init_ids=init_ids)
        else:
            from bevgen_tpu.models.stage2 import ar as ar_full
            ids = ar_full.ar_sample(
                self.gpt, params["gpt"], cond_ids, intrinsics_inv,
                extrinsics_inv, rng, temperature=temperature, top_k=top_k,
                init_ids=init_ids)
        images = self.decode_tokens(params, ids)
        return images, ids


def make_sharded_ar_generate(pipe: ARPipeline, mesh):
    """Multi-chip AR serving: batch over dp, GPT weights over tp (the
    cached decoder is pure jnp, so GSPMD partitions it directly — no
    pallas opacity to work around). Returns (jitted_fn, shard_params,
    shard_batch), mirroring pipelines.generate.make_sharded_generate."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bevgen_tpu.parallel import sharding as shd

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
