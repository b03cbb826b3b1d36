"""Autoregressive generation pipeline (the legacy/nuScenes path).

Wires the sparse GPT into the same BEV -> tokens -> images flow as the
MUSE pipeline (reference cond_transformer_multi_view.py:155-227 +
Net2NetTransformer glue): one jittable function per stage, partial
decoding supported.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from bevgen_tpu.core.config import PipelineConfig
from bevgen_tpu.models.stage1.vq import VQModel, VQSegmentationModel
from bevgen_tpu.models.stage2 import ar
from bevgen_tpu.models.stage2.gpt import SparseGPT


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
        cfg = self.config.transformer
        r1, r2, r3 = jax.random.split(rng, 3)
        b, cam = 1, cfg.num_cams
        H, W = cfg.cam_res
        bev = self.config.cond_stage.resolution
        n_labels = self.config.cond_stage.in_channels
        ids = jnp.zeros((b, cam, cfg.num_cam_tokens), jnp.int32)
        cond = jnp.zeros((b, cfg.num_cond_tokens), jnp.int32)
        ii = jnp.eye(3)[None, None].repeat(cam, 1)
        ei = jnp.eye(4)[None, None].repeat(cam, 1)
        return {
            "first_stage": self.first_stage.init(r1, jnp.zeros((b, H, W, 3))),
            "cond_stage": self.cond_stage.init(
                r2, jnp.zeros((b, bev, bev, n_labels))),
            "gpt": self.gpt.init(r3, ids, cond, ii, ei),
        }

    def encode_bev(self, params, segmentation) -> jnp.ndarray:
        enc = self.cond_stage.apply(params["cond_stage"], segmentation,
                                    method=VQSegmentationModel.encode)
        return enc.indices.reshape(segmentation.shape[0], -1)

    def decode_tokens(self, params, ids) -> jnp.ndarray:
        b, cam, h, w = ids.shape
        img = self.first_stage.apply(params["first_stage"],
                                     ids.reshape(b * cam, h, w),
                                     method=VQModel.decode_code)
        return img.reshape(b, cam, *img.shape[1:])

    def generate_fn(self, params, segmentation, intrinsics_inv,
                    extrinsics_inv, rng, temperature: float = 1.0,
                    top_k: Optional[int] = 100,
                    init_ids: Optional[jnp.ndarray] = None,
                    cached: bool = True):
        """cached=True uses the KV-cached incremental decoder (O(L)x
        less compute, verified equivalent — models/stage2/ar_cached.py);
        cached=False runs the reference-parity full-forward loop."""
        cond = self.encode_bev(params, segmentation)
        if cached:
            from bevgen_tpu.models.stage2.ar_cached import ar_sample_cached
            ids = ar_sample_cached(self.gpt, params["gpt"], cond,
                                   intrinsics_inv, extrinsics_inv, rng,
                                   temperature=temperature, top_k=top_k,
                                   init_ids=init_ids)
        else:
            ids = ar.ar_sample(self.gpt, params["gpt"], cond, intrinsics_inv,
                               extrinsics_inv, rng, temperature=temperature,
                               top_k=top_k, init_ids=init_ids)
        return self.decode_tokens(params, ids), ids
