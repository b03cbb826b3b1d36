"""Central configuration for bevgen_tpu.

Design: frozen, hashable dataclasses so configs can key lru_caches for
precomputed geometry artifacts (permutation indices, attention masks,
bias matrices) and act as static args under `jax.jit`.

Field names intentionally mirror the reference hydra keys
(`GPTConfig`, /root/reference/multi_view_generation/modules/transformer/
mingpt_sparse.py:26) so reference experiment configs translate 1:1,
but this is a new TPU-first config system: derived fields are computed
eagerly, all tensor-valued artifacts live OUTSIDE the config (pure
cached functions of it), and everything is numpy/python — no framework
tensors.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

# ---------------------------------------------------------------------------
# Camera sets (reference: bev_utils/util.py:20 `Cameras`)
# ---------------------------------------------------------------------------

CAMERA_SETS: Dict[str, Tuple[str, ...]] = {
    "NUSCENES_FRONT": ("CAM_FRONT",),
    "NUSCENES_CAMERAS": (
        "CAM_FRONT", "CAM_BACK", "CAM_FRONT_RIGHT",
        "CAM_FRONT_LEFT", "CAM_BACK_RIGHT", "CAM_BACK_LEFT",
    ),
    "NUSCENES_ABLATION_CAMERAS": ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT"),
    "ARGOVERSE_CAMERAS": (
        "ring_side_left", "ring_front_left", "ring_front_right", "ring_side_right",
    ),
    "ARGOVERSE_FRONT_CAMERAS": ("ring_front_left", "ring_front_center", "ring_front_right"),
    "ARGOVERSE_ALL_CAMERAS": (
        "ring_side_left", "ring_front_left", "ring_front_center",
        "ring_front_right", "ring_side_right",
    ),
    # the full AV2 7-camera ring (the BASELINE "7x256px scenes" rig)
    "ARGOVERSE_RING_CAMERAS": (
        "ring_rear_left", "ring_side_left", "ring_front_left",
        "ring_front_center", "ring_front_right", "ring_side_right",
        "ring_rear_right",
    ),
}

DATASETS = ("nuscenes", "argoverse")


def _ceil_to(x: int, m: int) -> int:
    return m * int(math.ceil(x / m))


# ---------------------------------------------------------------------------
# Stage-1 (VQ autoencoder) config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Stage1Config:
    """VQ-GAN / VQ-VAE architecture config.

    Mirrors the reference `ddconfig` + VQModel kwargs
    (configs/model/stage_1_cam.yaml, modules/stage1/vqgan.py:31).
    """
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resolution: int = 256
    z_channels: int = 256
    double_z: bool = False
    dropout: float = 0.0
    # quantizer
    n_embed: int = 1024
    embed_dim: int = 256
    beta: float = 0.25
    legacy_beta: bool = True   # reference quantize.py:290-295 beta placement quirk
    # geometric embedding on the encoder features (vqgan.py:62-69)
    geometric_embedding: bool = False
    cam_emd_dim: int = 256
    cam_res: Tuple[int, int] = (256, 256)
    cam_latent_res: Tuple[int, int] = (16, 16)
    # segmentation variant (VQSegmentationModel): n_labels drives in/out chans
    n_labels: Optional[int] = None

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    @property
    def latent_resolution(self) -> int:
        return self.resolution // self.downsample_factor


# ---------------------------------------------------------------------------
# Stage-2 transformer config (reference GPTConfig equivalent)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MultiViewConfig:
    """Multi-view transformer config with derived token-geometry fields.

    Equivalent of the reference's `GPTConfig` (mingpt_sparse.py:26-106):
    holds model dims + the token-sequence geometry
    `[num_cond_tokens BEV | num_cams*h*w image | pad]` and the knobs for
    the sparse attention layout / camera bias machinery.
    """
    # model dims
    num_layers: int = 14
    num_heads: int = 16
    num_embed: int = 1024          # model (residual) width
    hidden_size: int = 1024        # attention inner width (AR GPT path)
    dim_head: int = 64             # MUSE attention head dim
    ff_mult: int = 4
    vocab_size: int = 1024
    cond_vocab_size: int = 1024
    # dropout
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    # multi-camera geometry
    num_cams: int = 3
    cam_names: str = "ARGOVERSE_FRONT_CAMERAS"
    dataset: str = "argoverse"
    cam_res: Tuple[int, int] = (256, 256)
    cam_latent_res: Tuple[int, int] = (16, 16)
    bev_latent_res: Tuple[int, int] = (16, 16)
    # sparsity / masks
    window_len: int = 32
    density: float = 1.0
    sparse_block_size: int = 1
    causal_order: bool = True
    camera_bias: bool = True
    bev_embed: bool = True
    image_embed: bool = True
    legacy_prob_matrix: bool = False
    # Measured camera-rig artifact for the geometric (non-legacy) bias
    # path — the reference's `pretrained/cam_data_{dataset}.pt`
    # (mask_generator.py:89-110, saved by argoverse.py:355). Accepts
    # that torch artifact or our npz (ArgoverseDataset.save_cam_data).
    # None -> synthesize the canonical rig (geometry.canonical_camera_rig).
    # Part of the config hash, so cached mask/bias artifacts stay keyed
    # to the rig they were built from.
    rig_path: Optional[str] = None
    # MUSE self-conditioning (muse_maskgit_pytorch.py:212,240-241,356-359):
    # a FeedForward of the previous forward's embeddings added to the
    # input embeddings. The reference adds a (b*cam, hw, d) embed to a
    # (b, cam*hw, d) input (shape-inconsistent upstream, never shipped
    # enabled); we keep both in (b, cam*hw, d).
    self_cond: bool = False
    n_unmasked: int = 0
    # seeded per-head random layout sampling (replaces the reference's
    # runtime rank-0 broadcast, sparse_self_attention.py:48-52, with a
    # deterministic artifact — SURVEY §5.8)
    layout_seed: int = 0
    # rematerialize transformer blocks in the backward pass
    # (jax.checkpoint): trades ~30% extra FLOPs for O(layers) less
    # activation memory — the TPU-native replacement for activation
    # checkpointing knobs
    remat: bool = False
    # serving-path quantization of the big dense layers: "none" | "int8"
    # (W8A8 on the v5e double-rate int8 MXU — ops/quant.py). Inference
    # only; training and golden tests stay bf16/fp32.
    quant: str = "none"
    # None = auto: Pallas on TPU backends, dense XLA elsewhere. Under a
    # multi-device mesh the attention core (either implementation) runs
    # inside shard_map with per-shard local shapes — pallas_call has no
    # GSPMD partitioning rule, so it must not be left opaque inside the
    # GSPMD program (models/stage2/transformer.py CosineAttention.mesh).
    use_fused_attention: Optional[bool] = None
    # fused residual+LayerNorm and GEGLU+LayerNorm Pallas passes
    # (ops/pallas/fused_glue.py). None = OFF: the kernels hit ~96% HBM
    # bandwidth but still measured SLOWER e2e than XLA's own fusions of
    # the same chains, which materialize fewer bytes (PERF_NOTES r4).
    # Opt-in for experiments; checkpoint layout identical either way.
    use_fused_glue: Optional[bool] = None

    def __post_init__(self):
        assert self.dataset in DATASETS, self.dataset
        assert self.cam_names in CAMERA_SETS, self.cam_names
        assert len(CAMERA_SETS[self.cam_names]) == self.num_cams, (
            f"{self.cam_names} has {len(CAMERA_SETS[self.cam_names])} cams, "
            f"config says {self.num_cams}")
        assert self.num_embed % self.num_heads == 0

    # -- derived token geometry (reference __post_init__, mingpt_sparse.py:74) --
    @property
    def cam_latent_h(self) -> int:
        return self.cam_latent_res[0]

    @property
    def cam_latent_w(self) -> int:
        return self.cam_latent_res[1]

    @property
    def num_cond_tokens(self) -> int:
        return self.bev_latent_res[0] * self.bev_latent_res[1]

    @property
    def num_cam_tokens(self) -> int:
        return self.cam_latent_h * self.cam_latent_w

    @property
    def num_img_tokens(self) -> int:
        return self.num_cam_tokens * self.num_cams

    @property
    def gpt_block_size(self) -> int:
        return _ceil_to(self.num_img_tokens + self.num_cond_tokens,
                        self.sparse_block_size)

    @property
    def num_pad_tokens(self) -> int:
        return self.gpt_block_size - (self.num_img_tokens + self.num_cond_tokens)

    @property
    def camera_names(self) -> Tuple[str, ...]:
        return CAMERA_SETS[self.cam_names]

    @property
    def mask_token_id(self) -> int:
        """MaskGIT [MASK] id — one past the codebook (muse_maskgit_pytorch.py:222)."""
        return self.vocab_size

    def replace(self, **kw) -> "MultiViewConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# MUSE / MaskGit sampling+training config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MuseConfig:
    """MaskGit training/sampling knobs (muse_maskgit_pytorch.py:467-509,
    cond_transformer_multi_view_muse.py:54)."""
    sample_iterations: int = 18
    cond_scale: float = 3.0
    # The reference's classifier-free guidance is a NO-OP at inference:
    # TransformerMultiView.forward only drops the condition when
    # `self.training` (muse_maskgit_pytorch.py:353-355), and generate()
    # runs under eval_decorator — so the "null" forward of
    # forward_with_cond_scale (:262-281) sees the full condition and the
    # cond_scale mix cancels exactly. Faithful serving therefore runs
    # cond-only single forwards (default). real_cfg=True enables ACTUAL
    # guidance (null pass with the condition dropped, mixed by
    # cond_scale) — an intentional deviation the reference's code
    # structure suggests was intended but never reached.
    real_cfg: bool = False
    cond_drop_prob: float = 0.1
    self_token_critic: bool = True
    # separate critic TRANSFORMER (TokenCritic,
    # muse_maskgit_pytorch.py:423-426) — mutually exclusive with
    # self_token_critic
    token_critic: bool = False
    # probability of feeding the no-grad pre-forward embedding as
    # self-conditioning during training (muse_maskgit_pytorch.py:505,681)
    self_cond_prob: float = 0.9
    critic_loss_weight: float = 1.0
    critic_noise_scale: float = 1.0
    temperature: float = 1.0
    topk_filter_thres: float = 0.9
    no_mask_token_prob: float = 0.0


# ---------------------------------------------------------------------------
# Pipeline (full system) config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PipelineConfig:
    """Top-level config tying the two stages + sampling together."""
    transformer: MultiViewConfig = field(default_factory=MultiViewConfig)
    muse: MuseConfig = field(default_factory=MuseConfig)
    first_stage: Stage1Config = field(default_factory=Stage1Config)
    cond_stage: Stage1Config = field(default_factory=lambda: Stage1Config(
        in_channels=7, out_ch=7, n_labels=7))
    # None = "not set on the CLI": scripts substitute their own
    # defaults ONLY then, so an explicit batch_size=1 is honored
    batch_size: Optional[int] = None
    seed: int = 0
    # compute dtype for the hot path; params stay fp32
    dtype: str = "bfloat16"
    base_lr: float = 4.5e-6


# ---------------------------------------------------------------------------
# Named presets mirroring the reference experiment configs
# ---------------------------------------------------------------------------

def argoverse_muse_config() -> PipelineConfig:
    """The shipped Argoverse MUSE pipeline:
    experiment=muse_stage_two_multi_view 'modes=[argoverse,generate]'
    (configs/experiment/muse_stage_two_multi_view.yaml +
     configs/modes/argoverse.yaml + configs/model/stage_2_argoverse.yaml).
    """
    tf = MultiViewConfig(
        num_layers=14, num_heads=16, num_embed=1024, hidden_size=1024,
        vocab_size=1024, cond_vocab_size=1024,
        num_cams=3, cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(256, 256), cam_latent_res=(16, 16), bev_latent_res=(16, 16),
        sparse_block_size=1, window_len=32, density=1.0,
        causal_order=True, camera_bias=True, image_embed=True, bev_embed=True,
        legacy_prob_matrix=False,
    )
    return PipelineConfig(
        transformer=tf,
        muse=MuseConfig(),
        first_stage=Stage1Config(cam_res=(256, 256), cam_latent_res=(16, 16)),
        cond_stage=Stage1Config(in_channels=7, out_ch=7, n_labels=7,
                                cam_res=(256, 256), cam_latent_res=(16, 16)),
    )


def nuscenes_ar_config() -> PipelineConfig:
    """The legacy autoregressive sparse-GPT pipeline, mirroring
    configs/model/stage_2.yaml exactly — including density 1.0
    (stage_2.yaml:32): the per-head random layouts then admit every
    block the static window+causality pattern doesn't already force,
    which is what a reference checkpoint was trained against."""
    tf = MultiViewConfig(
        num_layers=24, num_heads=16, num_embed=1024, hidden_size=1024,
        vocab_size=1024, cond_vocab_size=1024,
        num_cams=6, cam_names="NUSCENES_CAMERAS", dataset="nuscenes",
        cam_res=(224, 400), cam_latent_res=(14, 25), bev_latent_res=(16, 16),
        sparse_block_size=16, window_len=32, density=1.0,
        causal_order=True, camera_bias=False, image_embed=True, bev_embed=False,
        legacy_prob_matrix=True,
    )
    return PipelineConfig(
        transformer=tf,
        first_stage=Stage1Config(cam_res=(224, 400), cam_latent_res=(14, 25)),
        cond_stage=Stage1Config(in_channels=3, out_ch=3, n_labels=3,
                                cam_res=(224, 400), cam_latent_res=(14, 25)),
    )


def tiny_test_config() -> PipelineConfig:
    """Small config for CPU tests: same structure, tiny dims."""
    tf = MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64, dim_head=32,
        vocab_size=32, cond_vocab_size=32,
        num_cams=3, cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
        sparse_block_size=1, window_len=4, density=1.0,
        causal_order=True, camera_bias=True, image_embed=True, bev_embed=True,
        legacy_prob_matrix=False,
    )
    # ch_mult length 4 -> 8x downsample: 32px -> 4x4 latents, matching the
    # transformer's cam_latent_res/bev_latent_res above.
    s1 = Stage1Config(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                      z_channels=16, n_embed=32, embed_dim=16, resolution=32,
                      attn_resolutions=(4,), cam_res=(32, 32),
                      cam_latent_res=(4, 4))
    bev = Stage1Config(in_channels=7, out_ch=7, n_labels=7, ch=16,
                       ch_mult=(1, 1, 2, 2), num_res_blocks=1, z_channels=16,
                       n_embed=32, embed_dim=16, resolution=32,
                       attn_resolutions=(4,), cam_res=(32, 32),
                       cam_latent_res=(4, 4))
    return PipelineConfig(transformer=tf, first_stage=s1, cond_stage=bev,
                          muse=MuseConfig(sample_iterations=4))


def argoverse_rect_config() -> PipelineConfig:
    """Rectangular-crop Argoverse variant: 256x336 images -> 16x21
    latents (configs/experiment/multi_view_stage_1_cam_rect_argoverse
    .yaml:23-24; SURVEY §2.2 "16x21 rect")."""
    cfg = argoverse_muse_config()
    return dataclasses.replace(
        cfg,
        transformer=cfg.transformer.replace(
            cam_res=(256, 336), cam_latent_res=(16, 21)),
        first_stage=dataclasses.replace(
            cfg.first_stage, cam_res=(256, 336), cam_latent_res=(16, 21),
            geometric_embedding=False),
    )


def argoverse_muse_7cam_config() -> PipelineConfig:
    """argoverse_muse scaled to the full 7-camera AV2 ring — the
    BASELINE.json headline workload ("7x256px scenes")."""
    cfg = argoverse_muse_config()
    return dataclasses.replace(cfg, transformer=cfg.transformer.replace(
        num_cams=7, cam_names="ARGOVERSE_RING_CAMERAS"))


def nuscenes_ar_tpu_config() -> PipelineConfig:
    """nuscenes_ar re-tuned for TPU training FROM SCRATCH: MXU-aligned
    128-token sparse blocks at density 0.25 (same window+similarity
    sparsity family; ~2x over dense — ops/pallas/block_sparse.py).
    NOT layout-compatible with checkpoints trained at the reference's
    density 1.0: density decides how many blocks the model ATTENDS to,
    so it is behavioral (use `nuscenes_ar` for reference checkpoints);
    the block granularity alone is a free hardware choice since the
    reference samples layouts at runtime."""
    cfg = nuscenes_ar_config()
    return dataclasses.replace(
        cfg, transformer=cfg.transformer.replace(sparse_block_size=128,
                                                 density=0.25))


PRESETS = {
    "argoverse_muse": argoverse_muse_config,
    "argoverse_muse_rect": argoverse_rect_config,
    "argoverse_muse_7cam": argoverse_muse_7cam_config,
    "nuscenes_ar": nuscenes_ar_config,
    "nuscenes_ar_tpu": nuscenes_ar_tpu_config,
    "tiny_test": tiny_test_config,
}


def apply_overrides(cfg: Any, overrides: Dict[str, Any]):
    """Apply dotted-path overrides to a (possibly nested) frozen dataclass.

    Hydra-ish CLI surface: `transformer.num_layers=2 muse.sample_iterations=8`.
    """
    grouped: Dict[str, Dict[str, Any]] = {}
    flat: Dict[str, Any] = {}
    for key, val in overrides.items():
        if "." in key:
            head, rest = key.split(".", 1)
            grouped.setdefault(head, {})[rest] = val
        else:
            flat[key] = val
    kw = dict(flat)
    for head, sub in grouped.items():
        kw[head] = apply_overrides(getattr(cfg, head), sub)
    # coerce strings from the CLI into the annotated field types
    coerced = {}
    fields = {f.name: f for f in dataclasses.fields(cfg)}
    for k, v in kw.items():
        if k in fields and isinstance(v, str):
            cur = getattr(cfg, k)
            if isinstance(cur, bool):
                v = v.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                v = int(v)
            elif isinstance(cur, float):
                v = float(v)
            elif isinstance(cur, tuple):
                parts = [p for p in v.strip("[]() ").split(",") if p]
                elem = type(cur[0]) if cur else int
                v = tuple(elem(p) for p in parts)
            elif cur is None:
                # Optional fields default to None — coerce by the
                # ANNOTATION instead of the current value's type
                ann = str(fields[k].type)
                if "int" in ann:
                    v = int(v)
                elif "float" in ann:
                    v = float(v)
                elif "bool" in ann:
                    v = v.lower() in ("1", "true", "yes")
        coerced[k] = v
    return dataclasses.replace(cfg, **coerced)
