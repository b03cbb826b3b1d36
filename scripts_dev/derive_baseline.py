"""Derive the reference-pipeline A5000 images/sec baseline from first
principles, by EXECUTING the actual reference models (torch-CPU) under
torch.profiler FLOP counting.

Why this exists: the reference publishes no end-to-end throughput. Its
only numbers are fwd+bwd micro-benchmark comments in
scripts/inference.py:170-179 whose configs (`benchmark/nuscenes.yaml`,
`multi_view_stage_2_full_argoverse.yaml`) do NOT exist in the shipped
checkout (training-branch remnants, SURVEY.md 2.6) — so the batch size
behind the 120.86 ms dense number is unknowable and it cannot anchor a
baseline by itself. Instead we:

1. run the real `MaskGitTransformerMultiView` (flagship dims: 14 layers,
   d=1024, 16 heads, 7 cams x 16x16 tokens, 256 BEV cond tokens) for one
   forward and read the profiler's matmul FLOP count;
2. run the real stage-1 `Decoder` (ch=128, ch_mult [1,1,2,2,4],
   configs/model/stage_2.yaml:45-55) for one 256px camera decode and the
   real `Encoder` (in_channels=7) for one BEV encode;
3. assemble the per-scene generation cost from the decode structure the
   reference actually executes (muse_maskgit_pytorch.py:511-621):
   18 steps x [2 CFG forwards (forward_with_cond_scale :262-281)
             + 2 SelfCritic forwards (:394-396, also cond-scaled)]
   + 7 camera decodes + 1 BEV encode;
4. divide A5000 dense fp16 tensor peak (111.1 TFLOP/s — GA102 spec,
   no 2:4 sparsity) x an assumed MFU by the per-image FLOPs.

Conservatism (every assumption favors the REFERENCE, i.e. raises the
baseline and lowers our reported multiple):
- profiler `with_flops` counts only matmul/conv FLOPs; the reference's
  eager elementwise work (l2norm/GEGLU/softmax at seq 1792 without
  flash attention) is billed at zero cost;
- MFU 0.40 for eager-mode fp16 torch inference is at/above the top of
  what non-flash einsum attention models achieve on Ampere (typical
  0.2-0.35); we also print 0.25/0.50 sensitivities;
- host->device, tqdm, stage-1 quantize lookups, image IO: zero cost.

Output: per-image FLOPs, baseline img/s at each MFU, and the implied
per-forward latency for cross-checking against scripts/inference.py's
comment numbers.

Run: JAX_PLATFORMS=cpu python scripts_dev/derive_baseline.py
(~2-4 min on one CPU core; result recorded in docs/PERF_NOTES.md and
bench.py's BASELINE_IMAGES_PER_SEC docstring.)
"""
import sys
from pathlib import Path

import numpy as np
import torch

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))
import ref_harness as rh  # noqa: E402

from bevgen_tpu.core.config import argoverse_muse_7cam_config  # noqa: E402
from bevgen_tpu.models import geometry  # noqa: E402

A5000_FP16_TFLOPS = 111.1  # dense fp16 tensor-core peak, GA102


def profile_flops(fn):
    from torch.profiler import ProfilerActivity, profile
    with profile(activities=[ProfilerActivity.CPU], with_flops=True) as p:
        with torch.no_grad():
            fn()
    return sum(e.flops for e in p.key_averages() if e.flops)


def measure_ref_transformer(cfg):
    """One forward of the real reference MaskGitTransformerMultiView at
    cfg's camera count; returns matmul FLOPs."""
    muse = rh.import_ref(
        "multi_view_generation.modules.stage2.muse_maskgit_pytorch")
    rcfg = rh.ref_gpt_config(cfg)
    tf = muse.MaskGitTransformerMultiView(
        num_tokens=cfg.vocab_size, seq_len=tuple(cfg.cam_latent_res),
        dim=cfg.num_embed, depth=cfg.num_layers, dim_head=cfg.dim_head,
        heads=cfg.num_heads, ff_mult=cfg.ff_mult, cfg=rcfg).eval()
    b, cam, hw = 1, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(0)
    ids = torch.tensor(rng.integers(0, cfg.vocab_size, (b * cam, hw)))
    cond = torch.tensor(
        rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens)))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = torch.tensor(np.broadcast_to(
        np.linalg.inv(intr)[None], (b, cam, 3, 3)).astype(np.float32))
    ei = torch.tensor(np.broadcast_to(
        np.linalg.inv(extr)[None], (b, cam, 4, 4)).astype(np.float32))
    batch = {"intrinsics_inv": ii, "extrinsics_inv": ei}
    return profile_flops(lambda: tf(
        ids, conditioning_token_ids=cond, batch=batch, cond_drop_prob=0.0))


def main():
    import dataclasses

    model_mod = rh.import_ref("multi_view_generation.modules.stage1.model")
    cfg7 = argoverse_muse_7cam_config().transformer

    # The reference Cameras enum tops out at 5 Argoverse cameras
    # (bev_utils/util.py:24-27) — the 7-cam flagship rig doesn't exist
    # upstream. Matmul FLOPs are EXACTLY F(s) = a*s + b*s^2 in the image
    # token count s (linear: embeds/FF/QKVO/head/cross-attn to the fixed
    # 256 cond tokens; quadratic: self-attention QK^T and AV) so two
    # measurements pin a and b and give the exact 7-cam forward cost.
    cams = {3: "ARGOVERSE_FRONT_CAMERAS", 5: "ARGOVERSE_ALL_CAMERAS"}
    f = {}
    for n, names in cams.items():
        # legacy prob-matrix path: the geometric one needs the measured
        # rig artifact file; the bias CONTENT changes zero matmul FLOPs
        c = dataclasses.replace(cfg7, num_cams=n, cam_names=names,
                                legacy_prob_matrix=True)
        f[n] = measure_ref_transformer(c)
        print(f"MUSE transformer forward (1 scene, {n} cams): "
              f"{f[n]/1e9:.2f} GFLOP")
    hw = cfg7.num_cam_tokens
    s3, s5, s7 = 3 * hw, 5 * hw, 7 * hw
    bq = (f[5] / s5 - f[3] / s3) / (s5 - s3)
    a = f[3] / s3 - bq * s3
    f_tf = a * s7 + bq * s7 * s7
    cam = cfg7.num_cams
    print(f"fit: linear {a/1e6:.3f} MFLOP/token, quadratic "
          f"{bq/1e3:.3f} kFLOP/token^2")
    print(f"MUSE transformer forward (1 scene, 7 cams, extrapolated): "
          f"{f_tf/1e9:.2f} GFLOP")

    dd = dict(double_z=False, z_channels=256, resolution=256, ch=128,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=2,
              attn_resolutions=[16], dropout=0.0)
    dec = model_mod.Decoder(out_ch=3, in_channels=3, **dd).eval()
    z = torch.randn(1, 256, 16, 16)
    f_dec = profile_flops(lambda: dec(z))
    print(f"stage-1 RGB decode (one 256px camera): {f_dec/1e9:.2f} GFLOP")

    enc = model_mod.Encoder(out_ch=7, in_channels=7, **dd).eval()
    bev = torch.randn(1, 7, 256, 256)
    f_enc = profile_flops(lambda: enc(bev))
    print(f"stage-1 BEV encode (one scene): {f_enc/1e9:.2f} GFLOP")

    steps, fwd_per_step = 18, 4  # 2 CFG + 2 SelfCritic (see docstring)
    per_scene = steps * fwd_per_step * f_tf + cam * f_dec + f_enc
    per_image = per_scene / cam
    print(f"\nper-scene generation: {per_scene/1e12:.3f} TFLOP "
          f"({steps}x{fwd_per_step} transformer forwards + {cam} decodes "
          f"+ 1 BEV encode)")
    print(f"per-image: {per_image/1e9:.1f} GFLOP")

    print(f"\nA5000 dense fp16 peak: {A5000_FP16_TFLOPS} TFLOP/s")
    for mfu in (0.25, 0.40, 0.50):
        ips = A5000_FP16_TFLOPS * 1e12 * mfu / per_image
        ms = f_tf / (A5000_FP16_TFLOPS * 1e12 * mfu) * 1e3
        print(f"  MFU {mfu:.2f}: baseline = {ips:6.2f} img/s   "
              f"(implied per-forward latency {ms:.1f} ms/scene-forward)")


if __name__ == "__main__":
    main()
