"""Derive the reference AR-pipeline A5000 images/sec baseline, same
discipline as derive_baseline.py (EXECUTE the real reference model on
torch-CPU under torch.profiler FLOP counting; every assumption favors
the reference).

The reference AR sampler (cond_transformer_multi_view.py:155-227) runs
ONE FULL GPT FORWARD PER GENERATED TOKEN — `num_img_tokens` sequential
forwards of the 24-layer model over the whole padded sequence, each
producing one token. This script:

1. executes the real reference `GPT` (mingpt_sparse.py:267, pytorch
   dense backend — the path it runs when DeepSpeed sparse kernels are
   absent, :224-231; the shipped nuScenes config is density 1.0, so the
   sparse kernels would not reduce the attended-block count anyway) for
   one forward at the shipped config and reads the matmul FLOPs;
2. multiplies by num_img_tokens sequential forwards per scene;
3. divides A5000 dense fp16 peak x MFU by the per-image FLOPs.

Run: JAX_PLATFORMS=cpu python scripts_dev/derive_ar_baseline.py
(~10 min single-core: 2100-token 24-layer forward under the profiler).
Result recorded in bench.py (measure_ar) and docs/PERF_NOTES.md.
"""
import sys
from pathlib import Path

import numpy as np
import torch

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))
import ref_harness as rh  # noqa: E402

from bevgen_tpu.core.config import nuscenes_ar_config  # noqa: E402
from bevgen_tpu.models import geometry  # noqa: E402

A5000_FP16_TFLOPS = 111.1  # dense fp16 tensor-core peak, GA102


def profile_flops(fn):
    from torch.profiler import ProfilerActivity, profile
    with profile(activities=[ProfilerActivity.CPU], with_flops=True) as p:
        with torch.no_grad():
            fn()
    return sum(e.flops for e in p.key_averages() if e.flops)


def main():
    cfg = nuscenes_ar_config().transformer
    mingpt = rh.import_ref(
        "multi_view_generation.modules.transformer.mingpt_sparse")
    rcfg = rh.ref_gpt_config(cfg, backend="pytorch")
    gpt = mingpt.GPT(rcfg).eval()

    b, cam, hw = 1, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(0)
    ids = torch.tensor(rng.integers(0, cfg.vocab_size, (b, cam, hw)))
    cond = torch.tensor(
        rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens)))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = torch.tensor(np.broadcast_to(
        np.linalg.inv(intr)[None], (b, cam, 3, 3)).astype(np.float32))
    ei = torch.tensor(np.broadcast_to(
        np.linalg.inv(extr)[None], (b, cam, 4, 4)).astype(np.float32))
    batch = {"intrinsics_inv": ii, "extrinsics_inv": ei}

    f_fwd = profile_flops(lambda: gpt(ids.clone(), cond, batch,
                                      sampling=True))
    n_tok = cfg.num_img_tokens
    per_scene = f_fwd * n_tok
    per_image = per_scene / cam
    print(f"reference GPT forward (1 scene, {cam} cams, L="
          f"{cfg.gpt_block_size}): {f_fwd/1e9:.2f} GFLOP")
    print(f"AR sampling = {n_tok} sequential full forwards "
          f"(cond_transformer_multi_view.py:172-227)")
    print(f"per scene: {per_scene/1e12:.1f} TFLOP; per image: "
          f"{per_image/1e12:.2f} TFLOP")
    for mfu in (0.25, 0.40, 0.50):
        ips = A5000_FP16_TFLOPS * 1e12 * mfu / per_image
        print(f"A5000 @ MFU {mfu:.2f}: {ips:.4f} img/s"
              + ("   <-- headline (same MFU as the MUSE baseline)"
                 if mfu == 0.40 else ""))


if __name__ == "__main__":
    main()
