"""Sample curation utilities.

Reference equivalents:
  find_interesting_nuscenes_samples.py / find_different_*  ->
      `mode=interesting`: rank samples by BEV object density / diversity
      and emit a token list for targeted evaluation;
  filter_generated.py -> `mode=filter`: reorganize + filter generated
      outputs by per-sample quality (PSNR or LPIPS when weights exist).

  python -m bevgen_tpu.scripts.curate mode=interesting bev_dir=... out=tokens.txt
  python -m bevgen_tpu.scripts.curate mode=filter dir=/data/out keep=0.5
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np

from bevgen_tpu.scripts import cli


def interesting_scores(bev_dir: Path, max_samples=None):
    """Score BEV rasters by dynamic-object content (channels 0-3)."""
    from bevgen_tpu.data.rasterize import load_bev_raster
    files = sorted(bev_dir.rglob("*.npz"))[:max_samples]
    scores = []
    for f in files:
        layers = load_bev_raster(f)
        dyn = layers[..., :4].sum()
        ped = layers[..., 2].sum()
        scores.append((f"{f.parent.name}_{f.stem}",
                       float(dyn + 5.0 * ped)))
    return sorted(scores, key=lambda kv: -kv[1])


def different_scores(bev_dir: Path, top: int, max_samples=None):
    """Greedy max-min diverse subset by BEV raster dissimilarity
    (find_different_nuscenes_samples.py equivalent)."""
    from bevgen_tpu.data.rasterize import load_bev_raster
    files = sorted(bev_dir.rglob("*.npz"))[:max_samples]
    if not files:
        return []
    feats = []
    for f in files:
        layers = load_bev_raster(f)
        small = layers[::16, ::16].reshape(-1)   # 16x16 thumbnail features
        feats.append(small)
    feats = np.stack(feats)
    chosen = [0]
    dists = np.linalg.norm(feats - feats[0], axis=1)
    while len(chosen) < min(top, len(files)):
        nxt = int(np.argmax(dists))
        chosen.append(nxt)
        dists = np.minimum(dists, np.linalg.norm(feats - feats[nxt], axis=1))
    return [f"{files[i].parent.name}_{files[i].stem}" for i in chosen]


def filter_outputs(root: Path, keep_frac: float, lpips_npz=None):
    """Drop the worst (1-keep)x samples by gen-vs-GT distance."""
    import cv2
    from bevgen_tpu.metrics.quality import LPIPSMetric, psnr
    lp = LPIPSMetric(lpips_npz) if lpips_npz else None
    tokens = sorted(p.name for p in (root / "sample").iterdir()
                    if p.is_dir())
    scored = []
    for tok in tokens:
        gen_files = sorted((root / "sample" / tok).glob("*.jpg"))
        vals = []
        for f in gen_files:
            gt_f = root / "sample_gt" / tok / f.name
            if not gt_f.exists():
                continue
            g = cv2.imread(str(f)).astype(np.float32) / 255.0
            t = cv2.imread(str(gt_f)).astype(np.float32) / 255.0
            if lp is not None and lp.available:
                vals.append(float(lp(g[None, ..., ::-1],
                                     t[None, ..., ::-1])[0]))
            else:
                vals.append(-psnr(g, t))   # lower is better
        scored.append((tok, float(np.mean(vals)) if vals else np.inf))
    scored.sort(key=lambda kv: kv[1])
    keep = {tok for tok, _ in scored[:int(len(scored) * keep_frac)]}
    removed = 0
    for tok, _ in scored:
        if tok not in keep:
            for sub in ("sample", "sample_gt", "viz"):
                p = root / sub / tok
                if p.is_dir():
                    shutil.rmtree(p)
                elif p.with_suffix(".png").exists():
                    p.with_suffix(".png").unlink()
            removed += 1
    return len(keep), removed


def main(argv=None):
    args = cli.parse_argv(argv)
    mode = args.pop("mode", "interesting")
    if mode == "interesting":
        bev_dir = Path(args.pop("bev_dir"))
        out = Path(args.pop("out", "interesting_tokens.txt"))
        top = int(args.pop("top", 100))
        scores = interesting_scores(bev_dir)[:top]
        out.write_text("\n".join(tok for tok, _ in scores))
        print(f"wrote {len(scores)} tokens to {out}")
    elif mode == "different":
        bev_dir = Path(args.pop("bev_dir"))
        out = Path(args.pop("out", "different_tokens.txt"))
        top = int(args.pop("top", 100))
        tokens = different_scores(bev_dir, top)
        out.write_text("\n".join(tokens))
        print(f"wrote {len(tokens)} tokens to {out}")
    elif mode == "filter":
        root = Path(args.pop("dir"))
        keep = float(args.pop("keep", 0.5))
        lpips_npz = args.pop("lpips_weights", None)
        kept, removed = filter_outputs(root, keep, lpips_npz)
        print(json.dumps({"kept": kept, "removed": removed}))
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
