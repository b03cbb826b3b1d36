"""int8-vs-bf16 fidelity dossier (VERDICT r4 item 2).

Quantifies what the int8 W8A8 serving pipeline (ops/quant.py) changes
relative to the proven-faithful bf16 pipeline, on REAL-LAYOUT synthetic
weights (init_params at the flagship argoverse_muse_7cam config), since
trained checkpoints are environment-gated. For each (weight seed,
input/rng seed) pair the SAME inputs + decode rng run through both
pipelines (batch 3 = the int8 serving optimum), measuring:

  * per-decode-step token agreement rate (post-commit ids, all 18 steps)
  * final-token match %
  * pixel RMSE between generated images (decoder output range [-1, 1])
  * LPIPS-proxy distance: random-feature VGG16 perceptual distance
    (models/lpips.py backbone at a FIXED random init, lin heads replaced
    by uniform channel averages — the trained heads are gated; random
    VGG features are a standard perceptual proxy)

Every metric is ANCHORED against the same quantity computed between two
bf16 runs that differ only in decode rng ("different sample of the same
scene") — the scale that separates "int8 returns the same scene" from
"int8 returns an equally plausible different scene". FID-within-2% is
unverifiable without trained checkpoints; token/pixel/perceptual
agreement against this anchor is the strongest available proxy
(BASELINE.json quality gate).

Writes docs/fidelity.json and prints the docs/FIDELITY.md table rows.
Run on the TPU from /root/repo:  python scripts_dev/int8_fidelity.py
(CPU works too — slower; the slow-lane test runs a tiny-config version,
tests/test_int8_fidelity.py).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_lpips_proxy():
    """Random-feature VGG16 perceptual distance: fixed-seed random conv
    stack, lin heads = uniform channel average (non-negative, so the
    distance is a proper pseudo-metric)."""
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.models.lpips import LPIPS

    model = LPIPS()
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1234), x0, x0)

    def fix_lin(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if any(str(n).startswith("lin_") for n in names):
            cin = leaf.shape[-2]
            return jnp.full(leaf.shape, 1.0 / cin, leaf.dtype)
        return leaf

    params = jax.tree_util.tree_map_with_path(fix_lin, params)
    fn = jax.jit(lambda a, b: model.apply(params, a, b))

    def dist(a, b):
        """a, b: (n, h, w, 3) in [-1, 1]. Returns (n,) distances."""
        return np.asarray(fn(jnp.asarray(a, jnp.float32),
                             jnp.asarray(b, jnp.float32)))

    return dist


def run(weight_seeds=(0, 1), runs_per_weight=10, batch=3, out_json=None):
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.core.config import argoverse_muse_7cam_config
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.pipelines.generate import BEVGenPipeline

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_tpu_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = argoverse_muse_7cam_config()
    return run_config(cfg, BEVGenPipeline, weight_seeds, runs_per_weight,
                      batch, out_json)


def run_config(cfg, pipeline_cls, weight_seeds, runs_per_weight, batch,
               out_json=None, fake_batch_fn=None):
    import jax
    import jax.numpy as jnp

    if fake_batch_fn is None:
        from bevgen_tpu.data.fake import fake_batch as fake_batch_fn

    lpips = make_lpips_proxy()
    T = cfg.muse.sample_iterations
    per_step_agree = np.zeros(T)
    per_step_agree_anchor = np.zeros(T)
    rows = []
    n_runs = 0
    t_start = time.perf_counter()

    for ws in weight_seeds:
        pipe = pipeline_cls.create(cfg, dtype=jnp.bfloat16)
        params = pipe.init_params(jax.random.PRNGKey(ws))
        qpipe, qparams = pipe.quantized(params, batch_hint=None)

        gen = jax.jit(lambda p, s, i1, i2, r, pi=pipe: pi.generate_fn(
            p, s, i1, i2, r, return_trajectory=True))
        qgen = jax.jit(lambda p, s, i1, i2, r, pi=qpipe: pi.generate_fn(
            p, s, i1, i2, r, return_trajectory=True))

        for i in range(runs_per_weight):
            seed = 1000 * ws + i
            b = fake_batch_fn(cfg, batch_size=batch, seed=seed)
            seg = jnp.asarray(b["segmentation"])
            ii = jnp.asarray(b["intrinsics_inv"])
            ei = jnp.asarray(b["extrinsics_inv"])
            rng = jax.random.PRNGKey(77 + seed)
            rng2 = jax.random.PRNGKey(7700 + seed)  # anchor: different rng

            img_b, ids_b, tr_b = gen(params, seg, ii, ei, rng)
            img_q, ids_q, tr_q = qgen(qparams, seg, ii, ei, rng)
            img_a, ids_a, tr_a = gen(params, seg, ii, ei, rng2)

            tr_b, tr_q, tr_a = (np.asarray(t) for t in (tr_b, tr_q, tr_a))
            ids_b, ids_q, ids_a = (np.asarray(t)
                                   for t in (ids_b, ids_q, ids_a))
            img_b, img_q, img_a = (
                np.asarray(t, np.float32) for t in (img_b, img_q, img_a))

            per_step_agree += (tr_b == tr_q).mean(axis=(1, 2, 3))
            per_step_agree_anchor += (tr_b == tr_a).mean(axis=(1, 2, 3))

            flat = lambda im: im.reshape((-1,) + im.shape[2:])
            row = {
                "weight_seed": ws, "seed": seed,
                "final_match": float((ids_b == ids_q).mean()),
                "final_match_anchor": float((ids_b == ids_a).mean()),
                "pixel_rmse": float(np.sqrt(((img_b - img_q) ** 2).mean())),
                "pixel_rmse_anchor": float(
                    np.sqrt(((img_b - img_a) ** 2).mean())),
                "lpips_proxy": float(lpips(flat(img_b), flat(img_q)).mean()),
                "lpips_proxy_anchor": float(
                    lpips(flat(img_b), flat(img_a)).mean()),
            }
            rows.append(row)
            n_runs += 1
            print(f"[fidelity {time.perf_counter() - t_start:6.1f}s] "
                  f"ws={ws} seed={seed} final={row['final_match']:.3f} "
                  f"(anchor {row['final_match_anchor']:.3f}) "
                  f"rmse={row['pixel_rmse']:.4f} "
                  f"(anchor {row['pixel_rmse_anchor']:.4f})",
                  file=sys.stderr, flush=True)

    def agg(key):
        v = np.array([r[key] for r in rows])
        return {"mean": float(v.mean()), "min": float(v.min()),
                "max": float(v.max())}

    summary = {
        "config": "argoverse_muse_7cam (flagship), batch %d" % batch,
        "n_runs": n_runs,
        "n_scenes": n_runs * batch,
        "weights": "init_params synthetic, real layouts, seeds %s"
                   % (list(weight_seeds),),
        "per_step_token_agreement": [
            round(float(x), 4) for x in per_step_agree / n_runs],
        "per_step_token_agreement_anchor_bf16_diff_rng": [
            round(float(x), 4) for x in per_step_agree_anchor / n_runs],
        "final_token_match": agg("final_match"),
        "final_token_match_anchor": agg("final_match_anchor"),
        "pixel_rmse": agg("pixel_rmse"),
        "pixel_rmse_anchor": agg("pixel_rmse_anchor"),
        "lpips_proxy": agg("lpips_proxy"),
        "lpips_proxy_anchor": agg("lpips_proxy_anchor"),
        "rows": rows,
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {out_json}", file=sys.stderr)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"},
                     indent=1))
    return summary


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "fidelity.json")
    runs = int(os.environ.get("FIDELITY_RUNS", "10"))
    run(runs_per_weight=runs, out_json=out)
