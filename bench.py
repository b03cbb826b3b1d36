"""Headline benchmark: multi-camera images/sec/chip for full scene
generation (BEV raster -> 18-step MaskGit decode w/ self-critic ->
VQ-GAN pixel decode), flagship Argoverse 7-cam config, bf16.

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
IMMEDIATELY after the headline measurement (flushed), then runs the
extra rows (int8 serving, serving batch, critic-free, AR path) in
priority order under a wall-clock budget (BENCH_BUDGET_S, default 1800 s)
and re-prints the final enriched line. The LAST JSON line on stdout is
the complete result; the early line is insurance against an external
timeout killing the extras (round-4 lesson: one terminal print lost
everything to a timeout, BENCH_r04.json rc=124).

Decode semantics: bit-equal to the reference's eval-mode generate. The
reference spends 4 sequential forwards/step, but its inference-time
classifier-free guidance is a training-gated no-op (cond-drop only
fires under `self.training`, muse_maskgit_pytorch.py:353-355, and its
SelfCritic discards the null pass, :393-395) — so 2 forwards determine
the outputs and we run exactly those 2 (demask + critic), proven equal
against the executed reference (tests/test_reference_execution.py).
The baseline below charges the reference for the 4 forwards it actually
executes; the 2-forward restructure is claimed as an algorithmic win
with unchanged outputs, not a semantics change.

Baseline derivation (scripts_dev/derive_baseline.py; every assumption
favors the reference):
  The reference publishes no end-to-end throughput, and the configs
  behind its micro-benchmark comments (scripts/inference.py:170-179) do
  not exist in the shipped checkout, so the 120.86 ms dense number has
  no recoverable batch size and cannot anchor a baseline. Instead we
  EXECUTE the actual reference models on torch-CPU under
  torch.profiler(with_flops=True):
    - MaskGitTransformerMultiView forward, measured at 3 and 5 cams
      (its Cameras enum tops out at 5) and extrapolated to 7 via the
      exact F(s) = a*s + b*s^2 matmul-FLOP scaling -> 959.9 GFLOP/scene
      -forward; stage-1 decode 252.8 GFLOP/camera; BEV encode 139.1.
    - Decode structure the reference executes per batch
      (muse_maskgit_pytorch.py:511-621): 18 steps x (2 CFG forwards +
      2 SelfCritic cond-scaled forwards) + 7 camera decodes + 1 BEV
      encode = 71.0 TFLOP/scene = 10.15 TFLOP/image.
    - A5000 dense fp16 tensor peak 111.1 TFLOP/s at an assumed 0.40
      whole-pipeline MFU — the TOP of what eager-mode fp16 torch with
      non-flash einsum attention (plus its un-billed elementwise l2norm/
      GEGLU/softmax work and python-loop overhead) achieves on Ampere;
      sensitivity: MFU 0.25 -> 2.7 img/s, 0.50 -> 5.5 img/s.
  => baseline 4.4 img/s. (The previous 1.2 estimate under-credited the
  reference; this replaces it with a measured-FLOP derivation.)
"""
import json
import os
import sys
import time

BASELINE_IMAGES_PER_SEC = 4.4  # reference A5000 estimate (see docstring)

_T0 = time.perf_counter()


def _remaining(budget):
    return budget - (time.perf_counter() - _T0)


def emit(result):
    """Print the result line, flushed, so an external timeout that kills
    the process later still leaves the most recent line in the tail."""
    print(json.dumps(result), flush=True)


def note(msg):
    print(f"[bench {time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def measure(pipe, params, cfg, batch_size, reps, no_critic):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bevgen_tpu.data.fake import fake_batch

    batch = fake_batch(cfg, batch_size=batch_size)
    seg = jnp.asarray(batch["segmentation"])
    ii = jnp.asarray(batch["intrinsics_inv"])
    ei = jnp.asarray(batch["extrinsics_inv"])

    @jax.jit
    def run(params, seg, ii, ei, rng):
        return pipe.generate_fn(params, seg, ii, ei, rng,
                                force_not_use_token_critic=no_critic)

    # warmup + compile. NOTE: on the tunneled axon platform
    # block_until_ready returns before remote execution completes, so we
    # synchronize by materializing one output scalar on the host.
    def run_sync(rng):
        imgs, ids = run(params, seg, ii, ei, rng)
        np.asarray(ids[0, 0, 0, 0])
        return imgs, ids

    run_sync(jax.random.PRNGKey(1))
    run_sync(jax.random.PRNGKey(100))  # second warmup: remote exec init

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        run_sync(jax.random.PRNGKey(2 + i))
        times.append(time.perf_counter() - t0)
    n_images = batch_size * cfg.transformer.num_cams
    import statistics
    # (median_img_per_s, min_based_img_per_s): the headline uses the
    # median — min-of-times flatters one lucky rep
    return (n_images / statistics.median(times), n_images / min(times))


AR_BASELINE_IMG_PER_S = 0.0639
# ^ derived like the MUSE baseline (scripts_dev/derive_ar_baseline.py,
# executed-reference FLOP counting): the reference AR sampler runs ONE
# FULL GPT FORWARD PER TOKEN (cond_transformer_multi_view.py:172-227) =
# 2100 x 1986.6 GFLOP = 695.3 TFLOP/image at the shipped nuScenes
# config; A5000 fp16 peak x 0.40 MFU -> 0.0639 img/s. Our KV-cached
# lax.scan decoder pays ~0.66 GFLOP/token instead — the ar_vs_reference
# ratio below is dominated by that algorithmic win, throttled by the
# sequential scan being device-op-LATENCY bound (see PERF_NOTES).


def measure_ar(reps, budget):
    """AR-path rows (VERDICT r2 item 4 + r3 item 6): the full AR
    pipeline on chip (BEV encode -> KV-cached sparse decode -> VQ pixel
    decode) at the TPU-native 128-block preset — batch sweep b2/b8 and
    a derived reference anchor — plus the train-step where the Pallas
    block-sparse kernel engages, with kernel-vs-dense attribution at
    the exact (B, H, L, D) attention shapes.

    Reference anchors: sparse_self_attention.py:64-85 (the kernel this
    path replaces), cond_transformer_multi_view.py:172-227 (the
    per-token full-forward sampler the derived baseline charges), and
    scripts/inference.py:170-179 (the density-sweep fwd+bwd
    micro-benchmarks that are the only published numbers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bevgen_tpu.core.config import nuscenes_ar_tpu_config
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.models import geometry, masks
    from bevgen_tpu.models.stage2 import ar as ar_mod
    from bevgen_tpu.ops.attention import make_sparse_attention
    from bevgen_tpu.pipelines.ar_generate import ARPipeline

    cfg = nuscenes_ar_tpu_config()
    tf = cfg.transformer
    out = {}

    # --- the kernel must actually engage on this preset's layouts ----
    sm = masks.sparse_masks(tf)
    attn_kernel = make_sparse_attention(sm.layouts, sm.allowed,
                                        block=tf.sparse_block_size,
                                        num_cond_tokens=tf.num_cond_tokens,
                                        num_pad_tokens=tf.num_pad_tokens)
    assert attn_kernel.pallas_ok, (
        "nuscenes_ar_tpu layout fell back to dense — AR bench rows "
        "would not measure the Pallas block-sparse kernel")

    def timed(run_sync, n):
        times = []
        run_sync(); run_sync()  # compile + remote-exec init
        for _ in range(n):
            t0 = time.perf_counter()
            run_sync()
            times.append(time.perf_counter() - t0)
        import statistics
        return statistics.median(times)

    # --- end-to-end AR serving (KV-cached decode applies the same
    # block layouts as per-row masks; the kernel runs in training and
    # full-forward paths where scores are matrix-shaped) -------------
    pipe = ARPipeline.create(cfg, dtype=jnp.bfloat16)
    params = pipe.init_params(jax.random.PRNGKey(0))
    gen = jax.jit(lambda p, s, i1, i2, r: pipe.generate_fn(p, s, i1, i2, r))
    kr = iter(jax.random.split(jax.random.PRNGKey(7), 64))

    sweep = [int(x) for x in os.environ.get(
        "BENCH_AR_BATCHES", "2,8").split(",") if x]
    for b in sweep:
        if b != sweep[0] and _remaining(budget) < 120:
            note(f"AR b{b} skipped (budget)")
            out.setdefault("skipped", []).append(f"ar_b{b}")
            continue
        batch = fake_batch(cfg, batch_size=b)
        seg = jnp.asarray(batch["segmentation"])
        ii = jnp.asarray(batch["intrinsics_inv"])
        ei = jnp.asarray(batch["extrinsics_inv"])

        def run_gen():
            imgs, ids = gen(params, seg, ii, ei, next(kr))
            np.asarray(ids[0, 0])
        dt = timed(run_gen, max(2, min(reps, 3)))
        ips = b * tf.num_cams / dt
        key = "ar_img_per_s" if b == sweep[0] else f"ar_img_per_s_b{b}"
        out[key] = round(ips, 3)
        if b == sweep[0]:
            out["ar_vs_reference"] = round(ips / AR_BASELINE_IMG_PER_S, 1)

    # int8-weight GPT serving row (halved per-step weight traffic —
    # the decode step is HBM-bound after the stacked-scan/prefix work)
    if _remaining(budget) >= 90:
        qpipe, qparams = pipe.quantized(params)
        qgen = jax.jit(lambda p, s, i1, i2, r: qpipe.generate_fn(
            p, s, i1, i2, r))
        b0 = sweep[0]
        batch = fake_batch(cfg, batch_size=b0)
        seg = jnp.asarray(batch["segmentation"])
        ii = jnp.asarray(batch["intrinsics_inv"])
        ei = jnp.asarray(batch["extrinsics_inv"])

        def run_qgen():
            imgs, ids = qgen(qparams, seg, ii, ei, next(kr))
            np.asarray(ids[0, 0])
        dt = timed(run_qgen, max(2, min(reps, 3)))
        out["ar_img_per_s_int8"] = round(b0 * tf.num_cams / dt, 3)
    else:
        out.setdefault("skipped", []).append("ar_int8")

    if _remaining(budget) < 90:
        note("AR train/attribution rows skipped (budget)")
        out.setdefault("skipped", []).append("ar_train_attr")
        return out

    # --- train step (fwd+bwd) with the kernel active ------------------
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(
        0, tf.vocab_size, (4, tf.num_cams, tf.num_cam_tokens)), jnp.int32)
    cond = jnp.asarray(rng.integers(
        0, tf.cond_vocab_size, (4, tf.num_cond_tokens)), jnp.int32)
    ii4, ei4 = geometry.canonical_rig_inverses(tf, 4)
    from bevgen_tpu.models.stage2.gpt import SparseGPT
    gpt = SparseGPT(tf, dtype=jnp.bfloat16)
    gparams = gpt.init(jax.random.PRNGKey(0), tokens, cond,
                       jnp.asarray(ii4), jnp.asarray(ei4))
    grad_fn = jax.jit(jax.grad(lambda p, t: ar_mod.ar_loss(
        gpt, p, t, cond, jnp.asarray(ii4), jnp.asarray(ei4),
        deterministic=True)))

    def run_train():
        g = grad_fn(gparams, tokens)
        np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0]
    out["ar_train_step_ms_b4"] = round(
        timed(run_train, max(2, min(reps, 3))) * 1e3, 1)

    # --- kernel-vs-dense attribution at the real attention shapes ----
    L = tf.gpt_block_size
    B, H, D = 4, tf.num_heads, tf.hidden_size // tf.num_heads
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    attn_dense = make_sparse_attention(sm.layouts, sm.allowed,
                                       block=tf.sparse_block_size,
                                       use_pallas=False,
                                       num_cond_tokens=tf.num_cond_tokens,
                                       num_pad_tokens=tf.num_pad_tokens)
    for name, fn in (("kernel", attn_kernel), ("dense", attn_dense)):
        chain = jax.jit(lambda x, fn=fn: jax.lax.scan(
            lambda c, _: (fn(c, k, v).astype(x.dtype), None),
            x, None, length=8)[0])

        def run_attn():
            np.asarray(chain(q).ravel()[0])
        out[f"ar_attn_{name}_ms"] = round(
            timed(run_attn, max(2, min(reps, 3))) / 8 * 1e3, 2)
    return out


def main():
    import jax.numpy as jnp
    import jax
    from bevgen_tpu.core.config import argoverse_muse_7cam_config
    from bevgen_tpu.pipelines.generate import BEVGenPipeline

    # persistent XLA compile cache: the tunneled remote compile service
    # takes minutes per b16 program and serializes across clients — a
    # warm cache makes repeat bench runs start in seconds
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_tpu_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # wall-clock budget for the run: the headline ALWAYS prints (first,
    # flushed); each extra row only starts if enough budget remains for
    # its (warm-cache) estimated cost. Skipped rows are listed in the
    # final line's "skipped" field so a truncated run is visible, not
    # silent.
    budget = float(os.environ.get("BENCH_BUDGET_S", "1800"))

    # headline = the BASELINE.md-named workload (batch 16). The measured
    # serving optimum is batch 2-4 (docs/PERF_NOTES.md round-4 sweep:
    # 16.3 / 19.4 / 19.5 / 18.8 / 17.5 img/s at b1/2/4/8/16 — a hump
    # peaking at b4) — reported alongside so neither number hides the
    # other.
    headline_batch = int(os.environ.get("BENCH_BATCH", "16"))
    serving_batch = int(os.environ.get("BENCH_SERVING_BATCH", "2"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    cfg = argoverse_muse_7cam_config()
    pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
    params = pipe.init_params(jax.random.PRNGKey(0))
    quant = os.environ.get("BENCH_QUANT", "0") == "1"
    if quant:
        # int8 W8A8 decode transformer (ops/quant.py) — serving option
        pipe, params = pipe.quantized(params, batch_hint=None)
    # serve without the critic pass (reference force_not_use_token_critic,
    # muse_maskgit_pytorch.py:521) — 1 transformer forward/step instead of 2
    no_critic = os.environ.get("BENCH_NO_CRITIC", "0") == "1"

    note(f"headline b{headline_batch} starting (budget {budget:.0f}s)")
    ips, ips_min = measure(pipe, params, cfg, headline_batch, reps,
                           no_critic)
    mode = ("confidence re-mask" if no_critic else "self-critic")
    dtype_s = "int8" if quant else "bf16"
    result = {
        "metric": "multi-cam images/sec/chip (7-camera 256px scene "
                  f"generation, batch {headline_batch}, 18-step MaskGit + "
                  f"{mode} + VQ decode, {dtype_s}, median of {reps})",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
        "value_from_min": round(ips_min, 3),
        "reps": reps,
    }
    emit(result)  # the insurance line — the headline survives any
    #               external timeout that kills the extras below
    skipped = []

    def want(name, est_cost_s):
        if _remaining(budget) >= est_cost_s:
            note(f"{name} starting ({_remaining(budget):.0f}s left)")
            return True
        note(f"{name} skipped (budget: {_remaining(budget):.0f}s left, "
             f"needs ~{est_cost_s:.0f}s)")
        skipped.append(name)
        return False

    extras_on = os.environ.get("BENCH_SKIP_EXTRAS", "0") != "1"

    # Priority 1: the int8 serving row — the >=5x evidence (round-4
    # sweep: b3 is the int8 optimum; same 18-step self-critic decode
    # structure as the headline, int8 numerics the only delta; fidelity
    # dossier: docs/FIDELITY.md / tests/test_int8_fidelity.py).
    if (extras_on and not quant and not no_critic
            and os.environ.get("BENCH_SKIP_INT8", "0") != "1"
            and want("int8_serving_b3", 150)):
        qpipe, qparams = pipe.quantized(params, batch_hint=None)
        q8s, _ = measure(qpipe, qparams, cfg, 3, reps, False)
        result["int8_serving_b3"] = round(q8s, 3)
        result["int8_serving_vs_baseline"] = round(
            q8s / BASELINE_IMAGES_PER_SEC, 3)
        emit(result)
    else:
        qpipe = qparams = None

    # Priority 2: bf16 serving-optimum batch.
    if serving_batch and serving_batch != headline_batch \
            and want(f"serving_batch{serving_batch}", 90):
        sb, _ = measure(pipe, params, cfg, serving_batch, reps, no_critic)
        result["serving_batch%d" % serving_batch] = round(sb, 3)
        emit(result)

    if extras_on and not no_critic:
        # Priority 3: the reference's own critic-free serving mode
        # (force_not_use_token_critic, muse_maskgit_pytorch.py:521,556)
        # — one forward/step instead of two
        if want("critic_free", 120):
            cf, _ = measure(pipe, params, cfg, headline_batch, reps, True)
            result["critic_free"] = round(cf, 3)
            result["critic_free_vs_baseline"] = round(
                cf / BASELINE_IMAGES_PER_SEC, 3)
            emit(result)
        # Priority 4: int8 at the headline batch (honest row — int8 is
        # SLOWER than bf16 at b16; the crossover guard exists for this)
        if qpipe is not None and want("int8_b16", 150):
            q8, _ = measure(qpipe, qparams, cfg, headline_batch, reps,
                            False)
            result["int8"] = round(q8, 3)
            emit(result)

    if os.environ.get("BENCH_SKIP_AR", "0") != "1" and not quant \
            and not no_critic and want("ar_rows", 240):
        # AR-path rows (block-sparse kernel engaged) — see measure_ar
        result.update(measure_ar(reps, budget))

    if skipped:
        result["skipped"] = skipped + result.pop("skipped", [])
    note("done")
    emit(result)


if __name__ == "__main__":
    main()
