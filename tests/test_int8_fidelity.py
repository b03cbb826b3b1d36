"""int8-vs-bf16 fidelity (VERDICT r4 item 2; BASELINE.json quality gate).

The flagship dossier runs on TPU (scripts_dev/int8_fidelity.py ->
docs/fidelity.json / docs/FIDELITY.md). This test drills the same
machinery at the tiny config on CPU with RELATIVE assertions that are
robust to random weights: the int8 pipeline's outputs must be closer to
the bf16 pipeline's (same rng) than a bf16 re-sample with a different
rng is — i.e. int8 returns "the same scene, slightly perturbed", not
"an equally plausible different scene". Reference decode semantics:
muse_maskgit_pytorch.py:511-621 (unchanged across both pipelines; int8
numerics are the only delta)."""
import numpy as np
import pytest

from bevgen_tpu.core.config import tiny_test_config
from bevgen_tpu.pipelines.generate import BEVGenPipeline
from scripts_dev.int8_fidelity import run_config


@pytest.mark.slow
def test_int8_closer_than_resample():
    cfg = tiny_test_config()
    s = run_config(cfg, BEVGenPipeline, weight_seeds=(0,),
                   runs_per_weight=2, batch=2)

    # token space: int8 decode trajectory tracks the bf16 one far above
    # the different-rng anchor, at every aggregate
    assert s["final_token_match"]["mean"] > \
        s["final_token_match_anchor"]["mean"]
    # pixel space
    assert s["pixel_rmse"]["mean"] < s["pixel_rmse_anchor"]["mean"]
    # perceptual proxy space
    assert s["lpips_proxy"]["mean"] < s["lpips_proxy_anchor"]["mean"]

    # the trajectory starts identical (step-0 demask sees identical
    # all-masked input; agreement can only diverge after sampling) and
    # the last trajectory entry IS the final ids
    steps = s["per_step_token_agreement"]
    # the summary rounds the per-step list to 4 decimals
    assert steps[-1] == pytest.approx(s["final_token_match"]["mean"],
                                      abs=1e-4)
    assert len(steps) == cfg.muse.sample_iterations


@pytest.mark.slow
def test_trajectory_matches_plain_generate():
    """return_trajectory must not perturb the decode: final ids equal
    the plain generate_fn's ids bit-for-bit."""
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.data.fake import fake_batch

    cfg = tiny_test_config()
    pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
    params = pipe.init_params(jax.random.PRNGKey(3))
    b = fake_batch(cfg, batch_size=2, seed=5)
    seg = jnp.asarray(b["segmentation"])
    ii = jnp.asarray(b["intrinsics_inv"])
    ei = jnp.asarray(b["extrinsics_inv"])
    rng = jax.random.PRNGKey(9)
    _, ids = pipe.generate_fn(params, seg, ii, ei, rng)
    _, ids_t, traj = pipe.generate_fn(params, seg, ii, ei, rng,
                                      return_trajectory=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_t))
    hw = cfg.transformer.num_cam_tokens
    np.testing.assert_array_equal(
        np.asarray(traj[-1]).reshape(ids.shape[0], cfg.transformer.num_cams,
                                     hw),
        np.asarray(ids).reshape(ids.shape[0], cfg.transformer.num_cams, hw))
