"""Multi-slice (ICI + DCN) mesh support.

A multi-slice TPU job exposes devices from several slices; the mesh
must put the slice dimension on its own leading `dcn` axis so that the
only collective crossing the slow DCN links is the per-step gradient
reduction — dp/tp collectives and the ZeRO moment gathers ride ICI
within a slice (parallel/sharding.py docstring). Emulated here on the
8 virtual CPU devices: "slices" are contiguous device groups; sharding
the batch over ('dcn', 'dp') must be numerically transparent vs the
equivalent flat-dp mesh.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.parallel import sharding as shd

# whole-module: multi-device train/generate compiles are 30-60 s each
# on this single-core host (fast-lane equivalents live in
# test_training/test_pipeline)
pytestmark = pytest.mark.slow


def test_make_mesh_dcn_axes():
    mesh = shd.make_mesh(dp=2, tp=2, dcn=2)
    assert mesh.axis_names == ("dcn", "dp", "tp")
    assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "tp": 2}
    assert shd.batch_axes(mesh) == ("dcn", "dp")
    assert shd.data_parallelism(mesh) == 4
    flat = shd.make_mesh(dp=4, tp=2)
    assert shd.batch_axes(flat) == ("dp",)
    assert shd.data_parallelism(flat) == 4
    # dp inferred from the device count when omitted
    inferred = shd.make_mesh(tp=1, dcn=2)
    assert dict(inferred.shape) == {"dcn": 2, "dp": 4, "tp": 1}


def test_make_multislice_mesh_groups_by_slice():
    devs = jax.devices()
    # emulate two slices of four devices (real TPU devices carry
    # slice_index; CPU devices don't, so inject the mapping)
    mesh = shd.make_multislice_mesh(
        tp=2, devices=devs, slice_index_of=lambda d: d.id // 4)
    assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "tp": 2}
    # slice-major: every device in mesh row s belongs to slice s, so no
    # dp/tp collective crosses a slice boundary
    arr = np.asarray(mesh.devices)
    for s in range(2):
        assert {d.id // 4 for d in arr[s].ravel()} == {s}
    # single-slice falls back to a flat (dp, tp) mesh
    flat = shd.make_multislice_mesh(tp=2, devices=devs)
    assert flat.axis_names == ("dp", "tp")
    assert dict(flat.shape) == {"dp": 4, "tp": 2}


def _tiny_train_setup():
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.models import geometry
    from bevgen_tpu.models.stage2.maskgit import MaskGit
    from bevgen_tpu.training import optim, trainer

    pipe_cfg = tiny_test_config()
    cfg = pipe_cfg.transformer
    model = MaskGit(cfg, pipe_cfg.muse)
    b = 4
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(
        0, cfg.vocab_size, (b, cfg.num_cams, cfg.num_cam_tokens)), jnp.int32)
    cond = jnp.asarray(rng.integers(
        0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens)), jnp.int32)
    ii, ei = map(jnp.asarray, geometry.canonical_rig_inverses(cfg, b))
    batch = {"tokens": tokens, "cond_ids": cond,
             "intrinsics_inv": ii, "extrinsics_inv": ei}
    params = model.init(jax.random.PRNGKey(0), tokens, cond, ii, ei,
                        method=MaskGit.init_all)
    tx = optim.maskgit_optimizer(1e-4, warmup_steps=2, total_steps=10,
                                 params_example=params["params"])
    state = trainer.create_train_state(params, tx)
    return model, tx, state, batch


def test_multislice_train_step_matches_flat_dp():
    """One sharded train step on a (dcn=2, dp=2, tp=1) mesh vs the flat
    dp=4 mesh: pure data-parallel splitting either way, so the loss and
    the updated params must agree to numerical noise."""
    from bevgen_tpu.training import trainer

    results = {}
    for name, mesh in (
            ("flat", shd.make_mesh(dp=4, tp=1, devices=jax.devices()[:4])),
            ("dcn", shd.make_mesh(dp=2, tp=1, dcn=2,
                                  devices=jax.devices()[:4]))):
        model, tx, state, batch = _tiny_train_setup()
        step_fn, state = trainer.make_sharded_train_step(model, tx, mesh,
                                                         state)
        with mesh:
            sharded = shd.shard_batch(batch, mesh)
            state, metrics = step_fn(state, sharded, jax.random.PRNGKey(1))
        leaves = jax.tree_util.tree_leaves(
            jax.device_get(state.params["params"]))
        results[name] = (float(metrics["loss"]), leaves)

    assert np.isfinite(results["flat"][0])
    np.testing.assert_allclose(results["flat"][0], results["dcn"][0],
                               rtol=1e-5)
    for a, b in zip(results["flat"][1], results["dcn"][1]):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_multislice_train_step_with_tp(capfd):
    """Full 3-axis (dcn=2, dp=2, tp=2) mesh over all 8 virtual devices:
    the shard_map attention cores + ZeRO moment sharding compile and
    produce a finite loss — and the SPMD partitioner must not fall back
    to 'Involuntary full rematerialization' anywhere (every such
    fallback is a per-step all-gather of a resharded tensor; grads are
    pinned to the moment shardings and scatter-fed embedding tables
    keep replicated moments precisely to avoid them)."""
    from bevgen_tpu.training import trainer

    mesh = shd.make_mesh(dp=2, tp=2, dcn=2)
    model, tx, state, batch = _tiny_train_setup()
    step_fn, state = trainer.make_sharded_train_step(model, tx, mesh, state)
    capfd.readouterr()  # drop anything earlier tests left on the fds
    with mesh:
        sharded = shd.shard_batch(batch, mesh)
        state, metrics = step_fn(state, sharded, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, (
        "SPMD partitioner rematerialization warning during the sharded "
        "train-step compile:\n" +
        "\n".join(l for l in err.splitlines() if "Involuntary" in l))
    assert np.isfinite(loss)
    assert float(metrics["update_applied"]) == 1.0


def test_multislice_generate_identical_to_single_device(tiny_pipe):
    """Sharded generation over a (dcn=2, dp=2) mesh produces token ids
    IDENTICAL to the single-device run: batch sharding over ('dcn','dp')
    introduces no cross-shard collectives in the forward, so — like the
    flat dp-scaling case — it must be bit-transparent."""
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.pipelines.generate import make_sharded_generate

    pipe, params = tiny_pipe
    batch = fake_batch(pipe.config, batch_size=4)
    seg = jnp.asarray(batch["segmentation"])
    ii = jnp.asarray(batch["intrinsics_inv"])
    ei = jnp.asarray(batch["extrinsics_inv"])
    rng = jax.random.PRNGKey(3)

    single = jax.jit(pipe.generate_fn)(params, seg, ii, ei, rng)

    mesh = shd.make_mesh(dp=2, tp=1, dcn=2, devices=jax.devices()[:4])
    run, shard_params, shard_batch = make_sharded_generate(pipe, mesh)
    with mesh:
        p = shard_params(params)
        s, i2, e2 = shard_batch(seg, ii, ei)
        _, ids = run(p, s, i2, e2, rng)

    np.testing.assert_array_equal(np.asarray(single[1]), np.asarray(ids))


def _tiny_ar_setup():
    from bevgen_tpu.core.config import MultiViewConfig
    from bevgen_tpu.models.stage2.gpt import SparseGPT
    from bevgen_tpu.training import optim, trainer

    cfg = MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        vocab_size=32, cond_vocab_size=32, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
        window_len=4, sparse_block_size=8, density=0.8,
        causal_order=True, camera_bias=True, image_embed=True,
        bev_embed=False, legacy_prob_matrix=False)
    model = SparseGPT(cfg)
    b = 4
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(
        0, cfg.vocab_size, (b, cfg.num_cams, cfg.num_cam_tokens)), jnp.int32)
    cond = jnp.asarray(rng.integers(
        0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens)), jnp.int32)
    from bevgen_tpu.models import geometry
    ii, ei = map(jnp.asarray, geometry.canonical_rig_inverses(cfg, b))
    batch = {"tokens": tokens, "cond_ids": cond,
             "intrinsics_inv": ii, "extrinsics_inv": ei}
    params = model.init(jax.random.PRNGKey(0), tokens, cond, ii, ei)
    tx = optim.maskgit_optimizer(1e-4, warmup_steps=2, total_steps=10,
                                 params_example=params["params"])
    state = trainer.create_ar_train_state(params, tx)
    return model, tx, state, batch


def test_ar_sharded_train_step_matches_single_device():
    """The AR SparseGPT sharded train step (whole-step shard_map over
    the batch axes, grads pmean-ed — trainer.make_ar_sharded_train_step,
    the dryrun's third line): a (dp=4) mesh and the degenerate (dp=1)
    mesh must produce the same loss and updated params — data-parallel
    splitting is numerically transparent at equal global batch."""
    from bevgen_tpu.training import trainer

    results = {}
    for name, mesh in (
            ("dp4", shd.make_mesh(dp=4, tp=1, devices=jax.devices()[:4])),
            ("dp1", shd.make_mesh(dp=1, tp=1, devices=jax.devices()[:1]))):
        model, tx, state, batch = _tiny_ar_setup()
        step_fn, state = trainer.make_ar_sharded_train_step(model, tx, mesh,
                                                            state)
        with mesh:
            sharded = shd.shard_batch(batch, mesh)
            state, metrics = step_fn(state, sharded)
        leaves = jax.tree_util.tree_leaves(
            jax.device_get(state.params["params"]))
        results[name] = (float(metrics["loss"]), leaves)

    assert np.isfinite(results["dp4"][0])
    np.testing.assert_allclose(results["dp4"][0], results["dp1"][0],
                               rtol=1e-5)
    for a, b in zip(results["dp4"][1], results["dp1"][1]):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def _tiny_gen_setup(batch=8):
    """Deterministic tiny generate setup shared with the two-process
    worker (tests/distributed_worker.py): every process (and the parent
    test) rebuilds the identical pipe/params/batch/rng from seeds."""
    import dataclasses

    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.pipelines.generate import BEVGenPipeline

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, muse=dataclasses.replace(cfg.muse, sample_iterations=2))
    pipe = BEVGenPipeline.create(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    b = fake_batch(cfg, batch_size=batch, seed=5)
    arrays = (jnp.asarray(b["segmentation"]),
              jnp.asarray(b["intrinsics_inv"]),
              jnp.asarray(b["extrinsics_inv"]))
    return pipe, params, arrays, jax.random.PRNGKey(11)
