"""End-to-end pipeline tests (tiny config, CPU)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.data.fake import fake_batch


@pytest.mark.slow
def test_full_generate_pipeline(tiny_pipe):
    pipe, params = tiny_pipe
    cfg = pipe.config.transformer
    batch = fake_batch(pipe.config, batch_size=2)
    seg = jnp.asarray(batch["segmentation"])
    ii = jnp.asarray(batch["intrinsics_inv"])
    ei = jnp.asarray(batch["extrinsics_inv"])

    images, ids = jax.jit(pipe.generate_fn)(params, seg, ii, ei,
                                            jax.random.PRNGKey(0))
    H, W = cfg.cam_res
    assert images.shape == (2, cfg.num_cams, H, W, 3)
    h, w = cfg.cam_latent_res
    assert ids.shape == (2, cfg.num_cams, h, w)
    assert np.isfinite(np.asarray(images)).all()


@pytest.mark.slow
def test_encode_decode_tokens_roundtrip(tiny_pipe):
    pipe, params = tiny_pipe
    cfg = pipe.config.transformer
    batch = fake_batch(pipe.config, batch_size=1)
    img = jnp.asarray(batch["image"])
    toks = pipe.encode_images(params, img)
    assert toks.shape == (1, cfg.num_cams,
                          pipe.config.first_stage.latent_resolution ** 2)
    h = w = pipe.config.first_stage.latent_resolution
    dec = pipe.decode_tokens(params, toks.reshape(1, cfg.num_cams, h, w))
    assert dec.shape[:2] == (1, cfg.num_cams)


@pytest.mark.slow
def test_encode_bev_token_range(tiny_pipe):
    pipe, params = tiny_pipe
    batch = fake_batch(pipe.config, batch_size=2)
    cond = pipe.encode_bev(params, jnp.asarray(batch["segmentation"]))
    arr = np.asarray(cond)
    n = pipe.config.cond_stage.n_embed
    assert (arr >= 0).all() and (arr < n).all()


def test_ar_sparse_pipeline_end_to_end():
    import jax
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.pipelines.ar_generate import ARPipeline
    cfg = tiny_test_config()
    # AR path with small sparse blocks on the tiny geometry
    import dataclasses
    cfg = dataclasses.replace(cfg, transformer=cfg.transformer.replace(
        sparse_block_size=8, density=0.8, camera_bias=False,
        bev_embed=False))
    pipe = ARPipeline.create(cfg, use_pallas=False)
    params = pipe.init_params(jax.random.PRNGKey(0))
    batch = fake_batch(cfg, batch_size=1)
    images, ids = jax.jit(pipe.generate_fn)(
        params, jnp.asarray(batch["segmentation"]),
        jnp.asarray(batch["intrinsics_inv"]),
        jnp.asarray(batch["extrinsics_inv"]), jax.random.PRNGKey(1))
    tf = cfg.transformer
    H, W = tf.cam_res
    assert images.shape == (1, tf.num_cams, H, W, 3)
    arr = np.asarray(ids)
    assert (arr >= 0).all() and (arr < tf.vocab_size).all()


@pytest.mark.slow
def test_sharded_generation_multichip(tiny_pipe):
    """Full generation SPMD over a dp x tp mesh (8 virtual devices)."""
    from bevgen_tpu.parallel import sharding as shd
    from bevgen_tpu.pipelines.generate import make_sharded_generate
    pipe, params = tiny_pipe
    mesh = shd.make_mesh(dp=4, tp=2)
    run, shard_params, shard_batch = make_sharded_generate(pipe, mesh)
    batch = fake_batch(pipe.config, batch_size=4)
    with mesh:
        p = shard_params(params)
        seg, ii, ei = shard_batch(jnp.asarray(batch["segmentation"]),
                                  jnp.asarray(batch["intrinsics_inv"]),
                                  jnp.asarray(batch["extrinsics_inv"]))
        images, ids = run(p, seg, ii, ei, jax.random.PRNGKey(0))
    cfg = pipe.config.transformer
    assert images.shape[:2] == (4, cfg.num_cams)
    arr = np.asarray(ids)
    assert (arr >= 0).all() and (arr < cfg.vocab_size).all()
    # SPMD sampling tracks the single-device run: TP all-reduce ordering
    # perturbs logits in the last ulps, so a few argmax/gumbel picks can
    # flip and each flip cascades through the remaining re-masking steps
    # of this tiny (vocab-24) model — require a strong agreement
    # fraction, not bit-equality
    single = jax.jit(pipe.generate_fn)(
        params, jnp.asarray(batch["segmentation"]),
        jnp.asarray(batch["intrinsics_inv"]),
        jnp.asarray(batch["extrinsics_inv"]), jax.random.PRNGKey(0))
    agreement = (arr == np.asarray(single[1])).mean()
    assert agreement > 0.8, f"SPMD/single agreement {agreement:.3f}"


@pytest.mark.slow
def test_dp_scaling_identical_outputs(tiny_pipe):
    """Pure-dp scaling of make_sharded_generate: a fixed global batch
    produces IDENTICAL token ids on 1, 2, 4 and 8 dp shards. dp has no
    cross-shard collectives in the forward, so unlike the dp x tp case
    (all-reduce ordering) there is no numerical excuse — sharding the
    batch must be bit-transparent."""
    from bevgen_tpu.parallel import sharding as shd
    from bevgen_tpu.pipelines.generate import make_sharded_generate
    pipe, params = tiny_pipe
    batch = fake_batch(pipe.config, batch_size=8)
    seg = jnp.asarray(batch["segmentation"])
    ii = jnp.asarray(batch["intrinsics_inv"])
    ei = jnp.asarray(batch["extrinsics_inv"])
    rng = jax.random.PRNGKey(3)

    results = {}
    for dp in (1, 2, 4, 8):
        mesh = shd.make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
        run, shard_params, shard_batch = make_sharded_generate(pipe, mesh)
        with mesh:
            p = shard_params(params)
            s, i2, e2 = shard_batch(seg, ii, ei)
            _, ids = run(p, s, i2, e2, rng)
        results[dp] = np.asarray(ids)

    for dp in (2, 4, 8):
        np.testing.assert_array_equal(
            results[1], results[dp],
            err_msg=f"dp={dp} generation diverged from dp=1")


@pytest.mark.slow
def test_rect_geometry_pipeline():
    """Non-square cameras (reference rect config 256x336 -> 16x21,
    multi_view_stage_1_cam_rect_argoverse.yaml): full pipeline at a
    tiny rectangular geometry."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.core.config import (MultiViewConfig, PipelineConfig,
                                        MuseConfig, Stage1Config,
                                        argoverse_rect_config)
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.pipelines.generate import BEVGenPipeline

    # the real preset derives the right token geometry
    real = argoverse_rect_config()
    assert real.transformer.cam_latent_res == (16, 21)
    assert real.transformer.num_cam_tokens == 336

    tf = MultiViewConfig(
        num_layers=1, num_heads=2, num_embed=32, hidden_size=32, dim_head=16,
        vocab_size=16, cond_vocab_size=16, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 48), cam_latent_res=(4, 6), bev_latent_res=(4, 4),
        sparse_block_size=1, window_len=4, density=1.0,
        causal_order=True, camera_bias=True, image_embed=True, bev_embed=True)
    s1 = Stage1Config(ch=8, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                      z_channels=8, n_embed=16, embed_dim=8, resolution=32,
                      attn_resolutions=(), cam_res=(32, 48),
                      cam_latent_res=(4, 6))
    bev = Stage1Config(in_channels=7, out_ch=7, n_labels=7, ch=8,
                       ch_mult=(1, 1, 2, 2), num_res_blocks=1, z_channels=8,
                       n_embed=16, embed_dim=8, resolution=32,
                       attn_resolutions=(), cam_res=(32, 32),
                       cam_latent_res=(4, 4))
    cfg = PipelineConfig(transformer=tf, first_stage=s1, cond_stage=bev,
                         muse=MuseConfig(sample_iterations=2))

    pipe = BEVGenPipeline.create(cfg, dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    batch = fake_batch(cfg, batch_size=1)
    images, ids = pipe.generate_fn(
        params, jnp.asarray(batch["segmentation"]),
        jnp.asarray(batch["intrinsics_inv"]),
        jnp.asarray(batch["extrinsics_inv"]), jax.random.PRNGKey(1))
    assert ids.shape == (1, 3, 4, 6)
    assert images.shape == (1, 3, 32, 48, 3)


@pytest.mark.slow
def test_sharded_generation_int8_multichip(tiny_pipe):
    """int8 W8A8 serving under dp x tp: kernel_q/scale follow the TP
    rules (parallel/sharding.py) and SPMD decode still runs."""
    from bevgen_tpu.parallel import sharding as shd
    from bevgen_tpu.pipelines.generate import make_sharded_generate
    pipe, params = tiny_pipe
    qpipe, qparams = pipe.quantized(params)
    mesh = shd.make_mesh(dp=4, tp=2)

    # TP rules hit the quantized kernels
    shardings = shd.param_shardings(qparams["maskgit"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    tp_sharded = [shd._path_str(p) for p, s in flat
                  if "tp" in str(s.spec)]
    assert any("kernel_q" in p for p in tp_sharded), tp_sharded[:5]

    run, shard_params, shard_batch = make_sharded_generate(qpipe, mesh)
    batch = fake_batch(qpipe.config, batch_size=4)
    with mesh:
        p = shard_params(qparams)
        seg, ii, ei = shard_batch(jnp.asarray(batch["segmentation"]),
                                  jnp.asarray(batch["intrinsics_inv"]),
                                  jnp.asarray(batch["extrinsics_inv"]))
        images, ids = run(p, seg, ii, ei, jax.random.PRNGKey(0))
    cfg = qpipe.config.transformer
    assert images.shape[:2] == (4, cfg.num_cams)
    arr = np.asarray(ids)
    assert (arr >= 0).all() and (arr < cfg.vocab_size).all()


@pytest.mark.slow
def test_ar_pipeline_end_to_end():
    """ARPipeline: BEV encode -> KV-cached AR decode -> VQ decode, plus
    the int8-weight serving tree (the legacy reference path served
    through cond_transformer_multi_view.py:155-227)."""
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.data.fake import fake_batch
    from bevgen_tpu.pipelines.ar_generate import ARPipeline

    cfg = tiny_test_config()
    pipe = ARPipeline.create(cfg, dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    batch = fake_batch(cfg, batch_size=1)
    args = (jnp.asarray(batch["segmentation"]),
            jnp.asarray(batch["intrinsics_inv"]),
            jnp.asarray(batch["extrinsics_inv"]))
    images, ids = jax.jit(pipe.generate_fn)(params, *args,
                                            jax.random.PRNGKey(1))
    tf = cfg.transformer
    assert images.shape == (1, tf.num_cams, *tf.cam_res, 3)
    arr = np.asarray(ids)
    assert (arr >= 0).all() and (arr < tf.vocab_size).all()

    qpipe, qparams = pipe.quantized(params)
    images_q, ids_q = jax.jit(qpipe.generate_fn)(qparams, *args,
                                                 jax.random.PRNGKey(1))
    assert images_q.shape == images.shape
    arr_q = np.asarray(ids_q)
    assert (arr_q >= 0).all() and (arr_q < tf.vocab_size).all()


@pytest.mark.slow
def test_sharded_ar_generation_multichip():
    """AR serving SPMD over dp x tp: GPT qkv/mlp kernels follow the TP
    rules and the cached decode runs under GSPMD."""
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.parallel import sharding as shd
    from bevgen_tpu.pipelines.ar_generate import (ARPipeline,
                                                  make_sharded_ar_generate)

    cfg = tiny_test_config()
    pipe = ARPipeline.create(cfg, dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    mesh = shd.make_mesh(dp=4, tp=2)

    shardings = shd.param_shardings(params["gpt"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    tp_paths = [shd._path_str(p) for p, s in flat if "tp" in str(s.spec)]
    assert any("query" in p for p in tp_paths), tp_paths[:5]
    assert any("mlp_proj" in p for p in tp_paths)

    batch = fake_batch(cfg, batch_size=4)
    run, shard_params, shard_batch = make_sharded_ar_generate(pipe, mesh)
    with mesh:
        p = shard_params(params)
        seg, ii, ei = shard_batch(jnp.asarray(batch["segmentation"]),
                                  jnp.asarray(batch["intrinsics_inv"]),
                                  jnp.asarray(batch["extrinsics_inv"]))
        images, ids = run(p, seg, ii, ei, jax.random.PRNGKey(0))
    tf = cfg.transformer
    assert images.shape[:2] == (4, tf.num_cams)
    arr = np.asarray(ids)
    assert (arr >= 0).all() and (arr < tf.vocab_size).all()


@pytest.mark.slow
def test_tp_forward_logits_match_single_device(tiny_pipe):
    """A single fp32 MaskGit forward under tensor parallelism (tp=2,
    sharded dense kernels + shard_map attention) must match the
    unsharded forward to reduction-reorder tolerance — isolates TP
    numerical fidelity from the iterative decode's sampling cascade."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bevgen_tpu.models.stage2.maskgit import MaskGit
    from bevgen_tpu.parallel import sharding as shd

    pipe, params = tiny_pipe
    cfg = pipe.config
    batch = fake_batch(cfg, batch_size=2)
    tf = cfg.transformer
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(
        0, tf.vocab_size, (2, tf.num_cams, tf.num_cam_tokens)), jnp.int32)
    cond = jnp.asarray(rng.integers(
        0, tf.cond_vocab_size, (2, tf.num_cond_tokens)), jnp.int32)
    ii = jnp.asarray(batch["intrinsics_inv"])
    ei = jnp.asarray(batch["extrinsics_inv"])
    mg_params = params["maskgit"]

    single = MaskGit(tf, cfg.muse)
    ref = np.asarray(
        jax.jit(lambda p: single.apply(p, ids, cond, ii, ei).logits)(
            mg_params))

    mesh = shd.make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    sharded_model = MaskGit(tf, cfg.muse, mesh=mesh)
    p_sh = jax.device_put(mg_params, shd.param_shardings(mg_params, mesh))
    rep = NamedSharding(mesh, P())
    with mesh:
        out = jax.jit(
            lambda p, a, c, i2, e2: sharded_model.apply(
                p, a, c, i2, e2).logits,
            in_shardings=(shd.param_shardings(mg_params, mesh),
                          rep, rep, rep, rep))(p_sh, ids, cond, ii, ei)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
