"""Training-stack tests: stage-1 GAN/seg steps, optimizer partition,
EMA, warmup-cosine, sharded stage-2 step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import Stage1Config, tiny_test_config
from bevgen_tpu.models.discriminator import NLayerDiscriminator
from bevgen_tpu.models.stage1.vq import VQModel, VQSegmentationModel
from bevgen_tpu.training import losses, optim, stage1_trainer


def small_cfg(**kw):
    base = dict(ch=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
                resolution=16, z_channels=16, n_embed=16, embed_dim=8)
    base.update(kw)
    return Stage1Config(**base)


@pytest.mark.slow
def test_vqgan_train_step_runs_and_improves_nothing_nan():
    cfg = small_cfg()
    model = VQModel(cfg)
    disc = NLayerDiscriminator(ndf=8, n_layers=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 16, 3)).astype(np.float32))
    state, tx_ae, tx_disc = stage1_trainer.create_stage1_state(
        model, disc, jax.random.PRNGKey(0), x, lr=1e-4)
    step = jax.jit(stage1_trainer.make_vqgan_train_step(
        model, disc, tx_ae, tx_disc, disc_start=0))
    metrics = None
    for i in range(2):
        state, metrics = step(state, x, jax.random.PRNGKey(i))
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics["train/d_weight"]) >= 0


@pytest.mark.slow
def test_seg_train_step():
    cfg = small_cfg(in_channels=7, out_ch=7, n_labels=7)
    model = VQSegmentationModel(cfg)
    x = jnp.asarray((np.random.default_rng(0).uniform(
        size=(2, 16, 16, 7)) < 0.3).astype(np.float32))
    state, tx_ae, _ = stage1_trainer.create_stage1_state(
        model, None, jax.random.PRNGKey(0), x, lr=1e-3)
    step = jax.jit(stage1_trainer.make_seg_train_step(model, tx_ae))
    losses_seen = []
    for i in range(25):
        state, metrics = step(state, x, jax.random.PRNGKey(i))
        losses_seen.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses_seen)
    # same batch repeatedly: loss should go down
    assert min(losses_seen[10:]) < losses_seen[0]


def test_decay_mask_partition():
    params = {
        "dense": {"kernel": np.zeros((4, 4)), "bias": np.zeros(4)},
        "token_emb": {"embedding": np.zeros((10, 4))},
        "norm": {"scale": np.ones(4)},
        "camera_bias_emb": np.zeros(16),
    }
    mask = optim.decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["token_emb"]["embedding"] is False
    assert mask["norm"]["scale"] is False
    assert mask["camera_bias_emb"] is False


def test_decay_mask_excludes_conv_geometric_embeds():
    """The reference whitelists torch.nn.Linear only: its Conv2d
    img_embed/cam_embed/bev_embed land in the wd=0.0 group
    (cond_transformer_multi_view.py:413,443-444)."""
    params = {
        "img_embed": {"kernel": np.zeros((4, 4))},
        "cam_embed": {"kernel": np.zeros((4, 4))},
        "bev_embed": {"kernel": np.zeros((2, 4)), "bias": np.zeros(4)},
        "to_q": {"kernel": np.zeros((4, 4))},
    }
    mask = optim.decay_mask(params)
    assert mask["img_embed"]["kernel"] is False
    assert mask["cam_embed"]["kernel"] is False
    assert mask["bev_embed"]["kernel"] is False
    assert mask["bev_embed"]["bias"] is False
    assert mask["to_q"]["kernel"] is True


def test_warmup_cosine_schedule():
    s = optim.warmup_cosine(1.0, warmup_steps=10, total_steps=110)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-6)
    assert float(s(60)) < 1.0


def test_ema_update_moves_toward_params():
    p0 = {"w": jnp.zeros(3)}
    ema = optim.ema_init(p0)
    p1 = {"w": jnp.ones(3)}
    for _ in range(10):
        ema = optim.ema_update(ema, p1, decay=0.5)
    assert float(ema.params["w"][0]) > 0.9


def test_hinge_and_vanilla_d_loss():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(losses.hinge_d_loss(real, fake)) == 0.0
    assert float(losses.hinge_d_loss(-real, -fake)) > 2.0
    assert float(losses.vanilla_d_loss(real, fake)) < 0.3


def test_adopt_weight_gate():
    assert float(losses.adopt_weight(1.0, jnp.int32(5), 10)) == 0.0
    assert float(losses.adopt_weight(1.0, jnp.int32(15), 10)) == 1.0


@pytest.mark.slow
def test_sharded_step_skips_nonfinite_update():
    """Injecting a NaN into the batch must leave params unchanged
    (update_applied=0) — the bf16 analogue of DeepSpeed's NaN retry."""
    import jax.numpy as jnp
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.models import geometry
    from bevgen_tpu.models.stage2.maskgit import MaskGit
    from bevgen_tpu.training import optim as topt
    from bevgen_tpu.training import trainer

    cfg = tiny_test_config()
    tf = cfg.transformer
    model = MaskGit(tf, cfg.muse)
    rng = np.random.default_rng(0)
    b = 2
    tokens = jnp.asarray(rng.integers(0, tf.vocab_size,
                                      (b, tf.num_cams, tf.num_cam_tokens)),
                         jnp.int32)
    cond = jnp.asarray(rng.integers(0, tf.cond_vocab_size,
                                    (b, tf.num_cond_tokens)), jnp.int32)
    intr, extr = geometry.canonical_camera_rig(tf)
    ii = jnp.asarray(np.broadcast_to(np.linalg.inv(intr)[None],
                                     (b, tf.num_cams, 3, 3)), jnp.float32)
    ei = jnp.asarray(np.broadcast_to(np.linalg.inv(extr)[None],
                                     (b, tf.num_cams, 4, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, cond, ii, ei,
                        method=MaskGit.init_all)
    tx = topt.maskgit_optimizer(1e-3, warmup_steps=1, total_steps=10,
                                params_example=params["params"])
    state = trainer.create_train_state(params, tx)
    step = jax.jit(trainer.make_train_step(model, tx))

    bad = {"tokens": tokens, "cond_ids": cond,
           "intrinsics_inv": ii * jnp.nan, "extrinsics_inv": ei}
    before = np.asarray(
        state.params["params"]["transformer"]["token_emb"]["embedding"])
    state2, metrics = step(state, bad, jax.random.PRNGKey(1))
    assert float(metrics["update_applied"]) == 0.0
    after = np.asarray(
        state2.params["params"]["transformer"]["token_emb"]["embedding"])
    np.testing.assert_array_equal(before, after)

    good = {"tokens": tokens, "cond_ids": cond,
            "intrinsics_inv": ii, "extrinsics_inv": ei}
    # two good steps (warmup lr at optimizer-count 0 is 0)
    state3, metrics = step(state2, good, jax.random.PRNGKey(2))
    assert float(metrics["update_applied"]) == 1.0
    state4, metrics = step(state3, good, jax.random.PRNGKey(4))
    assert float(metrics["update_applied"]) == 1.0
    changed = np.asarray(
        state4.params["params"]["transformer"]["token_emb"]["embedding"])
    assert np.abs(changed - after).max() > 0


def test_gradient_accumulation_matches_large_batch():
    """optax.MultiSteps accumulation: k micro-steps of batch b ==
    (up to adam epsilon effects) averaging grads before one update;
    check the accumulated path updates only every k steps and matches
    a manual mean-gradient update (reference accumulate_grad_batches)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from bevgen_tpu.training import optim

    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = optim.maskgit_optimizer(1e-2, warmup_steps=1, total_steps=100,
                                 accumulate_steps=2,
                                 params_example=params)
    state = tx.init(params)

    g1 = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    g2 = jax.tree_util.tree_map(lambda p: 3 * jnp.ones_like(p), params)

    # cycle 1 (update step 0 has LR 0 under warmup — ignore its value)
    up1, state = tx.update(g1, state, params)
    assert all(float(jnp.abs(u).max()) == 0.0
               for u in jax.tree_util.tree_leaves(up1)), \
        "first micro-step must not update"
    _, state = tx.update(g1, state, params)
    # cycle 2: micro-steps g1 then g2 -> update from their mean at LR>0
    upa, state = tx.update(g1, state, params)
    assert all(float(jnp.abs(u).max()) == 0.0
               for u in jax.tree_util.tree_leaves(upa))
    up2, state = tx.update(g2, state, params)
    assert any(float(jnp.abs(u).max()) > 0.0
               for u in jax.tree_util.tree_leaves(up2))

    # reference: unaccumulated optimizer fed the mean gradients directly
    tx_ref = optim.maskgit_optimizer(1e-2, warmup_steps=1, total_steps=100,
                                     params_example=params)
    sref = tx_ref.init(params)
    _, sref = tx_ref.update(g1, sref, params)
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    upref, _ = tx_ref.update(gmean, sref, params)
    for a, b in zip(jax.tree_util.tree_leaves(up2),
                    jax.tree_util.tree_leaves(upref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_scaled_lr_rule():
    from bevgen_tpu.training.optim import scaled_lr
    assert scaled_lr(1e-4, batch_size=8, num_devices=4,
                     accumulate_steps=2) == 1e-4 * 8 * 4 * 2


@pytest.mark.slow
def test_sharded_train_step_with_remat():
    """remat (jax.checkpoint) composes with the shard_map attention
    cores under a dp x tp mesh."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.models import geometry
    from bevgen_tpu.models.stage2.maskgit import MaskGit
    from bevgen_tpu.parallel import sharding as shd
    from bevgen_tpu.training import optim as opt_mod, trainer

    pipe_cfg = tiny_test_config()
    cfg = pipe_cfg.transformer.replace(remat=True)
    model = MaskGit(cfg, pipe_cfg.muse)
    mesh = shd.make_mesh(dp=4, tp=2)

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
    tx = opt_mod.maskgit_optimizer(1e-4, warmup_steps=2, total_steps=10,
                                   params_example=params["params"])
    state = trainer.create_train_state(params, tx)
    step_fn, state = trainer.make_sharded_train_step(model, tx, mesh, state)
    with mesh:
        sharded = shd.shard_batch(batch, mesh)
        state, metrics = step_fn(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_zero_pspec_falls_back_to_largest_divisible_axis():
    """(vocab+1, d) moments whose largest axis isn't dp-divisible must
    still shard over the next divisible axis instead of silently
    replicating (the big embeddings are exactly where ZeRO pays)."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from bevgen_tpu.parallel.sharding import zero_pspec

    leaf = np.zeros((16385, 1024), np.float32)
    assert zero_pspec(leaf, dp=8) == P(None, "dp")
    # largest axis divisible -> sharded there
    assert zero_pspec(np.zeros((16384, 1024), np.float32), dp=8) == \
        P("dp", None)
    # nothing divisible -> replicated
    assert zero_pspec(np.zeros((3, 5), np.float32), dp=8) == P()
    # scalars replicate
    assert zero_pspec(np.zeros((), np.float32), dp=8) == P()
