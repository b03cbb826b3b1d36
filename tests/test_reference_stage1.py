"""Execute the REAL reference stage-1 models (/root/reference
modules/stage1/{model,quantize,vqgan}.py) and require our flax VQ
models to match their outputs through the checkpoint converter.

This closes the last reference-execution fidelity leg: the MUSE/GPT
transformers and the mask/permuter machinery are already golden-tested
against executed reference code (test_reference_execution.py); stage-1
was previously covered only by converter round-trips against our own
trees. Here a randomly-initialized reference VQModel's state_dict is
converted with core/checkpoint.convert_stage1 and encode/decode/
decode_code outputs are compared directly.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow  # executes the torch reference (minutes of CPU)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bevgen_tpu.core import checkpoint as ckpt  # noqa: E402
from bevgen_tpu.core.config import Stage1Config  # noqa: E402
from bevgen_tpu.models.stage1.vq import (  # noqa: E402
    VQModel, VQSegmentationModel)

import ref_harness  # noqa: E402

# tiny but structurally complete: 2 resolutions (one downsample with the
# asymmetric pad), attention at the 16x16 latent, GroupNorm32 (ch must
# be a multiple of 32)
DD = dict(double_z=False, z_channels=32, resolution=32, in_channels=3,
          out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
          attn_resolutions=[16], dropout=0.0)


def our_cfg(**over):
    base = dict(in_channels=DD["in_channels"], out_ch=DD["out_ch"],
                ch=DD["ch"], ch_mult=tuple(DD["ch_mult"]),
                num_res_blocks=DD["num_res_blocks"],
                attn_resolutions=tuple(DD["attn_resolutions"]),
                resolution=DD["resolution"], z_channels=DD["z_channels"],
                n_embed=16, embed_dim=4,
                cam_res=(32, 32), cam_latent_res=(16, 16))
    base.update(over)
    return Stage1Config(**base)


def _to_flax(state_dict):
    params = ckpt.convert_stage1(
        {k: v.numpy() for k, v in state_dict.items()})
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


@pytest.fixture(scope="module")
def ref_vqgan():
    return ref_harness.import_ref_stage1()


def test_ref_vqmodel_encode_decode_match(ref_vqgan):
    torch.manual_seed(0)
    ref = ref_vqgan.VQModel(ddconfig=dict(DD), lossconfig=None, n_embed=16,
                            embed_dim=4, cam_res=(32, 32),
                            cam_latent_res=(16, 16), cam_emd_dim=32)
    ref.eval()
    cfg = our_cfg()
    model = VQModel(cfg)
    params = _to_flax(ref.state_dict())

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        q_t, _, info = ref.encode(_nchw(x), {})
        dec_t = ref.decode(q_t)
    # reference indices come back flat ((b*h*w,) unless sane_index_shape)
    idx_t = info[2].reshape(2, 16, 16).numpy()

    enc = model.apply(params, jnp.asarray(x), method=VQModel.encode)
    dec = model.apply(params, enc.z_q, method=VQModel.decode)

    np.testing.assert_array_equal(np.asarray(enc.indices), idx_t)
    np.testing.assert_allclose(
        np.asarray(enc.z_q), np.transpose(q_t.numpy(), (0, 2, 3, 1)),
        atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dec), np.transpose(dec_t.numpy(), (0, 2, 3, 1)),
        atol=1e-4, rtol=1e-3)


def test_ref_vqmodel_decode_code_matches(ref_vqgan):
    """indices -> image must agree. The reference's `decode_code`
    itself is dead (calls a nonexistent quantize.embed_code); the live
    path is get_codebook_entry + decode, used by decode_to_img
    (cond_transformer_multi_view_muse.py:157-164, quantize.py:314)."""
    torch.manual_seed(1)
    ref = ref_vqgan.VQModel(ddconfig=dict(DD), lossconfig=None, n_embed=16,
                            embed_dim=4, cam_res=(32, 32),
                            cam_latent_res=(16, 16), cam_emd_dim=32)
    ref.eval()
    model = VQModel(our_cfg())
    params = _to_flax(ref.state_dict())

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 16, (2, 16, 16))

    with torch.no_grad():
        z_q_t = ref.quantize.get_codebook_entry(
            torch.from_numpy(ids.reshape(-1)), (2, 16, 16, 4))
        img_t = ref.decode(z_q_t)
    img = model.apply(params, jnp.asarray(ids, jnp.int32),
                      method=VQModel.decode_code)
    np.testing.assert_allclose(
        np.asarray(img), np.transpose(img_t.numpy(), (0, 2, 3, 1)),
        atol=1e-4, rtol=1e-3)


def test_ref_vqmodel_geometric_embedding_matches(ref_vqgan):
    """The camera-ray geometric embedding added to encoder features
    (vqgan.py:62-69,:87-112), incl. the (h,w)-swap image-plane scaling
    quirk, against the executed reference."""
    torch.manual_seed(2)
    ref = ref_vqgan.VQModel(ddconfig=dict(DD), lossconfig=None, n_embed=16,
                            embed_dim=4, cam_res=(32, 32),
                            cam_latent_res=(16, 16), cam_emd_dim=32,
                            geometric_embedding=True)
    ref.eval()
    cfg = our_cfg(geometric_embedding=True, cam_emd_dim=32)
    model = VQModel(cfg)
    params = _to_flax(ref.state_dict())

    rng = np.random.default_rng(3)
    b, cam = 2, 1
    x = rng.standard_normal((b * cam, 32, 32, 3)).astype(np.float32)
    K = np.stack([np.diag([100.0, 110.0, 1.0]) +
                  rng.uniform(-1, 1, (3, 3)) * [[0, 0, 16], [0, 0, 16],
                                                [0, 0, 0]]
                  for _ in range(b * cam)]).astype(np.float32)
    E = np.stack([np.eye(4) for _ in range(b * cam)]).astype(np.float32)
    E[:, :3, 3] = rng.standard_normal((b * cam, 3))
    K_inv = np.linalg.inv(K)
    E_inv = np.linalg.inv(E)

    batch = {"intrinsics_inv": torch.from_numpy(
                 K_inv.reshape(b, cam, 3, 3)),
             "extrinsics_inv": torch.from_numpy(
                 E_inv.reshape(b, cam, 4, 4))}
    with torch.no_grad():
        q_t, _, info = ref.encode(_nchw(x), batch)
    idx_t = info[2].reshape(b * cam, 16, 16).numpy()

    enc = model.apply(params, jnp.asarray(x), jnp.asarray(K_inv),
                      jnp.asarray(E_inv), method=VQModel.encode)
    np.testing.assert_array_equal(np.asarray(enc.indices), idx_t)
    np.testing.assert_allclose(
        np.asarray(enc.z_q), np.transpose(q_t.numpy(), (0, 2, 3, 1)),
        atol=2e-5, rtol=1e-4)


def test_ref_vqseg_model_matches(ref_vqgan):
    """BEV VQ-VAE (VQSegmentationModel, vqgan.py:216): 7-channel raster
    in/out, same autoencoder math."""
    torch.manual_seed(3)
    dd = dict(DD, in_channels=7, out_ch=7)
    ref = ref_vqgan.VQSegmentationModel(
        ddconfig=dd, lossconfig=None, n_embed=16, embed_dim=4,
        cam_res=(32, 32), cam_latent_res=(16, 16), cam_emd_dim=32,
        n_labels=7)
    ref.eval()
    cfg = our_cfg(in_channels=7, out_ch=7, n_labels=7)
    model = VQSegmentationModel(cfg)
    params = _to_flax(ref.state_dict())

    rng = np.random.default_rng(4)
    x = (rng.uniform(size=(2, 32, 32, 7)) > 0.5).astype(np.float32)

    with torch.no_grad():
        q_t, _, info = ref.encode(_nchw(x), {})
        dec_t = ref.decode(q_t)
    idx_t = info[2].reshape(2, 16, 16).numpy()

    enc = model.apply(params, jnp.asarray(x),
                      method=VQSegmentationModel.encode)
    dec = model.apply(params, enc.z_q, method=VQSegmentationModel.decode)
    np.testing.assert_array_equal(np.asarray(enc.indices), idx_t)
    np.testing.assert_allclose(
        np.asarray(dec), np.transpose(dec_t.numpy(), (0, 2, 3, 1)),
        atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# discriminator (reference-executed): modules/discriminator/model.py:17
# + taming_utils.py ActNorm, through convert_discriminator
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_actnorm", [False, True])
def test_ref_discriminator_matches(ref_vqgan, use_actnorm):
    from bevgen_tpu.models.discriminator import NLayerDiscriminator
    import ref_harness as rh

    disc_mod = rh.import_ref(
        "multi_view_generation.modules.discriminator.model")
    torch.manual_seed(4)
    ref = disc_mod.NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3,
                                       use_actnorm=use_actnorm)
    ref.apply(disc_mod.weights_init)
    if use_actnorm:
        # eval mode skips ActNorm's first-batch data-dependent init;
        # give the norms non-trivial affine params instead
        with torch.no_grad():
            for m in ref.modules():
                if hasattr(m, "loc"):
                    m.loc.normal_(0.0, 0.5)
                    m.scale.normal_(1.0, 0.2)
        ref.eval()
    else:
        ref.train()  # the GAN loss runs the disc in train mode
                     # (= batch statistics, what our BatchNorm computes)

    model = NLayerDiscriminator(ndf=8, n_layers=3, use_actnorm=use_actnorm)
    params = {"params": jax.tree_util.tree_map(
        jnp.asarray,
        ckpt.convert_discriminator(
            {k: v.numpy() for k, v in ref.state_dict().items()}))}

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        logits_t = ref(_nchw(x)).numpy()
    logits = model.apply(params, jnp.asarray(x))
    # converted params must be complete (no silently-initialized leaves)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    missing, unexpected = ckpt.verify_tree_match(params["params"],
                                                 init["params"])
    assert not missing and not unexpected, (missing, unexpected)
    np.testing.assert_allclose(
        np.asarray(logits), np.transpose(logits_t, (0, 2, 3, 1)),
        atol=2e-5, rtol=1e-4)


def test_ref_bce_seg_loss_matches():
    """Stage-1 BEV training objective (losses/segmentation.py:11
    BCELossWithQuant) against the executed reference."""
    import ref_harness as rh
    from bevgen_tpu.training.losses import bce_seg_loss

    seg_mod = rh.import_ref(
        "multi_view_generation.modules.losses.segmentation")
    ref_loss = seg_mod.BCELossWithQuant(codebook_weight=1.0)

    rng = np.random.default_rng(6)
    logits = rng.standard_normal((2, 16, 16, 7)).astype(np.float32)
    target = (rng.uniform(size=(2, 16, 16, 7)) > 0.5).astype(np.float32)
    qloss = np.float32(0.37)

    with torch.no_grad():
        loss_t, log_t = ref_loss(torch.tensor(qloss),
                                 torch.from_numpy(target),
                                 torch.from_numpy(logits), "train")
    out = bce_seg_loss(jnp.asarray(qloss), jnp.asarray(target),
                       jnp.asarray(logits))
    np.testing.assert_allclose(float(out.loss), float(loss_t), rtol=1e-6)
    np.testing.assert_allclose(float(out.log["train/bce_loss"]),
                               float(log_t["train/bce_loss"]), rtol=1e-6)


# ---------------------------------------------------------------------------
# full AR Net2Net checkpoint end-to-end: reference-shaped .ckpt
# (first_stage_model. + cond_stage_model. + transformer., per
# cond_transformer_multi_view.py:30) -> load_weights -> ARPipeline
# generates. This is the path the round-2 review found silently broken
# (everything routed to the MUSE converter).
# ---------------------------------------------------------------------------

def test_ref_ar_checkpoint_end_to_end(ref_vqgan, tmp_path, monkeypatch):
    from bevgen_tpu.core.config import (MultiViewConfig, MuseConfig,
                                        PipelineConfig)
    from bevgen_tpu.pipelines.ar_generate import ARPipeline
    from bevgen_tpu.training.checkpoints import load_weights
    import ref_harness as rh
    import test_reference_execution as tre

    # 8x-downsample stage 1 (channels 32/32/64/64 satisfy the
    # reference's GroupNorm32): 32px -> 4x4 latents, n_embed 32 = the
    # transformer vocab
    dd = dict(double_z=False, z_channels=32, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 1, 2, 2], num_res_blocks=1,
              attn_resolutions=[4], dropout=0.0)
    tf = MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        vocab_size=32, cond_vocab_size=32, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
        window_len=4, sparse_block_size=8, density=0.7,
        causal_order=True, camera_bias=True, image_embed=True,
        bev_embed=True, legacy_prob_matrix=True)
    s1 = Stage1Config(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                      z_channels=32, n_embed=32, embed_dim=16,
                      resolution=32, attn_resolutions=(4,),
                      cam_res=(32, 32), cam_latent_res=(4, 4))
    bev = Stage1Config(in_channels=7, out_ch=7, n_labels=7, ch=32,
                       ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                       z_channels=32, n_embed=32, embed_dim=16,
                       resolution=32, attn_resolutions=(4,),
                       cam_res=(32, 32), cam_latent_res=(4, 4))
    cfg = PipelineConfig(transformer=tf, first_stage=s1, cond_stage=bev,
                         muse=MuseConfig())

    # --- assemble the reference-layout checkpoint ---
    torch.manual_seed(7)
    first = ref_vqgan.VQModel(ddconfig=dict(dd), lossconfig=None,
                              n_embed=32, embed_dim=16, cam_res=(32, 32),
                              cam_latent_res=(4, 4), cam_emd_dim=32)
    cond = ref_vqgan.VQSegmentationModel(
        ddconfig=dict(dd, in_channels=7, out_ch=7), lossconfig=None,
        n_embed=32, embed_dim=16, cam_res=(32, 32), cam_latent_res=(4, 4),
        cam_emd_dim=32, n_labels=7)
    mingpt = rh.import_ref(
        "multi_view_generation.modules.transformer.mingpt_sparse")
    monkeypatch.setattr(mingpt, "SparseSelfAttention",
                        tre._DenseEmulatedSparseSelfAttention)
    np.random.seed(7)
    gpt = mingpt.GPT(rh.ref_gpt_config(tf, backend="deepspeed"))

    state = {}
    for prefix, mod in (("first_stage_model.", first),
                        ("cond_stage_model.", cond),
                        ("transformer.", gpt)):
        for k, v in mod.state_dict().items():
            state[prefix + k] = v
    path = tmp_path / "ar_net2net.ckpt"
    torch.save({"state_dict": state}, str(path))

    # --- load + generate ---
    pipe = ARPipeline.create(cfg, use_pallas=False)
    init = pipe.init_params(jax.random.PRNGKey(0))
    params = load_weights(str(path), init)
    for part in ("first_stage", "cond_stage", "gpt"):
        missing, unexpected = ckpt.verify_tree_match(
            params[part]["params"], init[part]["params"])
        assert not missing, (part, missing[:5])
        assert not unexpected, (part, unexpected[:5])

    params = jax.tree_util.tree_map(jnp.asarray, params)
    seg = jnp.asarray(
        (np.random.default_rng(8).uniform(size=(1, 32, 32, 7)) > 0.5)
        .astype(np.float32))
    ii = jnp.broadcast_to(jnp.eye(3), (1, 3, 3, 3))
    ei = jnp.broadcast_to(jnp.eye(4), (1, 3, 4, 4))
    imgs, ids = pipe.generate_fn(params, seg, ii, ei,
                                 jax.random.PRNGKey(2))
    assert imgs.shape == (1, 3, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    assert int(np.asarray(ids).max()) < tf.vocab_size


def test_ref_gumbel_quantize_matches(monkeypatch):
    """Execute the reference GumbelQuantize (quantize.py:110-209) with
    the gumbel noise zeroed (torch's gumbel_softmax draws
    -log(exponential_()); exponential_ -> 1 makes the noise exactly 0,
    same as our rng=None path) and match z_q/KL/indices. The reference
    proj conv is set to identity so both sides consume the same
    logits."""
    import ref_harness as rh
    from bevgen_tpu.models.stage1 import quantize as vq

    qmod = rh.import_ref("multi_view_generation.modules.stage1.quantize")
    n_embed, e_dim = 12, 6
    torch.manual_seed(8)
    ref = qmod.GumbelQuantize(num_hiddens=n_embed, embedding_dim=e_dim,
                              n_embed=n_embed, straight_through=True,
                              kl_weight=5e-4, temp_init=1.0)
    ref.eval()
    with torch.no_grad():
        ref.proj.weight.copy_(
            torch.eye(n_embed).reshape(n_embed, n_embed, 1, 1))
        ref.proj.bias.zero_()

    monkeypatch.setattr(
        torch.Tensor, "exponential_",
        lambda self, *a, **k: self.fill_(1.0), raising=True)

    rng = np.random.default_rng(10)
    logits = rng.standard_normal((2, 4, 4, n_embed)).astype(np.float32)
    with torch.no_grad():
        z_q_t, diff_t, (_, _, ind_t) = ref(
            torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))))

    codebook = ref.embed.weight.detach().numpy()
    out = vq.gumbel_quantize(jnp.asarray(logits), jnp.asarray(codebook),
                             rng=None, temperature=1.0, hard=True)
    np.testing.assert_array_equal(np.asarray(out.indices), ind_t.numpy())
    np.testing.assert_allclose(
        np.asarray(out.z_q),
        np.transpose(z_q_t.numpy(), (0, 2, 3, 1)), atol=1e-6)
    np.testing.assert_allclose(float(out.loss), float(diff_t), rtol=1e-5)


def test_ref_vqmodel_geometric_nonsquare_matches(ref_vqgan):
    """Non-square geometric embedding: stage 1 scales pixel x by WIDTH
    and y by HEIGHT (vqgan.py:62-66) — it does NOT have the stage-2
    (h,w)-swap quirk. A square test can't tell the two apart; this one
    can (32x48 image, 16x24 latent)."""
    torch.manual_seed(5)
    dd = dict(DD, resolution=48)
    ref = ref_vqgan.VQModel(ddconfig=dd, lossconfig=None, n_embed=16,
                            embed_dim=4, cam_res=(32, 48),
                            cam_latent_res=(16, 24), cam_emd_dim=32,
                            geometric_embedding=True)
    ref.eval()
    cfg = our_cfg(geometric_embedding=True, cam_emd_dim=32,
                  resolution=48, cam_res=(32, 48), cam_latent_res=(16, 24))
    model = VQModel(cfg)
    params = _to_flax(ref.state_dict())

    rng = np.random.default_rng(6)
    b = 2
    x = rng.standard_normal((b, 32, 48, 3)).astype(np.float32)
    K = np.stack([np.array([[100.0, 0, 24], [0, 110.0, 16], [0, 0, 1]])
                  for _ in range(b)]).astype(np.float32)
    E = np.stack([np.eye(4) for _ in range(b)]).astype(np.float32)
    E[:, :3, 3] = rng.standard_normal((b, 3))
    K_inv, E_inv = np.linalg.inv(K), np.linalg.inv(E)

    batch = {"intrinsics_inv": torch.from_numpy(K_inv.reshape(b, 1, 3, 3)),
             "extrinsics_inv": torch.from_numpy(E_inv.reshape(b, 1, 4, 4))}
    with torch.no_grad():
        q_t, _, info = ref.encode(_nchw(x), batch)
    idx_t = info[2].reshape(b, 16, 24).numpy()

    enc = model.apply(params, jnp.asarray(x), jnp.asarray(K_inv),
                      jnp.asarray(E_inv), method=VQModel.encode)
    np.testing.assert_array_equal(np.asarray(enc.indices), idx_t)
    np.testing.assert_allclose(
        np.asarray(enc.z_q), np.transpose(q_t.numpy(), (0, 2, 3, 1)),
        atol=2e-5, rtol=1e-4)
