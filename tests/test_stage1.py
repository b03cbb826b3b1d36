"""Stage-1 VQ autoencoder tests, incl. torch golden checks for the
numerics-critical primitives (GroupNorm, asymmetric-pad downsample,
quantizer distances)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import Stage1Config
from bevgen_tpu.models.stage1 import quantize as vq
from bevgen_tpu.models.stage1.backbone import (AttnBlock, Downsample, Encoder,
                                               Decoder, GroupNorm32,
                                               ResnetBlock, Upsample)
from bevgen_tpu.models.stage1.vq import VQModel, VQSegmentationModel


def small_cfg(**kw):
    base = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
                resolution=16, z_channels=32, n_embed=16, embed_dim=8)
    base.update(kw)
    return Stage1Config(**base)


def test_quantizer_nearest_and_ste():
    rng = np.random.default_rng(0)
    cb = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((2, 3, 3, 4)).astype(np.float32))
    res = vq.quantize(z, cb)
    # nearest by brute force
    d = ((np.asarray(z)[..., None, :] - np.asarray(cb)) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(res.indices), d.argmin(-1))
    # STE: gradient of sum(z_q) w.r.t z is 1
    g = jax.grad(lambda zz: vq.quantize(zz, cb).z_q.sum())(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_quantizer_legacy_beta_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    cb_np = rng.standard_normal((8, 4)).astype(np.float32)
    z_np = rng.standard_normal((10, 4)).astype(np.float32)
    res = vq.quantize(jnp.asarray(z_np)[None], jnp.asarray(cb_np), beta=0.25,
                      legacy=True)
    zt = torch.tensor(z_np)
    cbt = torch.tensor(cb_np)
    d = (zt ** 2).sum(1, keepdim=True) + (cbt ** 2).sum(1) - 2 * zt @ cbt.T
    idx = d.argmin(1)
    zq = cbt[idx]
    loss = ((zq.detach() - zt) ** 2).mean() + 0.25 * ((zq - zt.detach()) ** 2).mean()
    np.testing.assert_allclose(float(res.loss), float(loss), rtol=1e-5)


def test_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 4, 64)).astype(np.float32)
    gn = GroupNorm32()
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = gn.apply(params, jnp.asarray(x))
    tg = torch.nn.GroupNorm(32, 64, eps=1e-6)
    with torch.no_grad():
        ref = tg(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_downsample_matches_torch_asymmetric_pad():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    ds = Downsample()
    params = ds.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = ds.apply(params, jnp.asarray(x))
    assert out.shape == (1, 4, 4, 3)
    k = np.asarray(params["params"]["conv"]["kernel"])  # (3,3,in,out)
    b = np.asarray(params["params"]["conv"]["bias"])
    conv = torch.nn.Conv2d(3, 3, 3, stride=2, padding=0)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(k).permute(3, 2, 0, 1))
        conv.bias.copy_(torch.tensor(b))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
        ref = conv(xt).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_upsample_shape():
    x = jnp.ones((1, 4, 4, 3))
    up = Upsample()
    params = up.init(jax.random.PRNGKey(0), x)
    assert up.apply(params, x).shape == (1, 8, 8, 3)


def test_encoder_decoder_shapes():
    cfg = small_cfg()
    enc = Encoder(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    p = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(p, x)
    assert z.shape == (2, 8, 8, cfg.z_channels)
    dec = Decoder(cfg)
    pd = dec.init(jax.random.PRNGKey(1), z)
    y = dec.apply(pd, z)
    assert y.shape == (2, 16, 16, 3)


def test_vqmodel_roundtrip_and_decode_code():
    cfg = small_cfg()
    model = VQModel(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, loss, idx = model.apply(params, x)
    assert rec.shape == x.shape
    assert idx.shape == (2, 8, 8)
    assert np.isfinite(float(loss))
    # decode_code(encode indices) == decode(encode z_q)
    enc = model.apply(params, x, method=VQModel.encode)
    dec1 = model.apply(params, enc.indices, method=VQModel.decode_code)
    dec2 = model.apply(params, enc.z_q, method=VQModel.decode)
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2), atol=1e-5)


def test_vqseg_channels():
    cfg = small_cfg(in_channels=7, out_ch=7, n_labels=7)
    model = VQSegmentationModel(cfg)
    x = jnp.zeros((1, 16, 16, 7))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, loss, idx = model.apply(params, x)
    assert rec.shape == (1, 16, 16, 7)


def test_geometric_embedding_path():
    cfg = small_cfg(geometric_embedding=True, cam_emd_dim=32,
                    cam_res=(16, 16), cam_latent_res=(8, 8))
    model = VQModel(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    ii = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    ei = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, intrinsics_inv=ii,
                        extrinsics_inv=ei)
    rec, _, _ = model.apply(params, x, intrinsics_inv=ii, extrinsics_inv=ei)
    assert rec.shape == x.shape


def test_gumbel_quantize():
    import jax
    rng = np.random.default_rng(0)
    cb = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((2, 3, 3, 16)).astype(np.float32))
    res = vq.gumbel_quantize(logits, cb, jax.random.PRNGKey(0),
                             temperature=0.5)
    assert res.z_q.shape == (2, 3, 3, 4)
    assert res.indices.shape == (2, 3, 3)
    assert np.isfinite(float(res.loss))
    # hard mode: z_q equals the argmax codebook row
    idx = np.asarray(res.indices)
    np.testing.assert_allclose(np.asarray(res.z_q),
                               np.asarray(cb)[idx], atol=1e-5)


def test_ema_quantize_updates_codebook():
    rng = np.random.default_rng(0)
    cb = rng.standard_normal((8, 4)).astype(np.float32)
    cluster = np.ones(8, np.float32)
    avg = cb.copy()
    z = jnp.asarray(np.tile(cb[3], (10, 1)) +
                    0.01 * rng.standard_normal((10, 4)).astype(np.float32))
    res, (new_cb, new_cluster, new_avg) = vq.ema_quantize(
        z, jnp.asarray(cb), jnp.asarray(cluster), jnp.asarray(avg))
    assert (np.asarray(res.indices) == 3).all()
    # cluster 3 grew, codebook row 3 moved toward the data
    assert float(new_cluster[3]) > float(new_cluster[0])
    assert np.isfinite(np.asarray(new_cb)).all()


def test_codebook_stats():
    idx = jnp.asarray([0, 0, 1, 2, 3, 3, 3, 3])
    stats = vq.codebook_stats(idx, n_embed=8)
    assert 0.49 < float(stats["codebook_usage"]) < 0.51  # 4 of 8 used
    assert 1.0 < float(stats["codebook_perplexity"]) <= 4.0


@pytest.mark.slow
def test_remat_flag_preserves_outputs():
    from bevgen_tpu.core.config import MultiViewConfig
    from bevgen_tpu.models.stage2.transformer import MultiViewTransformer
    from bevgen_tpu.models import geometry
    base = dict(num_layers=1, num_heads=2, num_embed=32, hidden_size=32,
                dim_head=16, vocab_size=16, cond_vocab_size=16, num_cams=3,
                cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
                cam_res=(16, 16), cam_latent_res=(2, 2), bev_latent_res=(2, 2),
                window_len=2, camera_bias=False, bev_embed=False)
    cfg_a = MultiViewConfig(**base)
    cfg_b = MultiViewConfig(**base, remat=True)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 16, (1, 3, 4)), jnp.int32)
    cond = jnp.asarray(rng.integers(0, 16, (1, 4)), jnp.int32)
    intr, extr = geometry.canonical_camera_rig(cfg_a)
    ii = jnp.asarray(np.linalg.inv(intr)[None], jnp.float32)
    ei = jnp.asarray(np.linalg.inv(extr)[None], jnp.float32)
    m_a, m_b = MultiViewTransformer(cfg_a), MultiViewTransformer(cfg_b)
    p = m_a.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    out_a = m_a.apply(p, ids, cond, ii, ei).logits
    out_b = m_b.apply(p, ids, cond, ii, ei).logits
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)
