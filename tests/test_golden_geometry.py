"""Golden numerics checks of the geometric embedding math against
direct torch transcriptions of the reference code (the subtlest
checkpoint-fidelity risks — SURVEY §7 hard-part 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry
from bevgen_tpu.models.stage2.transformer import MultiViewTransformer

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow  # executes the torch reference (minutes of CPU)



def cfg_small(**kw):
    base = dict(num_layers=1, num_heads=2, num_embed=32, hidden_size=32,
                dim_head=16, vocab_size=16, cond_vocab_size=16, num_cams=3,
                cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
                cam_res=(32, 48), cam_latent_res=(2, 3), bev_latent_res=(2, 2),
                window_len=2, camera_bias=False, image_embed=True,
                bev_embed=True)
    base.update(kw)
    return MultiViewConfig(**base)


def torch_ray_embed(cfg, I_inv, E_inv, img_w, cam_w):
    """Direct transcription of muse_maskgit_pytorch.py:310-328 /
    mingpt_sparse.py:288-296,:332-350."""
    import torch.nn.functional as F
    h, w = cfg.cam_latent_h, cfg.cam_latent_w
    b, n = I_inv.shape[:2]
    # generate_grid + image_plane scaling (incl. the h/w swap quirk)
    xs = torch.linspace(0, 1, w)
    ys = torch.linspace(0, 1, h)
    gx, gy = torch.meshgrid(xs, ys, indexing="xy")
    plane = torch.stack([gx, gy, torch.ones_like(gx)], 0)[None, None]
    plane = plane.clone()
    plane[:, :, 0] *= cfg.cam_res[0]
    plane[:, :, 1] *= cfg.cam_res[1]

    pixel_flat = plane.reshape(1, 1, 3, h * w)
    cam = I_inv @ pixel_flat
    cam = F.pad(cam, (0, 0, 0, 1, 0, 0, 0, 0), value=1)
    d = E_inv @ cam
    c = E_inv[..., -1:]
    c_flat = c.reshape(b * n, 4)[..., None, None]
    d_flat = d.reshape(b * n, 4, h, w)
    d_embed = torch.nn.functional.conv2d(d_flat, img_w)
    c_embed = torch.nn.functional.conv2d(c_flat, cam_w)
    img_embed = d_embed - c_embed
    img_embed = img_embed / (img_embed.norm(dim=1, keepdim=True) + 1e-7)
    return img_embed.reshape(b, n, -1, h * w).permute(0, 1, 3, 2), c_embed


def test_camera_ray_embedding_matches_torch_transcription():
    cfg = cfg_small()
    model = MultiViewTransformer(cfg)
    rng = np.random.default_rng(0)
    b = 2
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cfg.num_cams, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cfg.num_cams, 4, 4)).astype(np.float32)
    ids = jnp.zeros((b, cfg.num_cams, cfg.num_cam_tokens), jnp.int32)
    cond = jnp.zeros((b, cfg.num_cond_tokens), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), ids, cond, jnp.asarray(ii),
                        jnp.asarray(ei))

    # isolate the ray embedding: zero out token/pos embeds so the
    # pre-blocks sum equals just the ray embedding per image token
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    img_kernel = torch.tensor(p["img_embed"]["kernel"].T[:, :, None, None])
    cam_kernel = torch.tensor(p["cam_embed"]["kernel"].T[:, :, None, None])
    ray_t, _ = torch_ray_embed(cfg, torch.tensor(ii), torch.tensor(ei),
                               img_kernel, cam_kernel)

    # our model's ray embed: recompute with the same math path
    plane = jnp.asarray(geometry.image_plane(cfg).reshape(3, -1))
    I_inv = jnp.asarray(ii)
    E_inv = jnp.asarray(ei)
    pts = jnp.einsum("bcij,jn->bcin", I_inv, plane)
    pts = jnp.concatenate([pts, jnp.ones_like(pts[:, :, :1])], axis=2)
    d = jnp.einsum("bcij,bcjn->bcin", E_inv, pts)
    c = E_inv[..., -1]
    d_emb = d.transpose(0, 1, 3, 2) @ jnp.asarray(p["img_embed"]["kernel"])
    c_emb = c @ jnp.asarray(p["cam_embed"]["kernel"])
    r = d_emb - c_emb[:, :, None, :]
    ray_j = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-7)

    np.testing.assert_allclose(np.asarray(ray_j),
                               ray_t.detach().numpy(), atol=1e-5)


def test_gpt_block_residual_quirk():
    """The AR Block adds the attention onto the NORMALIZED input
    (mingpt_sparse.py:240-253) — verify our SparseGPTBlock reproduces
    this against a torch transcription."""
    import torch.nn.functional as F
    from bevgen_tpu.models.stage2.gpt import SparseGPTBlock
    cfg = cfg_small(num_heads=2, num_embed=32, hidden_size=32)
    blk = SparseGPTBlock(cfg)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 6, 32)).astype(np.float32)

    def dense_attn(q, k, v, bias):
        s = jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32)
        s = s * (1.0 / np.sqrt(q.shape[-1]))
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", p, v)

    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), None,
                      dense_attn)
    out = np.asarray(blk.apply(params, jnp.asarray(x), None, dense_attn))

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    t = lambda a: torch.tensor(a)
    xt = t(x)
    xn = F.layer_norm(xt, (32,), t(p["ln1"]["norm"]["scale"]),
                      t(p["ln1"]["norm"]["bias"]), eps=1e-5)
    q = (xn @ t(p["query"]["kernel"]) + t(p["query"]["bias"])
         ).reshape(1, 6, 2, 16).permute(0, 2, 1, 3)
    k = (xn @ t(p["key"]["kernel"]) + t(p["key"]["bias"])
         ).reshape(1, 6, 2, 16).permute(0, 2, 1, 3)
    v = (xn @ t(p["value"]["kernel"]) + t(p["value"]["bias"])
         ).reshape(1, 6, 2, 16).permute(0, 2, 1, 3)
    s = (q @ k.transpose(-1, -2)) / np.sqrt(16)
    attn = (s.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(1, 6, 32)
    # THE QUIRK: residual off xn, not xt
    h = xn + attn
    hn = F.layer_norm(h, (32,), t(p["ln2"]["norm"]["scale"]),
                      t(p["ln2"]["norm"]["bias"]), eps=1e-5)
    m = F.gelu(hn @ t(p["mlp_fc"]["kernel"]) + t(p["mlp_fc"]["bias"]))
    m = m @ t(p["mlp_proj"]["kernel"]) + t(p["mlp_proj"]["bias"])
    ref = (h + m).detach().numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5)
