"""End-to-end golden test: our MultiViewTransformer vs a direct torch
transcription of the reference TransformerMultiView forward
(muse_maskgit_pytorch.py:283-384) using the SAME parameters — the
strongest checkpoint-fidelity evidence available without the published
checkpoints."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry, masks
from bevgen_tpu.models.stage2.transformer import MultiViewTransformer

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow  # executes the torch reference (minutes of CPU)

import torch.nn.functional as F  # noqa: E402


def cfg_small():
    return MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        dim_head=32, vocab_size=24, cond_vocab_size=20, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
        window_len=4, camera_bias=True, image_embed=True, bev_embed=True)


def t(a):
    return torch.tensor(np.asarray(a, np.float32))


def torch_layernorm_g(x, gamma):
    return F.layer_norm(x, x.shape[-1:], gamma,
                        torch.zeros_like(gamma), eps=1e-5)


def torch_attention(p, x, context=None, context_mask=None, attn_bias=None,
                    heads=2, dh=32, scale=8.0):
    """muse_maskgit_pytorch.py:117-169 transcription."""
    b, n, _ = x.shape
    xn = torch_layernorm_g(x, t(p["norm"]["norm"]["scale"]))
    kv_in = xn if context is None else context
    q = xn @ t(p["to_q"]["kernel"])
    kv = kv_in @ t(p["to_kv"]["kernel"])
    k, v = kv.chunk(2, dim=-1)
    q = q.reshape(b, n, heads, dh).permute(0, 2, 1, 3)
    m = kv_in.shape[1]
    k = k.reshape(b, m, heads, dh).permute(0, 2, 1, 3)
    v = v.reshape(b, m, heads, dh).permute(0, 2, 1, 3)
    nkv = t(p["null_kv"])
    k = torch.cat([nkv[0][None].expand(b, heads, 1, dh), k], dim=2)
    v = torch.cat([nkv[1][None].expand(b, heads, 1, dh), v], dim=2)
    q = F.normalize(q, dim=-1) * t(p["q_scale"])
    k = F.normalize(k, dim=-1) * t(p["k_scale"])
    sim = torch.einsum("bhid,bhjd->bhij", q, k) * scale
    if attn_bias is not None:
        sim = sim + F.pad(attn_bias, (1, 0))[None, None]
    if context_mask is not None:
        cm = F.pad(context_mask, (1, 0), value=True)
        sim = sim.masked_fill(~cm[:, None, None, :],
                              -torch.finfo(sim.dtype).max)
    attn = sim.softmax(-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    out = out.permute(0, 2, 1, 3).reshape(b, n, heads * dh)
    return out @ t(p["to_out"]["kernel"])


def torch_ff(p, x):
    h = torch_layernorm_g(x, t(p["norm_in"]["norm"]["scale"]))
    h = h @ t(p["proj_in"]["kernel"])
    a, gate = h.chunk(2, dim=-1)
    h = gate * F.gelu(a)
    h = torch_layernorm_g(h, t(p["norm_mid"]["norm"]["scale"]))
    return h @ t(p["proj_out"]["kernel"])


def test_full_muse_forward_matches_torch_transcription():
    cfg = cfg_small()
    model = MultiViewTransformer(cfg)
    rng = np.random.default_rng(11)
    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    nc = cfg.num_cond_tokens
    d = cfg.num_embed
    ids = rng.integers(0, cfg.vocab_size, (b, cam, hw)).astype(np.int32)
    cond = rng.integers(0, cfg.cond_vocab_size, (b, nc)).astype(np.int32)
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(ids),
                        jnp.asarray(cond), jnp.asarray(ii), jnp.asarray(ei))
    ours = np.asarray(model.apply(params, jnp.asarray(ids),
                                  jnp.asarray(cond), jnp.asarray(ii),
                                  jnp.asarray(ei)).logits)

    # ---- torch transcription --------------------------------------------
    p = jax.tree_util.tree_map(np.asarray, params["params"])

    x = t(p["token_emb"]["embedding"])[torch.tensor(ids.astype(np.int64))]

    # camera-ray embedding (:310-328)
    plane = torch.tensor(geometry.image_plane(cfg).reshape(3, -1))
    I_inv = t(ii)
    E_inv = t(ei)
    pts = torch.einsum("bcij,jn->bcin", I_inv, plane.float())
    pts = F.pad(pts, (0, 0, 0, 1), value=1.0)
    dvec = torch.einsum("bcij,bcjn->bcin", E_inv, pts)
    c = E_inv[..., -1]
    d_emb = dvec.permute(0, 1, 3, 2) @ t(p["img_embed"]["kernel"])
    c_emb = c @ t(p["cam_embed"]["kernel"])
    ray = d_emb - c_emb[:, :, None, :]
    ray = ray / (ray.norm(dim=-1, keepdim=True) + 1e-7)
    x = x + ray
    x = x.reshape(b, cam * hw, d)
    x = x + t(p["pos_emb"]["embedding"])[: cam * hw][None]

    # cond tokens + bev grid embed (:333-341)
    ctx = t(p["cond_token_emb"]["embedding"])[torch.tensor(
        cond.astype(np.int64))]
    grid = torch.tensor(geometry.get_bev_grid(cfg)[:2].reshape(2, -1).T)
    grid_embed = grid.float() @ t(p["bev_embed"]["kernel"]) + \
        t(p["bev_embed"]["bias"])
    c_exp = c_emb[:, :, None, :].expand(b, cam, nc, d)
    bev_cam = (t(p["bev_cam_pos_emb"]) + c_exp).sum(dim=1)
    ctx = ctx + (grid_embed[None] - bev_cam)
    ctx = ctx + t(p["cond_pos_emb"]["embedding"])[:nc][None]

    # camera bias (:344-348): full-matrix param masked by tril + prior
    L = cfg.gpt_block_size
    bias_full = t(p["camera_bias_emb"]) * torch.tril(torch.ones(L, L))
    bias = bias_full + torch.tensor(masks.camera_bias_matrix(cfg))
    self_bias = bias[nc:, nc:]
    cross_bias = bias[nc:, :nc]

    cm = torch.ones(b, nc, dtype=torch.bool)
    for layer in range(cfg.num_layers):
        x = x + torch_attention(p[f"layers_{layer}_attn"], x,
                                attn_bias=self_bias)
        x = x + torch_attention(p[f"layers_{layer}_cross_attn"], x,
                                context=ctx, context_mask=cm,
                                attn_bias=cross_bias)
        x = x + torch_ff(p[f"layers_{layer}_ff"], x)
    x = torch_layernorm_g(x, t(p["final_norm"]["norm"]["scale"]))
    ref = (x @ t(p["to_logits"]["kernel"])).reshape(
        b, cam, hw, cfg.vocab_size)

    np.testing.assert_allclose(ours, ref.detach().numpy(), atol=5e-4,
                               err_msg="full MUSE forward diverges from "
                                       "the reference transcription")
