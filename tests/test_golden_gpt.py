"""End-to-end golden test: SparseGPT vs a direct torch transcription of
the reference GPT forward (mingpt_sparse.py:319-391) with the same
parameters: embedding composition, raw-order positional embeds, decode-
order permute, pad-token embedding, (qk+bias)*scale sparse attention,
logit slice and un-permute."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry, masks
from bevgen_tpu.models.stage2.gpt import SparseGPT

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow  # executes the torch reference (minutes of CPU)

import torch.nn.functional as F  # noqa: E402


def cfg_small():
    # sparse_block_size 8 with 4x5 latents -> pad tokens exercised
    return MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        vocab_size=24, cond_vocab_size=20, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 40), cam_latent_res=(4, 5), bev_latent_res=(4, 4),
        window_len=4, sparse_block_size=8, density=0.7,
        causal_order=True, camera_bias=True, image_embed=True,
        bev_embed=True, legacy_prob_matrix=False)


def t(a):
    return torch.tensor(np.asarray(a, np.float32))


def torch_ln(p, x):
    return F.layer_norm(x, x.shape[-1:], t(p["norm"]["scale"]),
                        t(p["norm"]["bias"]), eps=1e-5)


def test_full_gpt_forward_matches_torch_transcription():
    cfg = cfg_small()
    model = SparseGPT(cfg, use_pallas=False)
    rng = np.random.default_rng(4)
    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    nc, L = cfg.num_cond_tokens, cfg.gpt_block_size
    d = cfg.num_embed
    ids = rng.integers(0, cfg.vocab_size, (b, cam, hw)).astype(np.int32)
    cond = rng.integers(0, cfg.cond_vocab_size, (b, nc)).astype(np.int32)
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(5), jnp.asarray(ids),
                        jnp.asarray(cond), jnp.asarray(ii), jnp.asarray(ei))
    ours = np.asarray(model.apply(params, jnp.asarray(ids),
                                  jnp.asarray(cond), jnp.asarray(ii),
                                  jnp.asarray(ei), sampling=False))

    p = jax.tree_util.tree_map(np.asarray, params["params"])

    # ---- embeddings (mingpt_sparse.py:319-366) ----------------------------
    ids_t = ids.copy()
    ids_t[:, -1, -1] = cfg.vocab_size       # not-sampling marker (:328-329)
    x = t(p["x_tok_emb"]["embedding"])[torch.tensor(ids_t.astype(np.int64))]

    plane = torch.tensor(geometry.image_plane(cfg).reshape(3, -1))
    I_inv, E_inv = t(ii), t(ei)
    pts = torch.einsum("bcij,jn->bcin", I_inv, plane.float())
    pts = F.pad(pts, (0, 0, 0, 1), value=1.0)
    dvec = torch.einsum("bcij,bcjn->bcin", E_inv, pts)
    c = E_inv[..., -1]
    d_emb = dvec.permute(0, 1, 3, 2) @ t(p["img_embed"]["kernel"])
    c_emb = c @ t(p["cam_embed"]["kernel"])
    ray = d_emb - c_emb[:, :, None, :]
    ray = ray / (ray.norm(dim=-1, keepdim=True) + 1e-7)
    x = (x + ray).reshape(b, cam * hw, d)
    x = x + t(p["x_pos_emb"])[:, : cam * hw]

    ctx = t(p["cond_tok_emb"]["embedding"])[torch.tensor(
        cond.astype(np.int64))]
    grid = torch.tensor(geometry.get_bev_grid(cfg)[:2].reshape(2, -1).T)
    grid_embed = grid.float() @ t(p["bev_embed"]["kernel"]) + \
        t(p["bev_embed"]["bias"])
    c_exp = c_emb[:, :, None, :].expand(b, cam, nc, d)
    bev_cam = (t(p["bev_cam_pos_emb"]) + c_exp).sum(dim=1)
    ctx = ctx + (grid_embed[None] - bev_cam)
    ctx = ctx + t(p["cond_pos_emb"])

    fwd, bwd = geometry.decode_order(cfg)
    x = x[:, torch.tensor(fwd)]
    seq = torch.cat([ctx, x], dim=1)
    pad_len = L - seq.shape[1]
    assert pad_len > 0
    pad_emb = t(p["x_tok_emb"]["embedding"])[cfg.vocab_size][None, None]
    seq = torch.cat([seq, pad_emb.expand(b, pad_len, d)], dim=1)

    # ---- camera bias + sparse masks ---------------------------------------
    bias_full = t(p["camera_bias_emb"]) * torch.tril(torch.ones(L, L))
    bias = bias_full + torch.tensor(masks.camera_bias_matrix(cfg))
    sm = masks.sparse_masks(cfg)
    big = torch.tensor(np.kron(
        sm.layouts, np.ones((cfg.sparse_block_size,) * 2))[:, :L, :L])
    keep = (big > 0) & (torch.tensor(sm.allowed)[None] > 0)

    # ---- blocks (mingpt_sparse.py:215-253) --------------------------------
    h, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    for i in range(cfg.num_layers):
        blk = p[f"block_{i}"]
        xn = torch_ln(blk["ln1"], seq)
        q = (xn @ t(blk["query"]["kernel"]) + t(blk["query"]["bias"])
             ).reshape(b, L, h, dh).permute(0, 2, 1, 3)
        k = (xn @ t(blk["key"]["kernel"]) + t(blk["key"]["bias"])
             ).reshape(b, L, h, dh).permute(0, 2, 1, 3)
        v = (xn @ t(blk["value"]["kernel"]) + t(blk["value"]["bias"])
             ).reshape(b, L, h, dh).permute(0, 2, 1, 3)
        s = torch.einsum("bhid,bhjd->bhij", q, k)
        s = (s + bias[None, None]) / np.sqrt(dh)   # bias scaled with qk
        s = s.masked_fill(~keep[None], -1e9)
        attn = s.softmax(-1) @ v
        attn = attn.permute(0, 2, 1, 3).reshape(b, L, cfg.hidden_size)
        seq = xn + attn                              # residual quirk
        hn = torch_ln(blk["ln2"], seq)
        mlp = F.gelu(hn @ t(blk["mlp_fc"]["kernel"]) +
                     t(blk["mlp_fc"]["bias"]))
        mlp = mlp @ t(blk["mlp_proj"]["kernel"]) + t(blk["mlp_proj"]["bias"])
        seq = seq + mlp

    seq = torch_ln(p["ln_f"], seq)
    logits = seq @ t(p["head"]["kernel"])
    logits = logits[:, :L - pad_len]
    ret = logits[:, nc - 1:-1]
    ref = ret[:, torch.tensor(bwd)].detach().numpy()

    np.testing.assert_allclose(ours, ref, atol=5e-4,
                               err_msg="full GPT forward diverges from "
                                       "the reference transcription")
