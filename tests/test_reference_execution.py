"""Golden tests that EXECUTE the reference code at /root/reference.

Unlike tests/test_golden_{muse,gpt,geometry}.py (torch transcriptions by
the same author), these import the reference's own permuter.py,
mask_generator.py, mingpt_sparse.py and muse_maskgit_pytorch.py (via
sys.modules stubs for its unavailable deps — tests/ref_harness.py) and
compare our artifacts / forwards against the reference's actual outputs,
with parameters shared through the real converter (core/checkpoint.py).
"""
import numpy as np
import pytest

import ref_harness as rh
from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.core import checkpoint as ckpt
from bevgen_tpu.models import geometry, masks

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow  # executes the torch reference (minutes of CPU)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------------------
# configs under test
# ---------------------------------------------------------------------------

def cfg_argoverse_dense():
    """Shipped-MUSE-shaped: dense (block 1), non-causal, 3 front cams."""
    return MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        dim_head=32, vocab_size=24, cond_vocab_size=20, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
        window_len=4, camera_bias=True, image_embed=True, bev_embed=True,
        legacy_prob_matrix=True)


def cfg_nuscenes_causal():
    """AR-shaped: 6 nuScenes cams, causal outward order, odd latent w."""
    return MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        dim_head=32, vocab_size=24, cond_vocab_size=20, num_cams=6,
        cam_names="NUSCENES_CAMERAS", dataset="nuscenes",
        cam_res=(32, 40), cam_latent_res=(4, 5), bev_latent_res=(4, 4),
        window_len=4, causal_order=True, camera_bias=True,
        image_embed=True, bev_embed=True, legacy_prob_matrix=True)


def cfg_sparse_padded():
    """Sparse path: block 8 with 4x5 latents -> pad tokens exercised."""
    return MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        vocab_size=24, cond_vocab_size=20, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 40), cam_latent_res=(4, 5), bev_latent_res=(4, 4),
        window_len=4, sparse_block_size=8, density=0.7,
        causal_order=True, camera_bias=True, image_embed=True,
        bev_embed=True, legacy_prob_matrix=True)


CONFIGS = {
    "argoverse_dense": cfg_argoverse_dense,
    "nuscenes_causal": cfg_nuscenes_causal,
    "sparse_padded": cfg_sparse_padded,
}


# ---------------------------------------------------------------------------
# config-time artifacts: permuter order, camera-bias matrix, layouts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_ref_permuter_and_bias_matrix_match(name):
    cfg = CONFIGS[name]()
    torch.manual_seed(0)
    np.random.seed(0)
    rcfg = rh.ref_gpt_config(cfg)

    fwd, bwd = geometry.decode_order(cfg)
    np.testing.assert_array_equal(
        fwd, rcfg.forward_shuffle_idx.numpy(),
        err_msg="forward decode order != reference CustomPermuter")
    np.testing.assert_array_equal(
        bwd, rcfg.backward_shuffle_idx.numpy())

    ours = masks.camera_bias_matrix(cfg)
    theirs = rcfg.prob_matrix.numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(
        ours, theirs, atol=1e-5,
        err_msg="camera_bias_matrix != reference outward_pattern("
                "return_camera_bias_matrix=True)")


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_ref_outward_pattern_parts_match(name):
    cfg = CONFIGS[name]()
    mg = rh.import_ref(
        "multi_view_generation.modules.transformer.mask_generator")
    rcfg = rh.ref_gpt_config(cfg)
    allowed, static_layout, prob_layout, prob_matrix = mg.outward_pattern(rcfg)

    sm = masks.sparse_masks(cfg)
    # allowed (mul) mask: reference returns it repeated per head
    np.testing.assert_array_equal(sm.allowed, allowed[0].numpy())
    np.testing.assert_allclose(sm.prob_layout, prob_layout.numpy(),
                               atol=1e-5)
    # our static layout = reference's + guaranteed diagonal (documented
    # NaN-row hardening, masks.py) — assert superset & diff only on diag
    ref_static = static_layout.numpy().astype(bool)
    ours_static = sm.static_layout.astype(bool)
    assert (ref_static & ~ours_static).sum() == 0, \
        "our static layout drops reference blocks"
    extra = ours_static & ~ref_static
    ij = np.argwhere(extra)
    assert np.all(ij[:, 0] == ij[:, 1]), \
        "static layout extras must be diagonal-only"


def test_ref_geometric_bias_matrix_from_measured_rig(tmp_path, monkeypatch):
    """legacy_prob_matrix=False: the bias prior is built from a MEASURED
    rig artifact. Save one rig, hand it to both implementations (ours via
    cfg.rig_path, the reference via pretrained/cam_data_argoverse.pt) and
    compare (mask_generator.py:89-128,:162,:181)."""
    from test_rig import measured_rig  # same directory

    base = cfg_argoverse_dense()
    intr, extr = measured_rig(base)
    (tmp_path / "pretrained").mkdir()
    torch.save(
        {"intrinsics": torch.tensor(intr[None], dtype=torch.float32),
         "extrinsics": torch.tensor(extr[None], dtype=torch.float32)},
        str(tmp_path / "pretrained" / "cam_data_argoverse.pt"))
    monkeypatch.chdir(tmp_path)

    cfg = MultiViewConfig(**{
        **{f: getattr(base, f) for f in base.__dataclass_fields__},
        "legacy_prob_matrix": False,
        "rig_path": str(tmp_path / "pretrained" / "cam_data_argoverse.pt")})
    rcfg = rh.ref_gpt_config(cfg)

    ours = masks.camera_bias_matrix(cfg)
    theirs = rcfg.prob_matrix.numpy()
    np.testing.assert_allclose(
        ours, theirs, atol=1e-4,
        err_msg="geometric camera_bias_matrix from a measured rig "
                "diverges from the executed reference")


# ---------------------------------------------------------------------------
# full MUSE transformer forward, reference-executed, weights shared
# ---------------------------------------------------------------------------

def test_ref_muse_forward_matches():
    from bevgen_tpu.models.stage2.transformer import MultiViewTransformer

    cfg = cfg_argoverse_dense()
    torch.manual_seed(7)
    np.random.seed(7)
    muse = rh.import_ref(
        "multi_view_generation.modules.stage2.muse_maskgit_pytorch")
    rcfg = rh.ref_gpt_config(cfg)
    ref_tf = muse.MaskGitTransformerMultiView(
        num_tokens=cfg.vocab_size, seq_len=tuple(cfg.cam_latent_res),
        dim=cfg.num_embed, depth=cfg.num_layers, dim_head=cfg.dim_head,
        heads=cfg.num_heads, ff_mult=cfg.ff_mult, cfg=rcfg).eval()

    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (b, cam, hw))
    ids[:, 0, :3] = cfg.vocab_size            # exercise the mask id
    cond = rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref_tf(
            torch.tensor(ids.reshape(b * cam, hw)),
            conditioning_token_ids=torch.tensor(cond),
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)},
            cond_drop_prob=0.0)
    ref_logits = ref_logits.numpy().reshape(b, cam, hw, cfg.vocab_size)

    # ---- convert the reference's own state_dict through the converter ----
    state = {k: v.numpy() for k, v in ref_tf.state_dict().items()}
    assert any(k.startswith("self_cond_to_init_embed") for k in state), \
        "reference checkpoints always contain self-cond keys"
    params = {"params": ckpt.convert_muse_transformer(state)}

    model = MultiViewTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                      jnp.asarray(cond, jnp.int32), jnp.asarray(ii),
                      jnp.asarray(ei))
    missing, unexpected = ckpt.verify_tree_match(params["params"],
                                                 init["params"])
    assert not missing, f"converter missed params: {missing}"
    assert not unexpected, f"converter produced bad params: {unexpected}"

    ours = np.asarray(model.apply(params, jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(cond, jnp.int32),
                                  jnp.asarray(ii), jnp.asarray(ei)).logits)
    np.testing.assert_allclose(
        ours, ref_logits, atol=2e-4,
        err_msg="our MUSE forward diverges from the EXECUTED reference "
                "TransformerMultiView with shared weights")


def test_ref_muse_self_conditioning_matches():
    """self_cond=True: the FeedForward of the self-cond embedding is
    applied identically (muse_maskgit_pytorch.py:240-241,356-359). Both
    sides receive the same explicit (b, cam*hw, d) embedding — the
    reference's zeros default makes the branch a no-op (GEGLU of zeros),
    so a nonzero embed is what actually exercises the weights."""
    from bevgen_tpu.models.stage2.transformer import MultiViewTransformer
    from bevgen_tpu.core.config import MultiViewConfig as MVC

    base = cfg_argoverse_dense()
    cfg = MVC(**{**{f: getattr(base, f) for f in base.__dataclass_fields__},
                 "self_cond": True})
    torch.manual_seed(13)
    np.random.seed(13)
    muse = rh.import_ref(
        "multi_view_generation.modules.stage2.muse_maskgit_pytorch")
    rcfg = rh.ref_gpt_config(cfg)
    ref_tf = muse.MaskGitTransformerMultiView(
        num_tokens=cfg.vocab_size, seq_len=tuple(cfg.cam_latent_res),
        dim=cfg.num_embed, depth=cfg.num_layers, dim_head=cfg.dim_head,
        heads=cfg.num_heads, ff_mult=cfg.ff_mult, cfg=rcfg,
        self_cond=True).eval()

    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(9)
    ids = rng.integers(0, cfg.vocab_size, (b, cam, hw))
    cond = rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens))
    sc = rng.standard_normal((b, cam * hw, cfg.num_embed)).astype(np.float32)
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref_tf(
            torch.tensor(ids.reshape(b * cam, hw)),
            conditioning_token_ids=torch.tensor(cond),
            self_cond_embed=torch.tensor(sc),
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)},
            cond_drop_prob=0.0)
    ref_logits = ref_logits.numpy().reshape(b, cam, hw, cfg.vocab_size)

    state = {k: v.numpy() for k, v in ref_tf.state_dict().items()}
    params = {"params": ckpt.convert_muse_transformer(state, self_cond=True)}
    model = MultiViewTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                      jnp.asarray(cond, jnp.int32), jnp.asarray(ii),
                      jnp.asarray(ei))
    missing, unexpected = ckpt.verify_tree_match(params["params"],
                                                 init["params"])
    assert not missing and not unexpected, (missing, unexpected)
    ours = np.asarray(model.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(cond, jnp.int32),
        jnp.asarray(ii), jnp.asarray(ei),
        self_cond_embed=jnp.asarray(sc)).logits)
    np.testing.assert_allclose(ours, ref_logits, atol=2e-4)


def test_ref_token_critic_matches():
    """Separate TokenCritic transformer (muse_maskgit_pytorch.py:423-426):
    converter round-trips a full reference MaskGit state_dict with a
    token critic, and our critic forward matches the executed one."""
    from bevgen_tpu.core.config import MuseConfig
    from bevgen_tpu.models.stage2.maskgit import MaskGit

    cfg = cfg_argoverse_dense()
    torch.manual_seed(17)
    np.random.seed(17)
    muse = rh.import_ref(
        "multi_view_generation.modules.stage2.muse_maskgit_pytorch")
    rcfg = rh.ref_gpt_config(cfg)
    mk = lambda klass, **kw: klass(
        num_tokens=cfg.vocab_size, seq_len=tuple(cfg.cam_latent_res),
        dim=cfg.num_embed, depth=cfg.num_layers, dim_head=cfg.dim_head,
        heads=cfg.num_heads, ff_mult=cfg.ff_mult, cfg=rcfg, **kw)
    ref_mg = muse.MaskGit(
        image_size=tuple(cfg.cam_latent_res),
        transformer=mk(muse.MaskGitTransformerMultiView),
        token_critic=mk(muse.TokenCritic)).eval()

    state = {f"maskgit.{k}": v.numpy()
             for k, v in ref_mg.state_dict().items()}
    converted = ckpt.convert_net2net(state)

    mcfg = MuseConfig(self_token_critic=False, token_critic=True)
    model = MaskGit(cfg, mcfg)
    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (b, cam, hw))
    cond = rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                      jnp.asarray(cond, jnp.int32), jnp.asarray(ii),
                      jnp.asarray(ei), method=MaskGit.init_all)
    params = {"params": converted["maskgit"]["params"]}
    missing, unexpected = ckpt.verify_tree_match(params["params"],
                                                 init["params"])
    assert not missing and not unexpected, (missing, unexpected)

    with torch.no_grad():
        ref_scores = ref_mg.token_critic(
            torch.tensor(ids.reshape(b * cam, hw)),
            conditioning_token_ids=torch.tensor(cond),
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)},
            cond_drop_prob=0.0)
    ref_scores = ref_scores.numpy().reshape(b, cam, hw)

    ours = np.asarray(model.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(cond, jnp.int32),
        jnp.asarray(ii), jnp.asarray(ei), method=MaskGit.critic_logits))
    np.testing.assert_allclose(ours, ref_scores, atol=2e-4)

    # the decode loop calls TokenCritic.forward_with_cond_scale
    # (muse_maskgit_pytorch.py:602-607) — in EVAL mode its null
    # forward's cond-drop is training-gated (:353-355) so the CFG mix
    # cancels to the cond logits; cfg_critic's faithful default (one
    # cond-only forward) must match the executed eval-mode reference
    from bevgen_tpu.models.stage2 import maskgit as mg
    with torch.no_grad():
        ref_cfg = ref_mg.token_critic.forward_with_cond_scale(
            torch.tensor(ids.reshape(b * cam, hw)),
            conditioning_token_ids=torch.tensor(cond),
            cond_scale=3.0,
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)})
    ref_cfg = ref_cfg.numpy()[..., 0].reshape(b, cam, hw)
    ours_cfg = np.asarray(mg.cfg_critic(
        model, params, jnp.asarray(ids, jnp.int32),
        jnp.asarray(cond, jnp.int32), jnp.asarray(ii), jnp.asarray(ei),
        cond_scale=3.0))
    np.testing.assert_allclose(ours_cfg, ref_cfg, atol=2e-4)


def test_ref_self_critic_cfg_scores_match():
    """Decode-loop SelfCritic scores: SelfCritic.forward_with_cond_scale
    (muse_maskgit_pytorch.py:393-395) returns to_pred of the COND pass's
    embeddings — forward_with_cond_scale's return_embed path (:272-279)
    hands back the un-mixed cond embed, so the scores see NO CFG mixing
    and the null forward's result is discarded. cfg_critic must
    reproduce exactly that (it skips the discarded null forward)."""
    from bevgen_tpu.core.config import MuseConfig
    from bevgen_tpu.models.stage2 import maskgit as mg
    from bevgen_tpu.models.stage2.maskgit import MaskGit

    cfg = cfg_argoverse_dense()
    torch.manual_seed(23)
    np.random.seed(23)
    muse = rh.import_ref(
        "multi_view_generation.modules.stage2.muse_maskgit_pytorch")
    rcfg = rh.ref_gpt_config(cfg)
    ref_tf = muse.MaskGitTransformerMultiView(
        num_tokens=cfg.vocab_size, seq_len=tuple(cfg.cam_latent_res),
        dim=cfg.num_embed, depth=cfg.num_layers, dim_head=cfg.dim_head,
        heads=cfg.num_heads, ff_mult=cfg.ff_mult, cfg=rcfg)
    ref_mg = muse.MaskGit(
        image_size=tuple(cfg.cam_latent_res), transformer=ref_tf,
        self_token_critic=True).eval()

    state = {f"maskgit.{k}": v.numpy()
             for k, v in ref_mg.state_dict().items()}
    converted = ckpt.convert_net2net(state)

    model = MaskGit(cfg, MuseConfig(self_token_critic=True))
    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, (b, cam, hw))
    cond = rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                      jnp.asarray(cond, jnp.int32), jnp.asarray(ii),
                      jnp.asarray(ei), method=MaskGit.init_all)
    params = {"params": converted["maskgit"]["params"]}
    missing, unexpected = ckpt.verify_tree_match(params["params"],
                                                 init["params"])
    assert not missing and not unexpected, (missing, unexpected)

    with torch.no_grad():
        ref_scores = ref_mg.token_critic.forward_with_cond_scale(
            torch.tensor(ids.reshape(b * cam, hw)),
            conditioning_token_ids=torch.tensor(cond),
            cond_scale=3.0,
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)})
    ref_scores = ref_scores.numpy()[..., 0].reshape(b, cam, hw)

    ours = np.asarray(mg.cfg_critic(
        model, params, jnp.asarray(ids, jnp.int32),
        jnp.asarray(cond, jnp.int32), jnp.asarray(ii), jnp.asarray(ei),
        cond_scale=3.0))
    np.testing.assert_allclose(ours, ref_scores, atol=2e-4)


def test_ref_null_forward_matches_train_mode_drop():
    """The real_cfg=True null pass (cond_keep all-False) must equal the
    reference's TRAINING-time cond-drop forward — the only mode where
    its drop actually executes (muse_maskgit_pytorch.py:353-355;
    cond_drop_prob=1 makes prob_mask_like deterministic, and the MUSE
    transformer has no dropout so train() stays deterministic)."""
    from bevgen_tpu.models.stage2.transformer import MultiViewTransformer

    cfg = cfg_argoverse_dense()
    torch.manual_seed(11)
    np.random.seed(11)
    muse = rh.import_ref(
        "multi_view_generation.modules.stage2.muse_maskgit_pytorch")
    rcfg = rh.ref_gpt_config(cfg)
    ref_tf = muse.MaskGitTransformerMultiView(
        num_tokens=cfg.vocab_size, seq_len=tuple(cfg.cam_latent_res),
        dim=cfg.num_embed, depth=cfg.num_layers, dim_head=cfg.dim_head,
        heads=cfg.num_heads, ff_mult=cfg.ff_mult, cfg=rcfg).train()

    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, (b, cam, hw))
    cond = rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)

    with torch.no_grad():
        ref_null = ref_tf(
            torch.tensor(ids.reshape(b * cam, hw)),
            conditioning_token_ids=torch.tensor(cond),
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)},
            cond_drop_prob=1.0)
    ref_null = ref_null.numpy().reshape(b, cam, hw, cfg.vocab_size)

    state = {k: v.numpy() for k, v in ref_tf.state_dict().items()}
    params = {"params": ckpt.convert_muse_transformer(state)}
    model = MultiViewTransformer(cfg)
    ours = np.asarray(model.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(cond, jnp.int32),
        jnp.asarray(ii), jnp.asarray(ei),
        cond_keep=jnp.zeros((b,), bool)).logits)
    np.testing.assert_allclose(
        ours, ref_null, atol=2e-4,
        err_msg="our dropped-cond (null) forward diverges from the "
                "executed reference's training-mode cond_drop_prob=1")


# ---------------------------------------------------------------------------
# full AR GPT forward, reference-executed with an emulated DeepSpeed kernel
# ---------------------------------------------------------------------------

class _DenseEmulatedSparseSelfAttention(torch.nn.Module):
    """Dense fp32 emulation of DeepSpeed's vendored SparseSelfAttention
    (sparse_self_attention.py:103-177): scores = QK^T + scattered
    add_mask (camera bias), scaled by dh^-0.5 inside the softmax, with
    the 'mul' attn_mask and off-layout blocks dropped to -inf."""

    def __init__(self, sparsity_config, key_padding_mask_mode="add",
                 attn_mask_mode="mul", max_seq_length=2048):
        super().__init__()
        assert attn_mask_mode == "mul"
        self.block = sparsity_config.block
        layout = sparsity_config.make_layout(max_seq_length)
        pattern = torch.kron(
            layout.float(), torch.ones(self.block, self.block))
        self.register_buffer("pattern", pattern)  # (heads, L, L)

    def forward(self, query, key, value, rpe=None, key_padding_mask=None,
                attn_mask=None, add_mask=None):
        dh = query.shape[-1]
        scores = query @ key.transpose(-1, -2)         # (b, h, L, L)
        if add_mask is not None:
            scores = scores + add_mask.unsqueeze(1)    # only kept blocks matter
        scores = scores * float(dh) ** -0.5
        keep = self.pattern[None] > 0
        if attn_mask is not None:
            keep = keep & (attn_mask[None, None] > 0)
        scores = scores.masked_fill(~keep, -float("inf"))
        attn = scores.softmax(-1)
        return attn @ value


def test_ref_gpt_forward_matches(monkeypatch):
    from bevgen_tpu.models.stage2.gpt import SparseGPT

    cfg = cfg_sparse_padded()
    mingpt = rh.import_ref(
        "multi_view_generation.modules.transformer.mingpt_sparse")

    # share OUR deterministic per-head layouts with the reference (its
    # multi_outward_pattern re-samples randomly on every call)
    sm = masks.sparse_masks(cfg)
    layouts_t = torch.tensor(sm.layouts)
    allowed_t = torch.tensor(
        np.repeat(sm.allowed[None], cfg.num_heads, axis=0))
    monkeypatch.setattr(mingpt.GPTConfig, "get_mask",
                        lambda self: (layouts_t, allowed_t))
    monkeypatch.setattr(mingpt, "SparseSelfAttention",
                        _DenseEmulatedSparseSelfAttention)

    torch.manual_seed(11)
    np.random.seed(11)
    rcfg = rh.ref_gpt_config(cfg, backend="deepspeed")
    ref_gpt = mingpt.GPT(rcfg).eval()

    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, (b, cam, hw))
    cond = rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_gpt(
            torch.tensor(ids.copy()), torch.tensor(cond),
            {"intrinsics_inv": torch.tensor(ii),
             "extrinsics_inv": torch.tensor(ei)},
            sampling=False).numpy()

    state = {k: v.numpy() for k, v in ref_gpt.state_dict().items()}
    params = {"params": ckpt.convert_gpt(state)}

    model = SparseGPT(cfg, use_pallas=False)
    init = model.init(jax.random.PRNGKey(1), jnp.asarray(ids, jnp.int32),
                      jnp.asarray(cond, jnp.int32), jnp.asarray(ii),
                      jnp.asarray(ei))
    missing, unexpected = ckpt.verify_tree_match(params["params"],
                                                 init["params"])
    assert not missing, f"convert_gpt missed params: {missing}"
    assert not unexpected, f"convert_gpt produced bad params: {unexpected}"

    ours = np.asarray(model.apply(params, jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(cond, jnp.int32),
                                  jnp.asarray(ii), jnp.asarray(ei),
                                  sampling=False))
    np.testing.assert_allclose(
        ours, ref_out, atol=5e-4,
        err_msg="our SparseGPT diverges from the EXECUTED reference GPT "
                "with shared weights")


# ---------------------------------------------------------------------------
# FULL decode loop, reference-executed: token-for-token trajectory equality
# ---------------------------------------------------------------------------

def _decode_loop_fixture(self_cond: bool, seed: int):
    """Build one reference MaskGit (self-critic) + our MaskGit sharing its
    weights, plus a deterministic batch. Returns everything both decode
    loops need."""
    from bevgen_tpu.core.config import MultiViewConfig as MVC, MuseConfig
    from bevgen_tpu.models.stage2.maskgit import MaskGit

    base = cfg_argoverse_dense()
    cfg = MVC(**{**{f: getattr(base, f) for f in base.__dataclass_fields__},
                 "self_cond": self_cond})
    torch.manual_seed(seed)
    np.random.seed(seed)
    muse = rh.import_ref(
        "multi_view_generation.modules.stage2.muse_maskgit_pytorch")
    rcfg = rh.ref_gpt_config(cfg)
    ref_tf = muse.MaskGitTransformerMultiView(
        num_tokens=cfg.vocab_size, seq_len=tuple(cfg.cam_latent_res),
        dim=cfg.num_embed, depth=cfg.num_layers, dim_head=cfg.dim_head,
        heads=cfg.num_heads, ff_mult=cfg.ff_mult, cfg=rcfg,
        self_cond=self_cond)
    ref_mg = muse.MaskGit(
        image_size=tuple(cfg.cam_latent_res), transformer=ref_tf,
        self_token_critic=True).eval()

    state = {f"maskgit.{k}": v.numpy()
             for k, v in ref_mg.state_dict().items()}
    converted = ckpt.convert_net2net(state)
    params = {"params": converted["maskgit"]["params"]}

    mcfg = MuseConfig(self_token_critic=True, critic_noise_scale=0.0,
                      temperature=1.0, topk_filter_thres=0.9,
                      cond_scale=3.0)
    model = MaskGit(cfg, mcfg)

    b, cam = 2, cfg.num_cams
    rng = np.random.default_rng(seed)
    cond = rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)
    return muse, ref_mg, model, params, cfg, cond, ii, ei


def _run_ref_generate(muse, ref_mg, cfg, cond, ii, ei, T, monkeypatch,
                      init_ids=None, force_not_use_token_critic=False):
    # zero the gumbel noise: the only stochastic input of the eval-mode
    # decode loop once critic_noise_scale=0 (muse_maskgit_pytorch.py:446)
    monkeypatch.setattr(muse, "gumbel_noise",
                        lambda t: torch.zeros_like(t))
    kw = {}
    if init_ids is not None:
        b, cam = cond.shape[0], cfg.num_cams
        kw["init_ids"] = torch.tensor(
            init_ids.reshape(b * cam, cfg.num_cam_tokens))
    with torch.no_grad():
        ref_ids = ref_mg.generate(
            cond_images=torch.tensor(cond),
            fmap_size=tuple(cfg.cam_latent_res),
            temperature=1.0, topk_filter_thres=0.9, timesteps=T,
            cond_scale=3.0, critic_noise_scale=0.0,
            force_not_use_token_critic=force_not_use_token_critic,
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)},
            **kw)
    b, cam = cond.shape[0], cfg.num_cams
    h, w = cfg.cam_latent_res
    return ref_ids.numpy().reshape(b, cam, h, w)


def _run_our_generate(model, params, cfg, cond, ii, ei, T, monkeypatch,
                      init_ids=None, force_not_use_token_critic=False):
    from bevgen_tpu.models.stage2 import maskgit as mg
    # zero-gumbel-noise sampling: argmax(logits/max(T,1e-10) + 0) ==
    # argmax(logits) for any annealed temperature >= 0
    monkeypatch.setattr(
        mg, "gumbel_sample",
        lambda rng, logits, temperature: jnp.argmax(logits, axis=-1))
    ids = mg.generate(
        model, params, jnp.asarray(cond, jnp.int32), jnp.asarray(ii),
        jnp.asarray(ei), jax.random.PRNGKey(0),
        init_ids=None if init_ids is None else jnp.asarray(init_ids,
                                                           jnp.int32),
        timesteps=T,
        force_not_use_token_critic=force_not_use_token_critic)
    return np.asarray(ids)


def test_ref_generate_trajectory_matches_self_critic(monkeypatch):
    """The ENTIRE eval decode loop, reference-executed: 6 steps of
    re-mask -> demask forward -> top-k filter -> (zero-noise) gumbel
    sample -> SelfCritic re-scoring (muse_maskgit_pytorch.py:511-621).
    With the gumbel noise zeroed and critic_noise_scale=0 the loop is
    deterministic; final token ids must match token-for-token.

    (self_cond=False here: the reference's OWN generate crashes with
    self_cond=True on multi-view shapes — the carried embed is
    (b, cam*hw, d) but forward's self_cond_to_init_embed add expects
    (b*cam, hw, d) (:356-359) — a dead upstream path, the shipped config
    trains without self-cond. The self-cond forward itself is golden-
    tested above with an explicit embed.)"""
    muse, ref_mg, model, params, cfg, cond, ii, ei = _decode_loop_fixture(
        self_cond=False, seed=31)
    T = 6
    ref_ids = _run_ref_generate(muse, ref_mg, cfg, cond, ii, ei, T,
                                monkeypatch)
    ours = _run_our_generate(model, params, cfg, cond, ii, ei, T,
                             monkeypatch)
    np.testing.assert_array_equal(
        ours, ref_ids,
        err_msg="scan decode loop diverges from the executed reference "
                "generate() (self-critic re-masking)")


def test_ref_generate_trajectory_matches_critic_free_partial(monkeypatch):
    """The confidence-score decode path (force_not_use_token_critic,
    muse_maskgit_pytorch.py:521,556,608-617) plus PARTIAL decoding
    (init_ids pinned after every re-mask, :545-548): final ids match the
    executed reference token-for-token and the pinned tokens survive."""
    muse, ref_mg, model, params, cfg, cond, ii, ei = _decode_loop_fixture(
        self_cond=False, seed=37)
    T = 5
    b, cam, hw = cond.shape[0], cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(41)
    init_ids = rng.integers(0, cfg.vocab_size,
                            (b, cam, hw)).astype(np.int64)
    regen = rng.uniform(size=(b, cam, hw)) < 0.6
    init_ids[regen] = cfg.mask_token_id

    ref_ids = _run_ref_generate(muse, ref_mg, cfg, cond, ii, ei, T,
                                monkeypatch, init_ids=init_ids,
                                force_not_use_token_critic=True)
    ours = _run_our_generate(model, params, cfg, cond, ii, ei, T,
                             monkeypatch, init_ids=init_ids,
                             force_not_use_token_critic=True)
    np.testing.assert_array_equal(
        ours, ref_ids,
        err_msg="critic-free partial decode diverges from the executed "
                "reference generate()")
    h, w = cfg.cam_latent_res
    pinned = ~regen.reshape(b, cam, h, w)
    np.testing.assert_array_equal(
        ours[pinned], init_ids.reshape(b, cam, h, w)[pinned],
        err_msg="partial decode overwrote pinned init tokens")


def test_ref_training_loss_matches(monkeypatch):
    """MaskGit TRAINING objective, reference-executed with a
    deterministically injected mask: masked-CE + SelfCritic BCE and the
    weighted total all match (muse_maskgit_pytorch.py:629-729). The
    reference draws its mask from torch RNG (uniform rand_time +
    rand-argsort permutation, :660-666); both its RNG entry points are
    pinned and the identical mask is handed to maskgit_loss via
    mask_override."""
    import dataclasses

    from bevgen_tpu.models.stage2 import maskgit as mg
    from bevgen_tpu.models.stage2.maskgit import MaskGit

    muse, ref_mg, model, params, cfg, cond, ii, ei = _decode_loop_fixture(
        self_cond=False, seed=43)
    ref_mg.train()  # the MUSE transformer has no dropout; train() only
    # un-gates the cond-drop path, which cond_drop_prob=0 disables
    b, cam, hw = cond.shape[0], cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(47)
    tokens = rng.integers(0, cfg.vocab_size, (b, cam, hw))

    # deterministic mask, computed the reference's way (:660-666)
    t = rng.uniform(size=(b * cam,)).astype(np.float32)
    num = np.clip(np.round(hw * np.cos(t * np.pi / 2)), 1, None)
    perm_noise = rng.uniform(size=(b * cam, hw)).astype(np.float32)
    mask = np.argsort(perm_noise, axis=-1) < num[:, None].astype(np.int64)

    real_rand = torch.rand

    def fake_uniform(shape, min=0, max=1, device=None):
        assert tuple(shape) == (b * cam,), shape
        return torch.tensor(t)

    def fake_rand(*size, **kw):
        if size and size[0] == (b * cam, hw):
            return torch.tensor(perm_noise)
        return real_rand(*size, **kw)

    monkeypatch.setattr(muse, "uniform", fake_uniform)
    monkeypatch.setattr(torch, "rand", fake_rand)
    monkeypatch.setattr(muse, "gumbel_noise",
                        lambda x: torch.zeros_like(x))
    monkeypatch.setattr(
        mg, "gumbel_sample",
        lambda r, logits, temperature: jnp.argmax(logits, axis=-1))

    with torch.no_grad():
        ref_total, ref_ce, ref_bce = ref_mg(
            torch.tensor(tokens.reshape(b * cam, hw)),
            cond_images=torch.tensor(cond),
            cond_drop_prob=0.0,
            sample_temperature=0.7,
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)})

    model0 = MaskGit(cfg, dataclasses.replace(model.muse,
                                              cond_drop_prob=0.0))
    ours = mg.maskgit_loss(
        model0, params, jax.random.PRNGKey(3),
        jnp.asarray(tokens, jnp.int32), jnp.asarray(cond, jnp.int32),
        jnp.asarray(ii), jnp.asarray(ei),
        mask_override=jnp.asarray(mask.reshape(b, cam, hw)))

    np.testing.assert_allclose(float(ours.ce_loss), float(ref_ce),
                               atol=2e-4)
    np.testing.assert_allclose(float(ours.critic_loss), float(ref_bce),
                               atol=2e-4)
    np.testing.assert_allclose(float(ours.loss), float(ref_total),
                               atol=4e-4)


def test_ref_ar_sample_trajectory_matches(monkeypatch):
    """The AR token-by-token sampling loop, reference-executed
    (cond_transformer_multi_view.py:155-227): greedy (sample=False)
    decode over the full outward order — re-mask-free, one full GPT
    forward per token, logits plucked at (cam i, pos k) in permuter
    order — vs our lax.scan ar_sample with categorical patched to
    argmax. Token-for-token equality of the final latent grids."""
    import types

    from bevgen_tpu.models.stage2 import ar
    from bevgen_tpu.models.stage2.gpt import SparseGPT

    cfg = cfg_sparse_padded()
    mingpt = rh.import_ref(
        "multi_view_generation.modules.transformer.mingpt_sparse")
    ctm = rh.import_ref_ar()

    sm = masks.sparse_masks(cfg)
    layouts_t = torch.tensor(sm.layouts)
    allowed_t = torch.tensor(
        np.repeat(sm.allowed[None], cfg.num_heads, axis=0))
    monkeypatch.setattr(mingpt.GPTConfig, "get_mask",
                        lambda self: (layouts_t, allowed_t))
    monkeypatch.setattr(mingpt, "SparseSelfAttention",
                        _DenseEmulatedSparseSelfAttention)

    torch.manual_seed(29)
    np.random.seed(29)
    rcfg = rh.ref_gpt_config(cfg, backend="deepspeed")
    ref_gpt = mingpt.GPT(rcfg).eval()

    b, cam, hw = 2, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(6)
    cond = rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens))
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)
    batch_t = {"intrinsics_inv": torch.tensor(ii),
               "extrinsics_inv": torch.tensor(ei)}

    # drive the reference's sample() as an unbound method on a shim —
    # the surrounding Lightning module machinery (first/cond stage,
    # loggers) is unused on the sample=False, full-decode path
    shim = types.SimpleNamespace(cfg=rcfg, transformer=ref_gpt,
                                 skip_sampling=False, debug_viz=False)
    x0 = torch.zeros((b, cam, hw), dtype=torch.int64)
    with torch.no_grad():
        ref_ids = ctm.Net2NetTransformer.sample(
            shim, x0, torch.tensor(cond), batch_t, temperature=1.0,
            sample=False)
    ref_ids = ref_ids.numpy().reshape(b, cam, *cfg.cam_latent_res)

    state = {k: v.numpy() for k, v in ref_gpt.state_dict().items()}
    params = {"params": ckpt.convert_gpt(state)}
    model = SparseGPT(cfg, use_pallas=False)

    monkeypatch.setattr(
        jax.random, "categorical",
        lambda r, logits, axis=-1: jnp.argmax(logits, axis=axis))
    ours = np.asarray(ar.ar_sample(
        model, params, jnp.asarray(cond, jnp.int32), jnp.asarray(ii),
        jnp.asarray(ei), jax.random.PRNGKey(0), temperature=1.0))
    np.testing.assert_array_equal(
        ours, ref_ids,
        err_msg="AR scan sampler diverges from the executed reference "
                "token-by-token sample loop")


def test_ref_muse_pixel_end_to_end_matches(monkeypatch):
    """CAPSTONE fidelity test: the ENTIRE shipped inference path —
    BEV raster -> VQSegmentationModel encode -> 4-step MaskGit decode
    (self-critic) -> VQModel codebook decode — executed in the reference
    (cond_transformer_multi_view_muse.py:121-164 + vqgan.py) and in
    BEVGenPipeline with the SAME weights (one reference-layout state
    dict through convert_net2net) and deterministic sampling. Token ids
    must be EQUAL and the decoded PIXELS must match to fp32 tolerance.
    This is the strongest available stand-in for the FID-parity gate:
    with pixel-identical outputs at fp32, image metrics are identical
    by construction."""
    from bevgen_tpu.core.config import (MuseConfig, MultiViewConfig as MVC,
                                        PipelineConfig, Stage1Config)
    from bevgen_tpu.models.stage2 import maskgit as mg
    from bevgen_tpu.pipelines.generate import BEVGenPipeline

    ref_vqgan = rh.import_ref_stage1()
    muse = rh.import_ref(
        "multi_view_generation.modules.stage2.muse_maskgit_pytorch")

    # 8x-downsample stage 1: 32px -> 4x4 latents; n_embed 32 = vocab
    dd = dict(double_z=False, z_channels=32, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 1, 2, 2], num_res_blocks=1,
              attn_resolutions=[4], dropout=0.0)
    tf = MVC(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        dim_head=32, vocab_size=32, cond_vocab_size=32, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
        window_len=4, camera_bias=True, image_embed=True, bev_embed=True,
        legacy_prob_matrix=True)
    s1 = Stage1Config(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                      z_channels=32, n_embed=32, embed_dim=16,
                      resolution=32, attn_resolutions=(4,),
                      cam_res=(32, 32), cam_latent_res=(4, 4))
    bev = Stage1Config(in_channels=7, out_ch=7, n_labels=7, ch=32,
                       ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                       z_channels=32, n_embed=32, embed_dim=16,
                       resolution=32, attn_resolutions=(4,),
                       cam_res=(32, 32), cam_latent_res=(4, 4))
    T = 4
    mcfg = MuseConfig(self_token_critic=True, critic_noise_scale=0.0,
                      temperature=1.0, topk_filter_thres=0.9,
                      cond_scale=3.0, sample_iterations=T)
    cfg = PipelineConfig(transformer=tf, first_stage=s1, cond_stage=bev,
                         muse=mcfg)

    # --- reference models, one seed ---
    torch.manual_seed(53)
    np.random.seed(53)
    first = ref_vqgan.VQModel(ddconfig=dict(dd), lossconfig=None,
                              n_embed=32, embed_dim=16, cam_res=(32, 32),
                              cam_latent_res=(4, 4), cam_emd_dim=32).eval()
    cond = ref_vqgan.VQSegmentationModel(
        ddconfig=dict(dd, in_channels=7, out_ch=7), lossconfig=None,
        n_embed=32, embed_dim=16, cam_res=(32, 32), cam_latent_res=(4, 4),
        cam_emd_dim=32, n_labels=7).eval()
    rcfg = rh.ref_gpt_config(tf)
    ref_tf = muse.MaskGitTransformerMultiView(
        num_tokens=tf.vocab_size, seq_len=tuple(tf.cam_latent_res),
        dim=tf.num_embed, depth=tf.num_layers, dim_head=tf.dim_head,
        heads=tf.num_heads, ff_mult=tf.ff_mult, cfg=rcfg)
    ref_mg = muse.MaskGit(image_size=tuple(tf.cam_latent_res),
                          transformer=ref_tf, self_token_critic=True).eval()

    b, cam = 2, tf.num_cams
    rng = np.random.default_rng(59)
    seg = (rng.uniform(size=(b, 32, 32, 7)) > 0.5).astype(np.float32)
    intr, extr = geometry.canonical_camera_rig(tf)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)

    # --- reference inference path ---
    monkeypatch.setattr(muse, "gumbel_noise",
                        lambda t: torch.zeros_like(t))
    with torch.no_grad():
        seg_t = torch.from_numpy(np.transpose(seg, (0, 3, 1, 2)))
        _, _, (_, _, c_ind) = cond.encode(seg_t, {})
        c_ind = c_ind.view(b, -1)                  # encode_to_c (:149-155)
        ref_ids = ref_mg.generate(
            cond_images=c_ind, fmap_size=tuple(tf.cam_latent_res),
            temperature=1.0, topk_filter_thres=0.9, timesteps=T,
            cond_scale=3.0, critic_noise_scale=0.0,
            batch={"intrinsics_inv": torch.tensor(ii),
                   "extrinsics_inv": torch.tensor(ei)})
        quant = first.quantize.get_codebook_entry(  # decode_to_img (:157-164)
            ref_ids.reshape(-1), (b * cam, 4, 4, 16))
        ref_imgs = first.decode(quant)
    ref_ids = ref_ids.numpy().reshape(b, cam, 4, 4)
    ref_imgs = np.transpose(ref_imgs.numpy(), (0, 2, 3, 1)).reshape(
        b, cam, 32, 32, 3)

    # --- ours: one reference-layout state dict -> pipeline params ---
    state = {}
    for prefix, mod in (("first_stage_model.", first),
                        ("cond_stage_model.", cond),
                        ("maskgit.", ref_mg)):
        for k, v in mod.state_dict().items():
            state[prefix + k] = v.numpy()
    params = ckpt.convert_net2net(state)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    pipe = BEVGenPipeline.create(cfg, dtype=jnp.float32)
    init = pipe.init_params(jax.random.PRNGKey(0))
    for part in ("first_stage", "cond_stage", "maskgit"):
        missing, unexpected = ckpt.verify_tree_match(
            params[part]["params"], init[part]["params"])
        assert not missing, (part, missing[:5])
        assert not unexpected, (part, unexpected[:5])

    monkeypatch.setattr(
        mg, "gumbel_sample",
        lambda r, logits, temperature: jnp.argmax(logits, axis=-1))
    imgs, ids = pipe.generate_fn(params, jnp.asarray(seg),
                                 jnp.asarray(ii), jnp.asarray(ei),
                                 jax.random.PRNGKey(1))

    np.testing.assert_array_equal(
        np.asarray(ids), ref_ids,
        err_msg="pipeline token ids diverge from the executed reference "
                "end-to-end inference path")
    np.testing.assert_allclose(
        np.asarray(imgs), ref_imgs, atol=2e-4, rtol=1e-3,
        err_msg="generated PIXELS diverge from the executed reference")


def test_ref_ar_pixel_end_to_end_matches(monkeypatch, tmp_path):
    """AR capstone: BEV raster -> cond encode -> greedy AR decode ->
    pixel decode, reference-executed (Net2NetTransformer.sample +
    decode_to_img path) vs ARPipeline with the KV-CACHED incremental
    decoder, weights shared through a reference-layout .ckpt and
    load_weights. Token ids equal, pixels equal at fp32 — the cached
    decoder's equivalence to the reference becomes a single direct
    assertion instead of a transitive chain."""
    import types

    from bevgen_tpu.core.config import (MuseConfig, MultiViewConfig as MVC,
                                        PipelineConfig, Stage1Config)
    from bevgen_tpu.pipelines.ar_generate import ARPipeline
    from bevgen_tpu.training.checkpoints import load_weights

    ref_vqgan = rh.import_ref_stage1()
    mingpt = rh.import_ref(
        "multi_view_generation.modules.transformer.mingpt_sparse")
    ctm = rh.import_ref_ar()

    dd = dict(double_z=False, z_channels=32, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 1, 2, 2], num_res_blocks=1,
              attn_resolutions=[4], dropout=0.0)
    tf = MVC(
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

    sm = masks.sparse_masks(tf)
    layouts_t = torch.tensor(sm.layouts)
    allowed_t = torch.tensor(
        np.repeat(sm.allowed[None], tf.num_heads, axis=0))
    monkeypatch.setattr(mingpt.GPTConfig, "get_mask",
                        lambda self: (layouts_t, allowed_t))
    monkeypatch.setattr(mingpt, "SparseSelfAttention",
                        _DenseEmulatedSparseSelfAttention)

    torch.manual_seed(61)
    np.random.seed(61)
    first = ref_vqgan.VQModel(ddconfig=dict(dd), lossconfig=None,
                              n_embed=32, embed_dim=16, cam_res=(32, 32),
                              cam_latent_res=(4, 4), cam_emd_dim=32).eval()
    cond = ref_vqgan.VQSegmentationModel(
        ddconfig=dict(dd, in_channels=7, out_ch=7), lossconfig=None,
        n_embed=32, embed_dim=16, cam_res=(32, 32), cam_latent_res=(4, 4),
        cam_emd_dim=32, n_labels=7).eval()
    rcfg = rh.ref_gpt_config(tf, backend="deepspeed")
    ref_gpt = mingpt.GPT(rcfg).eval()

    b, cam, hw = 2, tf.num_cams, tf.num_cam_tokens
    rng = np.random.default_rng(67)
    seg = (rng.uniform(size=(b, 32, 32, 7)) > 0.5).astype(np.float32)
    intr, extr = geometry.canonical_camera_rig(tf)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cam, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cam, 4, 4)).astype(np.float32)
    batch_t = {"intrinsics_inv": torch.tensor(ii),
               "extrinsics_inv": torch.tensor(ei)}

    with torch.no_grad():
        seg_t = torch.from_numpy(np.transpose(seg, (0, 3, 1, 2)))
        _, _, (_, _, c_ind) = cond.encode(seg_t, {})
        c_ind = c_ind.view(b, -1)
        shim = types.SimpleNamespace(cfg=rcfg, transformer=ref_gpt,
                                     skip_sampling=False, debug_viz=False)
        ref_ids = ctm.Net2NetTransformer.sample(
            shim, torch.zeros((b, cam, hw), dtype=torch.int64), c_ind,
            batch_t, temperature=1.0, sample=False)
        quant = first.quantize.get_codebook_entry(
            ref_ids.reshape(-1), (b * cam, 4, 4, 16))
        ref_imgs = first.decode(quant)
    ref_ids = ref_ids.numpy().reshape(b, cam, 4, 4)
    ref_imgs = np.transpose(ref_imgs.numpy(), (0, 2, 3, 1)).reshape(
        b, cam, 32, 32, 3)

    # --- ours: reference-layout .ckpt -> load_weights -> cached decode ---
    state = {}
    for prefix, mod in (("first_stage_model.", first),
                        ("cond_stage_model.", cond),
                        ("transformer.", ref_gpt)):
        for k, v in mod.state_dict().items():
            state[prefix + k] = v
    path = tmp_path / "ar_net2net.ckpt"
    torch.save({"state_dict": state}, str(path))

    pipe = ARPipeline.create(cfg, dtype=jnp.float32, use_pallas=False)
    init = pipe.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(jnp.asarray,
                                    load_weights(str(path), init))

    monkeypatch.setattr(
        jax.random, "categorical",
        lambda r, logits, axis=-1: jnp.argmax(logits, axis=axis))
    imgs, ids = pipe.generate_fn(params, jnp.asarray(seg),
                                 jnp.asarray(ii), jnp.asarray(ei),
                                 jax.random.PRNGKey(2), temperature=1.0,
                                 top_k=None)

    np.testing.assert_array_equal(
        np.asarray(ids), ref_ids,
        err_msg="KV-cached AR decode diverges from the executed "
                "reference sample loop end-to-end")
    np.testing.assert_allclose(
        np.asarray(imgs), ref_imgs, atol=2e-4, rtol=1e-3,
        err_msg="AR-generated PIXELS diverge from the executed reference")
