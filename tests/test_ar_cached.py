"""KV-cached AR decoding: equivalence with the full-forward GPT."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry
from bevgen_tpu.models.stage2 import ar, ar_cached
from bevgen_tpu.models.stage2.gpt import SparseGPT


def gpt_cfg(**kw):
    base = dict(num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
                vocab_size=32, cond_vocab_size=32, num_cams=3,
                cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
                cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
                window_len=4, sparse_block_size=8, density=0.7,
                causal_order=True, camera_bias=False, image_embed=True,
                bev_embed=True, legacy_prob_matrix=False)
    base.update(kw)
    return MultiViewConfig(**base)


def make_inputs(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.vocab_size,
                       (b, cfg.num_cams, cfg.num_cam_tokens)).astype(np.int32)
    cond = rng.integers(0, cfg.cond_vocab_size,
                        (b, cfg.num_cond_tokens)).astype(np.int32)
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cfg.num_cams, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cfg.num_cams, 4, 4)).astype(np.float32)
    return (jnp.asarray(ids), jnp.asarray(cond), jnp.asarray(ii),
            jnp.asarray(ei))


@pytest.mark.parametrize("camera_bias", [False, True])
@pytest.mark.slow
def test_teacher_forced_logits_match_full_forward(camera_bias):
    cfg = gpt_cfg(camera_bias=camera_bias)
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)

    full = model.apply(params, ids, cond, ii, ei, sampling=True)
    cached = ar_cached.teacher_forced_logits(model, params, ids, cond,
                                             ii, ei)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               atol=2e-4,
                               err_msg="cached logits diverge from full fwd")


@pytest.mark.slow
def test_cached_sampling_matches_full_sampler_greedy():
    cfg = gpt_cfg()
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    out_full = ar.ar_sample(model, params, cond, ii, ei,
                            jax.random.PRNGKey(5), top_k=1)
    out_cached = ar_cached.ar_sample_cached(model, params, cond, ii, ei,
                                            jax.random.PRNGKey(5), top_k=1)
    # greedy decode: identical trajectories
    np.testing.assert_array_equal(np.asarray(out_full),
                                  np.asarray(out_cached))


@pytest.mark.slow
def test_cached_partial_decode():
    cfg = gpt_cfg()
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    init = jnp.full_like(ids, cfg.vocab_size)
    init = init.at[:, 0].set(ids[:, 0])
    out = ar_cached.ar_sample_cached(model, params, cond, ii, ei,
                                     jax.random.PRNGKey(2), init_ids=init)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(ids.shape)[:, 0], np.asarray(ids[:, 0]))


def test_cached_matches_full_forward_nuscenes_outward_order():
    """The cached decoder must track the full forward under the
    interleaved nuScenes outward decode order too."""
    cfg = gpt_cfg(dataset="nuscenes", cam_names="NUSCENES_CAMERAS",
                  num_cams=6, cam_latent_res=(2, 5), sparse_block_size=8,
                  density=0.8, legacy_prob_matrix=True, bev_embed=False)
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    full = model.apply(params, ids, cond, ii, ei, sampling=True)
    cached = ar_cached.teacher_forced_logits(model, params, ids, cond,
                                             ii, ei)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               atol=2e-4)


def test_int8_weight_quantized_decode_tracks_fp32():
    """quantize_gpt_tree: W8/bf16-compute cached decode stays close to
    the fp32 path (the AR serving option — ar_cached._dense)."""
    from bevgen_tpu.ops.quant import quantize_gpt_tree

    cfg = gpt_cfg(camera_bias=True)
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    qparams = jax.tree_util.tree_map(
        jnp.asarray, {"params": quantize_gpt_tree(params["params"])})

    ref = np.asarray(ar_cached.teacher_forced_logits(
        model, params, ids, cond, ii, ei), np.float64)
    got = np.asarray(ar_cached.teacher_forced_logits(
        model, qparams, ids, cond, ii, ei), np.float64)
    a, b = ref.ravel(), got.ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.995, cos
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.9, agree

    # sampling runs end-to-end on the quantized tree
    out = ar_cached.ar_sample_cached(model, qparams, cond, ii, ei,
                                     jax.random.PRNGKey(1), top_k=8)
    assert out.shape == (2, cfg.num_cams, *cfg.cam_latent_res)
    assert int(out.max()) < cfg.vocab_size


@pytest.mark.slow
def test_prefix_bucketing_bit_identical(monkeypatch):
    """Causal prefix bucketing (lax.switch over static cache-prefix
    widths) removes only exactly-zero softmax terms (NEG_INF underflows
    exp to 0.0 in f32) — but XLA associates the narrower reductions
    differently, so equality is to f32 reassociation noise (measured
    ~3e-4 relative after 2 layers of amplification), not bitwise.
    Force multiple buckets at the tiny shape and compare teacher-forced
    logits against the single-bucket path."""
    cfg = gpt_cfg(camera_bias=True)
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg, seed=3)
    params = model.init(jax.random.PRNGKey(1), ids, cond, ii, ei)

    full = np.asarray(ar_cached.teacher_forced_logits(
        model, params, ids, cond, ii, ei))
    L = cfg.gpt_block_size
    monkeypatch.setattr(ar_cached, "PREFIX_BUCKET", max(8, L // 4))
    assert -(-L // ar_cached.PREFIX_BUCKET) >= 3  # actually multi-branch
    bucketed = np.asarray(ar_cached.teacher_forced_logits(
        model, params, ids, cond, ii, ei))
    np.testing.assert_allclose(bucketed, full, rtol=5e-3,
                               atol=1e-4)


def test_bucket_ranges_cover_all_steps():
    for L, nc, N, bucket in [(64, 16, 48, 16), (2356, 256, 2100, 512),
                             (64, 16, 48, 1 << 30), (100, 7, 93, 32)]:
        ranges = ar_cached.bucket_ranges(L, nc, N, bucket)
        ts = []
        for t0, t1, pl in ranges:
            assert t0 < t1 and pl <= L
            # every position in the chunk fits inside its static prefix
            assert nc + (t1 - 1) < pl
            ts.extend(range(t0, t1))
        assert ts == list(range(N))
