"""int8 W8A8 serving quantization (ops/quant.py).

The reference serves fp16 (README.md:109); the int8 path is a TPU-only
extra — these tests pin its numerics and the checkpoint conversion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import tiny_test_config
from bevgen_tpu.models import geometry
from bevgen_tpu.models.stage2.maskgit import MaskGit
from bevgen_tpu.ops.quant import (QuantDense, dequantize_dense_tree,
                                  int8_matmul, quantize_activations,
                                  quantize_dense_tree, quantize_weight)


def test_weight_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.02, (64, 48)).astype(np.float32)
    q, s = quantize_weight(w)
    deq = q.astype(np.float32) * s
    # symmetric per-channel int8: max error is half a step = amax/254
    step = np.abs(w).max(axis=0) / 127.0
    assert np.all(np.abs(deq - w) <= step / 2 + 1e-7)


def test_activation_quant_shapes_and_range():
    x = jnp.asarray(np.random.default_rng(1).normal(0, 3.0, (5, 7, 32)),
                    jnp.bfloat16)
    q, s = quantize_activations(x)
    assert q.dtype == jnp.int8 and s.shape == (5, 7, 1)
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127


def test_int8_matmul_matches_fp32():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (16, 64)).astype(np.float32)
    w = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
    w_q, w_s = quantize_weight(w)
    x_q, x_s = quantize_activations(jnp.asarray(x))
    out = int8_matmul(x_q, x_s, jnp.asarray(w_q), jnp.asarray(w_s),
                      jnp.float32)
    ref = x @ w
    rel = np.abs(np.asarray(out) - ref) / (np.abs(ref).max() + 1e-6)
    assert rel.max() < 0.03


def test_quantdense_apply_matches_dequantized_kernel():
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.02, (32, 24)).astype(np.float32)
    w_q, w_s = quantize_weight(w)
    params = {"params": {"kernel_q": jnp.asarray(w_q),
                         "scale": jnp.asarray(w_s)}}
    x = jnp.asarray(rng.normal(0, 1, (4, 32)), jnp.float32)
    out = QuantDense(24, dtype=jnp.float32).apply(params, x)
    x_q, x_s = quantize_activations(x)
    ref = (np.asarray(x_q, np.float32) * np.asarray(x_s)) @ (
        w_q.astype(np.float32) * w_s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def maskgit_inputs():
    pipe = tiny_test_config()
    cfg = pipe.transformer
    rng = np.random.default_rng(0)
    b = 2
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                   (b, cfg.num_cams, cfg.num_cam_tokens)),
                      jnp.int32)
    cond = jnp.asarray(rng.integers(0, cfg.cond_vocab_size,
                                    (b, cfg.num_cond_tokens)), jnp.int32)
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = jnp.asarray(np.broadcast_to(np.linalg.inv(intr)[None],
                                     (b, cfg.num_cams, 3, 3)), jnp.float32)
    ei = jnp.asarray(np.broadcast_to(np.linalg.inv(extr)[None],
                                     (b, cfg.num_cams, 4, 4)), jnp.float32)
    return pipe, (ids, cond, ii, ei)


@pytest.mark.slow
def test_quantized_transformer_tracks_fp32(maskgit_inputs):
    pipe, (ids, cond, ii, ei) = maskgit_inputs
    cfg = pipe.transformer
    m = MaskGit(cfg, pipe.muse, dtype=jnp.float32)
    m_q = MaskGit(cfg.replace(quant="int8"), pipe.muse, dtype=jnp.float32)

    params = m.init(jax.random.PRNGKey(0), ids, cond, ii, ei,
                    method=MaskGit.init_all)
    qparams = {"params": quantize_dense_tree(params["params"])}

    # converted tree must structurally match a fresh quant-model init
    ref = jax.tree_util.tree_structure(
        m_q.init(jax.random.PRNGKey(0), ids, cond, ii, ei,
                 method=MaskGit.init_all))
    assert jax.tree_util.tree_structure(qparams) == ref

    out = np.asarray(m.apply(params, ids, cond, ii, ei).logits, np.float64)
    out_q = np.asarray(m_q.apply(qparams, ids, cond, ii, ei).logits,
                       np.float64)
    a, b_ = out.ravel(), out_q.ravel()
    cos = (a @ b_) / (np.linalg.norm(a) * np.linalg.norm(b_))
    assert cos > 0.995, cos
    agree = (out.argmax(-1) == out_q.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_dequantize_inverts_structure(maskgit_inputs):
    pipe, (ids, cond, ii, ei) = maskgit_inputs
    cfg = pipe.transformer
    m = MaskGit(cfg, pipe.muse, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), ids, cond, ii, ei,
                    method=MaskGit.init_all)
    q = quantize_dense_tree(params["params"])
    back = dequantize_dense_tree(q)
    assert (jax.tree_util.tree_structure(back) ==
            jax.tree_util.tree_structure(
                jax.tree_util.tree_map(np.asarray, params["params"])))
    # dequantized kernels close to originals
    orig = params["params"]["transformer"]["to_logits"]["kernel"]
    rec = back["transformer"]["to_logits"]["kernel"]
    step = np.abs(np.asarray(orig)).max(axis=0) / 127.0
    assert np.all(np.abs(rec - np.asarray(orig)) <= step / 2 + 1e-7)


def test_static_scales_fold_nontrivial_gammas(maskgit_inputs):
    """The static-activation path must stay numerically faithful when
    the LayerNorm gammas are NOT all-ones (real checkpoints): the
    per-channel in_scale folds |gamma| into the weight quantization
    (ops/quant.py quantize_weight_static)."""
    pipe, (ids, cond, ii, ei) = maskgit_inputs
    cfg = pipe.transformer
    m = MaskGit(cfg, pipe.muse, dtype=jnp.float32)
    m_q = MaskGit(cfg.replace(quant="int8"), pipe.muse, dtype=jnp.float32)

    params = m.init(jax.random.PRNGKey(0), ids, cond, ii, ei,
                    method=MaskGit.init_all)

    # perturb every LN gamma by a wide per-channel spread (0.1x .. 10x)
    rng = np.random.default_rng(7)

    def perturb(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "norm" and isinstance(v, dict) and "scale" in v \
                        and np.ndim(v["scale"]) == 1:
                    g = np.exp(rng.uniform(-2.3, 2.3,
                                           np.shape(v["scale"])))
                    out[k] = dict(v, scale=jnp.asarray(g, jnp.float32))
                else:
                    out[k] = perturb(v)
            return out
        return node

    params = {"params": perturb(params["params"])}
    qtree = quantize_dense_tree(params["params"])
    qparams = {"params": qtree}

    # static layers carry in_scale tied to the perturbed gamma
    attn0 = qtree["transformer"]["layers_0_attn"]
    gamma = np.asarray(
        params["params"]["transformer"]["layers_0_attn"]["norm"]["norm"]
        ["scale"])
    from bevgen_tpu.ops.quant import CLIP_SIGMA
    np.testing.assert_allclose(attn0["to_q"]["in_scale"],
                               np.abs(gamma) * CLIP_SIGMA / 127.0,
                               rtol=1e-6)
    assert "in_scale" not in attn0["to_out"]          # dynamic
    assert "in_scale" not in (
        qtree["transformer"]["layers_0_cross_attn"]["to_kv"])

    out = np.asarray(m.apply(params, ids, cond, ii, ei).logits, np.float64)
    out_q = np.asarray(m_q.apply(qparams, ids, cond, ii, ei).logits,
                       np.float64)
    a, b_ = out.ravel(), out_q.ravel()
    cos = (a @ b_) / (np.linalg.norm(a) * np.linalg.norm(b_))
    assert cos > 0.99, cos


def test_quantized_batch_hint_crossover(tiny_pipe, capsys):
    """quantized(batch_hint=) auto-selects: below the measured crossover
    it quantizes; at/above it keeps bf16 unchanged and says why
    (round-4 sweep: int8 wins b2-b4, bf16 wins b8-b16)."""
    pipe, params = tiny_pipe
    qpipe, qparams = pipe.quantized(params, batch_hint=2)
    assert qpipe.config.transformer.quant == "int8"
    keep_pipe, keep_params = pipe.quantized(params,
                                            batch_hint=pipe.INT8_CROSSOVER_BATCH)
    assert keep_pipe is pipe and keep_params is params
    assert "keeping bf16" in capsys.readouterr().out
    # explicit None forces quantization regardless (the bench's path)
    forced, _ = pipe.quantized(params, batch_hint=None)
    assert forced.config.transformer.quant == "int8"


def test_int8_crossover_table():
    """The measured-table guard (configs/int8_crossover.json): int8
    selected where the table says it wins, bf16 where it loses, nearest
    measured batch used between entries."""
    from bevgen_tpu.pipelines.generate import BEVGenPipeline
    assert BEVGenPipeline.int8_beats_bf16(2) is True
    assert BEVGenPipeline.int8_beats_bf16(3) is True
    assert BEVGenPipeline.int8_beats_bf16(8) is False
    assert BEVGenPipeline.int8_beats_bf16(16) is False
    assert BEVGenPipeline.int8_beats_bf16(100) is False  # nearest = 16
    assert BEVGenPipeline.int8_beats_bf16(1) is True     # nearest w/ both = 2
