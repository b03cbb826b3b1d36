"""Checkpoint converter tests: synthesize a reference-layout torch
state_dict (naming per modules/stage1/vqgan.py + muse_maskgit_pytorch),
convert, and require an EXACT match against our freshly-initialized
param trees — every param mapped, shapes transposed correctly."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core import checkpoint as ckpt
from bevgen_tpu.core.config import tiny_test_config
from bevgen_tpu.pipelines.generate import BEVGenPipeline


# ---------------------------------------------------------------------------
# inverse mapping: flax tree -> reference torch keys (test-side oracle)
# ---------------------------------------------------------------------------

def _stage1_torch_key(path):
    """flax param path -> (torch key, transpose_fn_to_torch)."""
    parts = list(path)
    as_conv = lambda a: np.transpose(a, (3, 2, 0, 1))
    ident = lambda a: a
    if parts == ["codebook"]:
        return "quantize.embedding.weight", ident
    if parts[0] in ("quant_conv", "post_quant_conv"):
        return (f"{parts[0]}.weight" if parts[1] == "kernel"
                else f"{parts[0]}.bias"), (as_conv if parts[1] == "kernel"
                                           else ident)
    mod = parts[0]  # encoder / decoder
    name = parts[1]
    m = re.match(r"(down|up)_(\d+)_(block|attn)_(\d+)", name)
    if m:
        tname = f"{mod}.{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}"
    elif re.match(r"(down|up)_(\d+)_(downsample|upsample)", name):
        m2 = re.match(r"(down|up)_(\d+)_(downsample|upsample)", name)
        tname = f"{mod}.{m2.group(1)}.{m2.group(2)}.{m2.group(3)}"
    elif name.startswith("mid_"):
        tname = f"{mod}.mid.{name[4:]}"
    else:
        tname = f"{mod}.{name}"
    rest = parts[2:]
    if len(rest) == 1:  # conv_in/conv_out style: kernel|bias directly
        if rest[0] == "kernel":
            return f"{tname}.weight", as_conv
        return f"{tname}.bias", ident
    if rest[0] == "norm" and len(rest) == 2:  # norm_out style: norm/scale
        pn = "weight" if rest[1] == "scale" else "bias"
        return f"{tname}.{pn}", ident
    if len(rest) == 3 and rest[1] == "norm":  # norm1/norm/scale
        pn = "weight" if rest[2] == "scale" else "bias"
        return f"{tname}.{rest[0]}.{pn}", ident
    sub, pn = rest[0], rest[1]
    if pn == "kernel":
        return f"{tname}.{sub}.weight", as_conv
    return f"{tname}.{sub}.bias", ident


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def _tree_allclose(a, b, atol=1e-6):
    fa = dict(_flatten(a))
    fb = dict(_flatten(b))
    assert set(fa) == set(fb), (
        f"missing={sorted(set(fb)-set(fa))[:5]} "
        f"extra={sorted(set(fa)-set(fb))[:5]}")
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=atol,
                                   err_msg=str(k))


@pytest.fixture(scope="module")
def pipe_params(tiny_pipe):
    # reuse the session-scoped tiny pipeline (conftest): its init is the
    # single biggest fixture cost in the fast lane (~24 s on this host)
    # and the converter tests only need SOME consistent param values
    return tiny_pipe


def test_stage1_converter_roundtrip(pipe_params):
    pipe, params = pipe_params
    flax_tree = jax.tree_util.tree_map(np.asarray,
                                       params["first_stage"]["params"])
    state = {}
    for path, val in _flatten(flax_tree):
        key, to_torch = _stage1_torch_key(list(path))
        state[key] = to_torch(val)
    converted = ckpt.convert_stage1(state)
    missing, unexpected = ckpt.verify_tree_match(converted, flax_tree)
    assert not missing and not unexpected, (missing[:5], unexpected[:5])
    _tree_allclose(converted, flax_tree)


def _muse_torch_key(path):
    parts = list(path)
    ident = lambda a: a
    lin = lambda a: a.T
    conv1x1 = lambda a: a.T[:, :, None, None]
    if parts[0] in ("token_emb", "cond_token_emb", "pos_emb", "cond_pos_emb"):
        return f"{parts[0]}.weight", ident
    if parts[0] == "to_logits":
        return "to_logits.weight", lin
    if parts[0] in ("img_embed", "cam_embed"):
        return f"{parts[0]}.weight", conv1x1
    if parts[0] == "bev_embed":
        return (("bev_embed.weight", conv1x1) if parts[1] == "kernel"
                else ("bev_embed.bias", ident))
    if parts[0] == "camera_bias_emb":
        # our param is the full (L, L) matrix; torch stores flat tril
        return parts[0], lambda a: a[np.tril_indices(a.shape[0])][None]
    if parts[0] == "bev_cam_pos_emb":
        return parts[0], ident
    if parts[0] == "final_norm":
        return "transformer_blocks.norm.gamma", ident
    m = re.match(r"layers_(\d+)_(attn|cross_attn|ff)", parts[0])
    assert m, parts
    layer = m.group(1)
    kind = m.group(2)
    idx = {"attn": "0", "cross_attn": "1", "ff": "2"}[kind]
    base = f"transformer_blocks.layers.{layer}.{idx}"
    rest = parts[1:]
    if kind in ("attn", "cross_attn"):
        if rest[0] == "norm":
            return f"{base}.norm.gamma", ident
        if rest[0] in ("to_q", "to_kv", "to_out"):
            return f"{base}.{rest[0]}.weight", lin
        return f"{base}.{rest[0]}", ident  # q_scale, k_scale, null_kv
    ff_inv = {"norm_in": "0", "proj_in": "1", "norm_mid": "3", "proj_out": "4"}
    sub = ff_inv[rest[0]]
    if sub in ("0", "3"):
        return f"{base}.{sub}.gamma", ident
    return f"{base}.{sub}.weight", lin


def test_muse_converter_roundtrip(pipe_params):
    pipe, params = pipe_params
    tf_tree = jax.tree_util.tree_map(
        np.asarray, params["maskgit"]["params"]["transformer"])
    state = {}
    for path, val in _flatten(tf_tree):
        key, to_torch = _muse_torch_key(list(path))
        state[key] = to_torch(val)
    converted = ckpt.convert_muse_transformer(state)
    missing, unexpected = ckpt.verify_tree_match(converted, tf_tree)
    assert not missing and not unexpected, (missing[:5], unexpected[:5])
    _tree_allclose(converted, tf_tree)


def test_net2net_full_assembly(pipe_params):
    pipe, params = pipe_params
    state = {}
    for path, val in _flatten(jax.tree_util.tree_map(
            np.asarray, params["first_stage"]["params"])):
        key, f = _stage1_torch_key(list(path))
        state[f"first_stage_model.{key}"] = f(val)
    for path, val in _flatten(jax.tree_util.tree_map(
            np.asarray, params["cond_stage"]["params"])):
        key, f = _stage1_torch_key(list(path))
        state[f"cond_stage_model.{key}"] = f(val)
    for path, val in _flatten(jax.tree_util.tree_map(
            np.asarray, params["maskgit"]["params"]["transformer"])):
        key, f = _muse_torch_key(list(path))
        state[f"maskgit.transformer.{key}"] = f(val)
        state[f"maskgit.token_critic.net.{key}"] = f(val)  # alias, ignored
    critic = params["maskgit"]["params"]["critic"]["to_pred"]
    state["maskgit.token_critic.to_pred.weight"] = np.asarray(critic["kernel"]).T
    state["maskgit.token_critic.to_pred.bias"] = np.asarray(critic["bias"])
    # Lightning/deepspeed prefix quirk
    state = {f"_forward_module.{k}": v for k, v in state.items()}

    converted = ckpt.convert_net2net(state)
    for part in ("first_stage", "cond_stage", "maskgit"):
        missing, unexpected = ckpt.verify_tree_match(
            converted[part]["params"], params[part]["params"])
        assert not missing and not unexpected, (part, missing[:5],
                                                unexpected[:5])
    # converted params must actually run
    out = pipe.maskgit.apply(
        jax.tree_util.tree_map(jnp.asarray, converted["maskgit"]),
        *(lambda cfg: ())(None) if False else (
            jnp.zeros((1, pipe.config.transformer.num_cams,
                       pipe.config.transformer.num_cam_tokens), jnp.int32),
            jnp.zeros((1, pipe.config.transformer.num_cond_tokens), jnp.int32),
            jnp.broadcast_to(jnp.eye(3), (1, 3, 3, 3)),
            jnp.broadcast_to(jnp.eye(4), (1, 3, 4, 4))))
    assert np.isfinite(np.asarray(out.logits)).all()


def test_orbax_save_restore(tmp_path, pipe_params):
    pipe, params = pipe_params
    tree = jax.tree_util.tree_map(np.asarray,
                                  params["maskgit"]["params"]["transformer"])
    path = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(path, tree)
    back = ckpt.restore_checkpoint(path)
    _tree_allclose(back, tree)


# ---------------------------------------------------------------------------
# load_weights routing (training/checkpoints.py): a torch checkpoint
# must reach the converter for its family — the AR Net2Net layout
# stores the GPT at top-level `transformer.` (reference
# cond_transformer_multi_view.py:30), NOT under `maskgit.`
# ---------------------------------------------------------------------------

def test_load_weights_routes_by_checkpoint_family(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    from bevgen_tpu.training.checkpoints import load_weights

    def save(name, keys):
        p = tmp_path / name
        torch.save({"state_dict": {k: torch.zeros(2, 2) for k in keys}},
                   str(p))
        return str(p)

    ar = save("ar.ckpt", ["transformer.x_pos_emb",
                          "_forward_module.transformer.cond_pos_emb"])
    out = load_weights(ar, example_params={})
    assert set(out) == {"first_stage", "cond_stage", "gpt"}
    assert "x_pos_emb" in out["gpt"]["params"]
    assert "cond_pos_emb" in out["gpt"]["params"]

    muse = save("muse.ckpt", ["maskgit.transformer.pos_emb"])
    out = load_weights(muse, example_params={})
    assert set(out) == {"first_stage", "cond_stage", "maskgit"}

    s1 = save("stage1.ckpt", ["quantize.embedding.weight"])
    out = load_weights(s1, example_params={})
    assert set(out) == {"params"} and "codebook" in out["params"]

    bogus = save("bogus.ckpt", ["who.knows"])
    with pytest.raises(ValueError, match="unrecognized"):
        load_weights(bogus, example_params={})


def test_self_cond_detection_handles_frozen_trees():
    """_tree_has_key must see through Mapping types (flax FrozenDict),
    not only plain dicts — dropping self_cond_to_init_embed on a frozen
    example tree would silently strip checkpoint params."""
    import flax.core
    from bevgen_tpu.training.checkpoints import _tree_has_key

    tree = flax.core.freeze(
        {"params": {"transformer": {"self_cond_to_init_embed": {"w": 1}}}})
    assert _tree_has_key(tree, "self_cond_to_init_embed")
    assert not _tree_has_key(tree, "absent_key")


def test_bare_stage1_ckpt_grafts_into_pipeline_tree(tmp_path):
    """A bare stage-1 torch checkpoint loaded against a PIPELINE-shaped
    example tree must graft into its first_stage slot (not replace the
    whole tree — the callers' next encode would KeyError)."""
    torch = pytest.importorskip("torch")
    from bevgen_tpu.training.checkpoints import load_weights

    p = tmp_path / "vq.ckpt"
    torch.save({"state_dict": {
        "_forward_module.quantize.embedding.weight": torch.zeros(8, 4)}},
        str(p))
    example = {"first_stage": {"params": {"old": 1}},
               "cond_stage": {"params": {"keep": 2}},
               "maskgit": {"params": {}}}
    out = load_weights(str(p), example)
    assert set(out) == {"first_stage", "cond_stage", "maskgit"}
    assert "codebook" in out["first_stage"]["params"]
    assert out["cond_stage"]["params"]["keep"] == 2
