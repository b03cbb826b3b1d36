"""End-to-end drives of the remaining CLI mains — generate,
tokenize_data, train_stage2, inference — at the tiny preset on CPU.

These run main() in-process with fake data, covering the argument
surface, the jit plumbing, and the output contracts that unit tests on
the pipeline API miss (e.g. the writer tree, token-shard round trip,
resume). Reference equivalents: generate.py, scripts/inference.py, and
the training entry points on the reference's training branch.
"""
import json
import os

import numpy as np
import pytest

# whole-module: each CLI run jits a full pipeline (14-60 s compiles
# on this host); the CLI arg-surface has cheap unit coverage in test_aux
pytestmark = pytest.mark.slow


def _tiny(extra):
    return ["preset=tiny_test", "muse.sample_iterations=2",
            "print_config=false"] + extra


def test_generate_cli_fake_data(tmp_path, capsys):
    from bevgen_tpu.scripts import generate

    out = tmp_path / "gen"
    generate.main(_tiny([f"eval_generate={out}", "fake=2", "batch_size=2",
                         "save_rec=true"]))
    printed = capsys.readouterr().out
    # one final JSON metrics line
    stats = json.loads(printed.strip().splitlines()[-1])
    assert stats["images"] == 6  # 2 scenes x 3 cams

    # reference-compatible output tree (utils/callback.py:72 layout)
    samples = sorted(os.listdir(out / "sample"))
    assert len(samples) == 2
    for tok in samples:
        names = set(os.listdir(out / "sample" / tok))
        assert {"bev.npz", "ring_front_center.jpg",
                "ring_front_left.jpg", "ring_front_right.jpg"} <= names
        gt_names = set(os.listdir(out / "sample_gt" / tok))
        assert "ring_front_center.jpg" in gt_names
    assert (out / "rec").exists() or (out / "sample_rec").exists()


def test_generate_cli_rand_str(tmp_path, capsys):
    """rand_str=true suffixes each sample token (reference README.md:95-97,
    utils/callback.py) so repeated runs into one dir don't collide; the
    mini_dataset/bev_dir_name dataset flags parse without error."""
    from bevgen_tpu.scripts import generate

    out = tmp_path / "gen"
    generate.main(_tiny([f"eval_generate={out}", "fake=1", "batch_size=1",
                         "rand_str=true", "mini_dataset=4",
                         "bev_dir_name=bev_seg_full_11_14"]))
    capsys.readouterr()
    (tok,) = os.listdir(out / "sample")
    base, _, suffix = tok.rpartition("_")
    assert base and len(suffix) == 5 and suffix.isalnum()


def test_generate_cli_partial_decode(tmp_path, capsys):
    """keep_cameras pins a camera's GT tokens (partial decoding,
    cond_transformer_multi_view_muse.py:125-132) through the CLI."""
    from bevgen_tpu.scripts import generate

    out = tmp_path / "gen"
    generate.main(_tiny([f"eval_generate={out}", "fake=1", "batch_size=1",
                         "keep_cameras=ring_front_center"]))
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["images"] == 3
    assert (out / "sample").is_dir()


def test_generate_cli_sharded_mesh(tmp_path, capsys):
    """dp/tp/dcn knobs serve through make_sharded_generate: the whole
    decode runs SPMD on a (dcn=2, dp=2) virtual mesh from the CLI."""
    from bevgen_tpu.scripts import generate

    out = tmp_path / "gen"
    generate.main(_tiny([f"eval_generate={out}", "fake=4", "batch_size=4",
                         "dp=2", "dcn=2"]))
    printed = capsys.readouterr().out
    assert "mesh: {'dcn': 2, 'dp': 2, 'tp': 1}" in printed
    stats = json.loads(printed.strip().splitlines()[-1])
    assert stats["images"] == 12  # 4 scenes x 3 cams
    assert len(os.listdir(out / "sample")) == 4


def test_generate_cli_mesh_rejects_partial_decode(tmp_path):
    from bevgen_tpu.scripts import generate

    with pytest.raises(SystemExit, match="keep_cameras"):
        generate.main(_tiny([f"eval_generate={tmp_path / 'g'}", "fake=2",
                             "batch_size=2", "dp=2",
                             "keep_cameras=ring_front_center"]))


def test_tokenize_train_generate_chain(tmp_path, capsys):
    """The idiomatic-TPU input pipeline end-to-end: tokenize fake data
    into shards, train stage-2 from the shards, checkpoints written."""
    from bevgen_tpu.scripts import tokenize_data, train_stage2

    shards = tmp_path / "tokens"
    tokenize_data.main(_tiny([f"out_dir={shards}", "fake=4",
                              "batch_size=2", "shard_size=4"]))
    files = sorted(shards.glob("shard_*.npz"))
    assert files, "tokenize_data produced no shards"
    part = dict(np.load(files[0], allow_pickle=False))
    assert part["tokens"].shape[-1] > 0 and "cond_ids" in part

    ckpts = tmp_path / "ckpts"
    train_stage2.main(_tiny([
        f"tokens_dir={shards}", "steps=2", "batch_size=2", "tp=1", "dp=1",
        f"ckpt_dir={ckpts}", "warmup_steps=1", "log_every=1"]))
    printed = capsys.readouterr().out
    assert "loss" in printed
    assert any(ckpts.iterdir()), "no checkpoint written"

    # resume path: a second run restores the saved params AND re-seeds
    # the EMA from the saved -EMA sibling (a resumed EMA must not stay
    # blended with the fresh random init)
    train_stage2.main(_tiny([
        f"tokens_dir={shards}", "steps=1", "batch_size=2", "tp=1", "dp=1",
        f"ckpt_dir={ckpts}", "warmup_steps=1", "log_every=1"]))
    resumed_out = capsys.readouterr().out
    assert "resumed params from" in resumed_out
    assert "resumed EMA from" in resumed_out


def test_inference_cli_forward_and_decode(capsys):
    from bevgen_tpu.scripts import inference

    inference.main(_tiny(["mode=forward", "batch_size=2", "reps=1"]))
    out = capsys.readouterr().out
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["mode"] == "forward" and stats["best_ms"] > 0

    inference.main(_tiny(["mode=decode", "batch_size=1", "reps=1"]))
    out = capsys.readouterr().out
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    assert json.loads(line)["mode"] == "decode"


def test_generate_cli_nuscenes_layout(tmp_path, capsys):
    """layout=nuscenes writes the flat gen/ gt/ rec/ trees keyed
    <token>_<cam>.jpg (reference callback.py save_raw_data's nuScenes
    format, consumed by metrics_eval.py's nuScenes mode)."""
    from bevgen_tpu.scripts import generate

    out = tmp_path / "gen"
    generate.main(_tiny([f"eval_generate={out}", "fake=1", "batch_size=1",
                         "layout=nuscenes", "save_rec=true"]))
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["images"] == 3
    for tree in ("gen", "gt", "rec"):
        files = os.listdir(out / tree)
        assert len(files) == 3, (tree, files)
        assert all(f.endswith(".jpg") and "_ring_" in f for f in files)


def test_generate_cli_ema_weights(tmp_path, capsys):
    """ema=true serves the -EMA weight tree (the reference swaps EMA
    weights in for val/test, modules/stage2/ema.py:94-146): generate
    loads step_*-EMA instead of the base checkpoint, verified by
    seeding the two trees with DIFFERENT values and checking the
    decoded outputs differ accordingly."""
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.pipelines.generate import BEVGenPipeline
    from bevgen_tpu.scripts import generate
    from bevgen_tpu.training.checkpoints import (CheckpointManager,
                                                 load_weights,
                                                 resolve_ema_path)

    cfg = tiny_test_config()
    pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
    base = pipe.init_params(jax.random.PRNGKey(0))
    ema = jax.tree_util.tree_map(lambda x: x * 0.5, base)

    ck = tmp_path / "ckpts"
    mgr = CheckpointManager(str(ck), interval_minutes=0, async_save=False)
    mgr.save_step(7, base, force=True)
    mgr.save_ema(7, ema)

    # resolve from run dir and from the concrete step dir
    assert resolve_ema_path(str(ck)).endswith("step_00000007-EMA")
    assert resolve_ema_path(
        str(ck / "step_00000007")).endswith("step_00000007-EMA")
    with pytest.raises(FileNotFoundError):
        resolve_ema_path(str(tmp_path / "nope"))

    loaded = load_weights(resolve_ema_path(str(ck)), base)
    a = jax.tree_util.tree_leaves(loaded)[0]
    b = jax.tree_util.tree_leaves(ema)[0]
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32))

    # the CLI path end-to-end
    out = tmp_path / "gen"
    generate.main(_tiny([f"eval_generate={out}", "fake=1", "batch_size=1",
                         f"ckpt_path={ck}", "ema=true"]))
    printed = capsys.readouterr().out
    assert "step_00000007-EMA" in printed

    with pytest.raises(SystemExit):
        generate.main(_tiny([f"eval_generate={out}2", "fake=1",
                             "batch_size=1", "ema=true"]))
