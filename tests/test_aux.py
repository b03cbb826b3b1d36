"""Tests for auxiliary subsystems: nuScenes raster core, logging,
conditioning providers, curation, per-camera FID."""
import json
from pathlib import Path

import numpy as np
import pytest

from bevgen_tpu.data import nuscenes_raster as nr


def test_global_to_bev_center():
    pose_inv = np.eye(4)   # ego at origin
    px = nr.global_to_bev(np.array([[0.0, 0.0, 0.0]]), pose_inv)
    np.testing.assert_array_equal(px[0], [128, 128])
    # 10m ahead (+x) -> row decreases (ego points up): view maps x->-row
    px = nr.global_to_bev(np.array([[10.0, 0.0, 0.0]]), pose_inv)
    assert px[0][1] < 128 and px[0][0] == 128


def test_static_and_line_layers():
    pose_inv = np.eye(4)
    # reference CLASSES static layers = (lane, road_segment)
    # (nuscenes_helper.py:16-30)
    polys = {"lane": [np.array(
        [[-20, -20, 0], [-20, 20, 0], [20, 20, 0], [20, -20, 0]],
        np.float64)]}
    static = nr.get_static_layers(polys, pose_inv)
    assert static.shape == (256, 256, 2)
    assert static[..., 0].sum() > 1000
    assert static[..., 1].sum() == 0
    lines = nr.get_line_layers(
        {"lane_divider": [np.array([[0, -5, 0], [20, -5, 0]])]}, pose_inv)
    assert lines.shape == (256, 256, 2)
    assert lines[..., 1].sum() > 0


def test_dynamic_layers_and_objects():
    pose_inv = np.eye(4)
    quad = nr.box_bottom_corners([10, 0, 0], (2.0, 4.5, 1.6), yaw=0.0)
    assert quad.shape == (4, 3)
    layers = nr.get_dynamic_layers({"car": [quad]}, pose_inv)
    assert layers[..., 0].sum() > 0
    obj = nr.get_dynamic_objects([quad], pose_inv)
    assert obj.shape == (256, 256, 8)
    seg = obj[..., 0]
    assert seg.sum() > 0
    # center score peaks inside the box
    assert obj[..., 1].max() > 0.5


def test_parse_pose_inverse():
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    t = np.array([1.0, 2.0, 3.0])
    M = nr.parse_pose(t, R)
    Mi = nr.parse_pose(t, R, inv=True)
    np.testing.assert_allclose(M @ Mi, np.eye(4), atol=1e-12)


def test_metrics_logger_jsonl(tmp_path):
    from bevgen_tpu.utils.logging import MetricsLogger
    lg = MetricsLogger(tmp_path, use_wandb=False, config={"a": 1})
    lg.log(1, {"loss": 0.5})
    lg.log(2, {"loss": 0.25})
    lg.log_image("grid", np.zeros((4, 4, 3), np.uint8), step=1)
    lg.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["loss"] == 0.5
    assert (tmp_path / "images" / "grid_000001.png").exists()
    assert json.loads((tmp_path / "config.json").read_text()) == {"a": 1}


def test_save_mask_plots(tmp_path):
    from bevgen_tpu.core.config import MultiViewConfig
    from bevgen_tpu.utils.logging import save_mask_plots
    cfg = MultiViewConfig(num_layers=1, num_heads=2, num_embed=32,
                          hidden_size=32, vocab_size=16, cond_vocab_size=16,
                          num_cams=3, cam_names="ARGOVERSE_FRONT_CAMERAS",
                          dataset="argoverse", cam_latent_res=(4, 4),
                          bev_latent_res=(4, 4), sparse_block_size=8,
                          density=0.5, window_len=4)
    out = save_mask_plots(cfg, tmp_path / "plots")
    names = {p.name for p in out.iterdir()}
    assert {"camera_bias_prob_matrix.png", "allowed_pattern.png",
            "static_layout.png"} <= names


def test_conditioning_providers():
    from bevgen_tpu.models.conditioning import Labelator, SOSProvider
    import jax.numpy as jnp
    lab = Labelator(10)
    c, _, idx = lab.encode(jnp.asarray([3, 7]))
    assert c.shape == (2, 1) and int(c[0, 0]) == 3
    sos = SOSProvider(sos_token=5)
    c, _, _ = sos.encode(jnp.zeros((4, 8)))
    assert c.shape == (4, 1) and int(c[1, 0]) == 5


def test_curate_interesting_and_filter(tmp_path):
    import cv2
    from bevgen_tpu.data.rasterize import save_bev_raster
    from bevgen_tpu.scripts import curate

    bev_dir = tmp_path / "bev" / "log1"
    bev_dir.mkdir(parents=True)
    busy = np.zeros((256, 256, 7), np.float32)
    busy[100:130, 100:130, 0] = 1
    busy[50:60, 50:60, 2] = 1
    empty = np.zeros((256, 256, 7), np.float32)
    save_bev_raster(bev_dir / "111.npz", busy)
    save_bev_raster(bev_dir / "222.npz", empty)
    scores = curate.interesting_scores(tmp_path / "bev")
    assert scores[0][0] == "log1_111"

    # filter: two samples, one where gen==gt (good), one noise (bad)
    rng = np.random.default_rng(0)
    root = tmp_path / "out"
    for tok, noise in (("good", 0.0), ("bad", 1.0)):
        for sub in ("sample", "sample_gt"):
            (root / sub / tok).mkdir(parents=True)
        base = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        noisy = np.clip(base + noise * rng.normal(0, 120, base.shape),
                        0, 255).astype(np.uint8)
        cv2.imwrite(str(root / "sample" / tok / "cam.jpg"), noisy)
        cv2.imwrite(str(root / "sample_gt" / tok / "cam.jpg"), base)
    kept, removed = curate.filter_outputs(root, keep_frac=0.5)
    assert kept == 1 and removed == 1
    assert (root / "sample" / "good").exists()
    assert not (root / "sample" / "bad").exists()


def test_bbox_token_weights():
    import jax.numpy as jnp
    from bevgen_tpu.core.config import MultiViewConfig
    from bevgen_tpu.models.stage2.ar import bbox_token_weights
    cfg = MultiViewConfig(num_layers=1, num_heads=2, num_embed=32,
                          hidden_size=32, vocab_size=16, cond_vocab_size=16,
                          num_cams=3, cam_names="ARGOVERSE_FRONT_CAMERAS",
                          dataset="argoverse", cam_res=(32, 32),
                          cam_latent_res=(4, 4), bev_latent_res=(4, 4))
    # one box covering the top-left quadrant of camera 0
    bb = np.zeros((1, 3, 1, 4), np.float32)
    bb[0, 0, 0] = [0, 0, 16, 16]
    w = np.asarray(bbox_token_weights(cfg, jnp.asarray(bb), weight=4.0))
    assert w.shape == (1, 3 * 16)
    grid = w[0, :16].reshape(4, 4)
    np.testing.assert_allclose(grid[:2, :2], 5.0)   # inside
    np.testing.assert_allclose(grid[2:, 2:], 1.0)   # outside
    np.testing.assert_allclose(w[0, 16:], 1.0)      # other cameras


def test_tokenizer_bpe_mechanics(tmp_path):
    """Exercise the BPE machinery with a miniature merges vocab."""
    import gzip
    from bevgen_tpu.utils.tokenizer import SimpleTokenizer
    merges = "#version\nh e</w>\nl l\nhe llo</w>\n"
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write(merges)
    tok = SimpleTokenizer(str(path))
    ids = tok.encode("hello hello")
    assert len(ids) > 0
    back = tok.decode(ids)
    assert "hello" in back


def test_yaml_config_loading():
    from bevgen_tpu.scripts.cli import build_config, load_yaml_config
    cfg = load_yaml_config("bevgen_tpu/configs/argoverse_muse.yaml")
    assert cfg.transformer.num_layers == 14
    assert cfg.transformer.cam_res == (256, 256)
    assert cfg.batch_size == 16
    cfg2, left = build_config({
        "config": "bevgen_tpu/configs/nuscenes_ar.yaml",
        "transformer.num_layers": "4", "extra": "x"})
    assert cfg2.transformer.num_layers == 4
    assert cfg2.transformer.num_cams == 6
    assert left == {"extra": "x"}


def test_cli_parse_and_preset_errors():
    from bevgen_tpu.scripts.cli import build_config, parse_argv
    args = parse_argv(["preset=tiny_test", "muse.sample_iterations=5"])
    cfg, left = build_config(args)
    assert cfg.muse.sample_iterations == 5 and not left
    with pytest.raises(SystemExit):
        build_config({"preset": "nope"})
    with pytest.raises(SystemExit):
        parse_argv(["notkeyvalue"])


def test_cli_modes_composition():
    """hydra-style list composition: 'modes=[argoverse,generate]'
    (reference generate.py:75, configs/modes/*.yaml) layers mode deltas
    onto the preset, injects script-arg defaults only where the user
    didn't pass the key, and explicit key=value overrides win."""
    from bevgen_tpu.scripts.cli import build_config
    # nuscenes preset + argoverse mode -> the mode's camera rig wins
    cfg, left = build_config({"preset": "nuscenes_ar",
                              "modes": "[argoverse,generate]"})
    assert cfg.transformer.dataset == "argoverse"
    assert cfg.transformer.cam_names == "ARGOVERSE_FRONT_CAMERAS"
    assert cfg.transformer.num_cams == 3
    # generate mode injected the test-split default as a script arg
    assert left == {"datamodule.split": "test"}
    # explicit overrides beat modes (hydra precedence)
    cfg2, left2 = build_config({"preset": "nuscenes_ar",
                                "modes": "argoverse,generate",
                                "transformer.num_cams": "1",
                                "transformer.cam_names": "NUSCENES_FRONT",
                                "datamodule.split": "val"})
    assert cfg2.transformer.num_cams == 1
    assert cfg2.transformer.dataset == "argoverse"  # mode delta kept
    assert left2 == {"datamodule.split": "val"}
    with pytest.raises(SystemExit):
        build_config({"preset": "tiny_test", "modes": "[nope]"})


def test_curate_different_mode(tmp_path):
    from bevgen_tpu.data.rasterize import save_bev_raster
    from bevgen_tpu.scripts import curate
    d = tmp_path / "bev" / "log1"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    # two identical rasters + one very different
    a = np.zeros((256, 256, 7), np.float32); a[:64, :64, 0] = 1
    c = np.zeros((256, 256, 7), np.float32); c[128:, 128:, 4] = 1
    save_bev_raster(d / "1.npz", a)
    save_bev_raster(d / "2.npz", a)
    save_bev_raster(d / "3.npz", c)
    toks = curate.different_scores(tmp_path / "bev", top=2)
    assert len(toks) == 2
    assert "log1_3" in toks  # the dissimilar raster must be selected


def test_distributed_helpers_single_host():
    """Multi-host plumbing degrades to no-ops on one host
    (parallel/distributed.py; reference rank_zero_only semantics)."""
    from bevgen_tpu.parallel import distributed as dist

    assert dist.process_index() == 0
    assert dist.is_main_process()

    calls = []

    @dist.rank_zero
    def log(x):
        calls.append(x)
        return x

    assert log(3) == 3 and calls == [3]

    # initialize is a no-op below 2 processes
    dist.initialize(num_processes=1)

    s = dist.host_shard_indices(10)
    assert (s.start, s.stop) == (0, 10)


def test_host_shard_indices_partition():
    """Every host gets an EQUAL-size slice (remainder dropped) so the
    per-host input pipelines stay in SPMD lockstep; slices tile a
    prefix of [0, n) without gaps."""
    import bevgen_tpu.parallel.distributed as dist
    import jax

    orig_idx, orig_cnt = jax.process_index, jax.process_count
    try:
        jax.process_count = lambda: 3
        covered, sizes = [], []
        for p in range(3):
            jax.process_index = lambda p=p: p
            s = dist.host_shard_indices(10)
            covered.extend(range(s.start, s.stop))
            sizes.append(s.stop - s.start)
        assert sizes == [3, 3, 3]          # equal shards, remainder dropped
        assert covered == list(range(9))   # contiguous prefix, no overlap
    finally:
        jax.process_index, jax.process_count = orig_idx, orig_cnt


@pytest.mark.slow
def test_edit_scene_cli(tmp_path):
    """Headless scene editing end-to-end: edits -> raster -> generate ->
    output tree (reference interactive_editing.py equivalent)."""
    from bevgen_tpu.scripts import edit_scene

    edits = ('[{"op":"add","category":"REGULAR_VEHICLE","x":10,"y":0,'
             '"yaw":0.3,"length":4.5,"width":2.0}]')
    edit_scene.main(["preset=tiny_test", f"out_dir={tmp_path}",
                     f"edits={edits}", "muse.sample_iterations=2"])
    assert (tmp_path / "sample" / "edited").exists()
    jpgs = list((tmp_path / "sample" / "edited").glob("*.jpg"))
    assert len(jpgs) == 3  # tiny_test has 3 cameras


@pytest.mark.slow
def test_edit_server_end_to_end():
    """Interactive editing web UI (stdlib HTTP replacement for the
    reference gradio demo, interactive_editing.py:297): serve, fetch the
    page + annotations, POST an edited cuboid table, decode the images."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    from bevgen_tpu.core.config import tiny_test_config, apply_overrides
    from bevgen_tpu.scripts import edit_server

    cfg = apply_overrides(tiny_test_config(),
                          {"muse.sample_iterations": 2})
    session = edit_server.EditSession(cfg)
    srv = edit_server.make_server(session, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "scene editor" in page and "/api/generate" in page

        anns = json.loads(urllib.request.urlopen(
            f"{base}/api/annotations").read())
        assert anns and {"category", "x", "y"} <= set(anns[0])

        rows = anns + [{"category": "PEDESTRIAN", "x": 6, "y": 2,
                        "yaw": 0, "length": 0.8, "width": 0.8}]
        req = urllib.request.Request(
            f"{base}/api/generate",
            data=json.dumps({"cuboids": rows, "seed": 1}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req).read())
        assert out["bev"].startswith("data:image/png;base64,")
        assert len(out["cameras"]) == 3  # tiny_test cameras
        from PIL import Image
        png = base64.b64decode(out["bev"].split(",", 1)[1])
        bev = Image.open(io.BytesIO(png))
        assert bev.size == (cfg.cond_stage.resolution,) * 2

        # malformed request surfaces a JSON error, not a dead socket
        bad = urllib.request.Request(
            f"{base}/api/generate", data=b"{not json",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "error" in json.loads(e.read())
    finally:
        srv.shutdown()


def test_clip_tokenizer_with_synthetic_vocab(tmp_path):
    """SimpleTokenizer encode/decode on a synthetic merges file (same
    format as CLIP's bpe_simple_vocab_16e6.txt.gz): merge application
    order follows bpe_ranks, decode round-trips (utils/tokenizer.py:51)."""
    import gzip
    from bevgen_tpu.utils.tokenizer import SimpleTokenizer, bytes_to_unicode

    merges = ["#version: synthetic",
              "h e", "l l", "he ll", "o</w> o</w>", "hell o</w>"]
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(merges) + "\n")

    tok = SimpleTokenizer(str(path))
    # "hello" -> h+e, l+l, he+ll, hell+o</w> fully merges into one token
    ids = tok.encode("Hello")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "hello</w>"
    assert tok.decode(ids).strip() == "hello"

    # unmerged word falls back to byte tokens ending with </w>
    ids2 = tok.encode("xy")
    assert len(ids2) == 2
    assert tok.decode(ids2).strip() == "xy"

    # multi-word + punctuation through the CLIP regex
    ids3 = tok.encode("hello, hello")
    assert tok.decode(ids3).strip() == "hello , hello"

    # byte encoder covers all 256 bytes bijectively
    b2u = bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256

    missing = tmp_path / "nope.gz"
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        SimpleTokenizer(str(missing))


def test_print_config_tree_renders():
    """Startup config tree (reference rich_utils.print_config_tree)."""
    import io
    from rich.console import Console
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.scripts.cli import print_config_tree

    buf = io.StringIO()
    print_config_tree(tiny_test_config(), extra={"ckpt_path": None},
                      console=Console(file=buf, width=100))
    out = buf.getvalue()
    for key in ("transformer", "first_stage", "num_layers", "ckpt_path"):
        assert key in out, f"{key} missing from config tree"


def test_overrides_coerce_none_defaulted_fields():
    """Optional fields default to None; CLI strings must still coerce
    by annotation (batch_size=1 stays an INT and is honored, not
    replaced by script defaults)."""
    from bevgen_tpu.core.config import apply_overrides, tiny_test_config

    cfg = tiny_test_config()
    assert cfg.batch_size is None  # the "unset" sentinel
    out = apply_overrides(cfg, {"batch_size": "1"})
    assert out.batch_size == 1 and isinstance(out.batch_size, int)
    assert (out.batch_size or 8) == 1        # script default NOT applied
    out = apply_overrides(cfg, {"batch_size": "16"})
    assert out.batch_size == 16
