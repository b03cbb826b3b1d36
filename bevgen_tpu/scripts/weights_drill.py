"""One-command drill for every egress-gated weight artifact.

Zero egress means the published weights (LPIPS VGG, FID Inception,
LoFTR outdoor, the CLIP BPE vocab, and the three BEVGen checkpoints —
reference README.md:53-56) have never flowed through the converters on
a real file. This drill makes first contact mechanical: for each
artifact it

  1. SYNTHESIZES a torch-side file with the exact key layout the real
     artifact ships (saved with torch.save / gzip, like the real one),
  2. runs the REAL converter chain end-to-end (file -> npz/tree),
  3. loads the result into the consuming flax model and runs a
     forward pass / round-trip equality check,
  4. prints the exact command to run when the real file exists.

Run:  python -m bevgen_tpu.scripts.weights_drill [--tmp DIR]
Exit code 0 = every chain green. Covered by tests/test_weights_drill.py.

Reference anchors: utils/taming_utils.py:168 (`get_ckpt_path` download
of vgg.pth), scripts/metrics_consistency_sift.py:14 (LoFTR weights),
utils/tokenizer.py (CLIP vocab), README.md:53-56 (checkpoints).
"""
from __future__ import annotations

import argparse
import gzip
import sys
import tempfile
from pathlib import Path

import numpy as np

# torchvision vgg16 `features` conv indices and the per-stage conv
# counts (models/lpips.py _VGG_SLICES)
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG16_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512,
                   512, 512, 512]
_LPIPS_LIN_CH = [64, 128, 256, 512, 512]


def _ok(name: str, cmd: str):
    print(f"[drill] {name}: PASS")
    print(f"        real artifact: {cmd}")


def drill_lpips(tmp: Path) -> None:
    import torch
    from bevgen_tpu.models.lpips import (LPIPS, convert_lpips_weights,
                                         load_lpips_params)

    rng = np.random.default_rng(0)
    vgg_sd, cin = {}, 3
    for i, cout in zip(_VGG16_CONV_IDX, _VGG16_CHANNELS):
        vgg_sd[f"features.{i}.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32))
        vgg_sd[f"features.{i}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32))
        cin = cout
    lin_sd = {f"lin{i}.model.1.weight": torch.tensor(
        np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32))
        for i, c in enumerate(_LPIPS_LIN_CH)}
    vgg_pth, lin_pth = tmp / "vgg16.pth", tmp / "vgg.pth"
    torch.save(vgg_sd, vgg_pth)
    torch.save(lin_sd, lin_pth)

    out_npz = tmp / "lpips.npz"
    convert_lpips_weights(str(vgg_pth), str(lin_pth), str(out_npz))
    params = load_lpips_params(str(out_npz))
    assert params is not None
    x = np.asarray(rng.standard_normal((1, 64, 64, 3)), np.float32)
    y = np.asarray(rng.standard_normal((1, 64, 64, 3)), np.float32)
    d = np.asarray(LPIPS().apply(params, x, y))
    assert np.isfinite(d).all() and d.shape == (1,), d
    _ok("LPIPS (torchvision vgg16 + taming vgg.pth lins)",
        "python -c \"from bevgen_tpu.models.lpips import "
        "convert_lpips_weights; convert_lpips_weights("
        "'vgg16-397923af.pth', 'vgg.pth', 'lpips.npz')\"")


def drill_inception(tmp: Path) -> None:
    import jax
    import torch
    from bevgen_tpu.metrics.inception import (InceptionV3,
                                              convert_inception_weights)
    from bevgen_tpu.core.checkpoint import load_npz_tree

    # invert the converter's mapping from OUR freshly-initialized tree:
    # flax path a/b/conv/kernel <-> torch 'a.b.conv.weight' (OIHW) etc.
    model = InceptionV3()
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 75, 75, 3), np.float32))

    def walk(tree, prefix):
        for k, v in tree.items():
            p = prefix + [k]
            if isinstance(v, dict):
                yield from walk(v, p)
            else:
                yield p, np.asarray(v)

    sd = {}
    rng = np.random.default_rng(1)
    for path, leaf in walk(params["params"], []):
        mod = ".".join(path[:-1])
        leafname = path[-1]
        # small weights: N(0,1) kernels explode to inf through ~90
        # stacked convs — the drill checks plumbing, not statistics
        val = (0.05 * rng.standard_normal(leaf.shape)).astype(np.float32)
        if leafname == "kernel":          # <mod>/conv/kernel HWIO
            sd[f"{mod}.weight"] = torch.tensor(
                np.transpose(val, (3, 2, 0, 1)))
        elif leafname.startswith("bn_"):
            torch_name = {"bn_scale": "weight", "bn_bias": "bias",
                          "bn_mean": "running_mean",
                          "bn_var": "running_var"}[leafname]
            base = ".".join(path[:-1])
            sd[f"{base}.bn.{torch_name}"] = torch.tensor(np.abs(val) + 0.1
                                                         if "var" in leafname
                                                         else val)
        else:
            raise AssertionError(f"unexpected leaf {path}")
    # the real file carries an unused classifier head; the converter
    # must skip it
    sd["fc.weight"] = torch.tensor(np.zeros((1008, 2048), np.float32))
    sd["fc.bias"] = torch.tensor(np.zeros((1008,), np.float32))
    pth = tmp / "pt_inception.pth"
    torch.save(sd, pth)

    out_npz = tmp / "inception.npz"
    n = convert_inception_weights(str(pth), str(out_npz))
    assert n > 0
    loaded = load_npz_tree(str(out_npz))
    feats = model.apply(loaded, np.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 96, 96, 3)), np.float32))
    assert np.isfinite(np.asarray(feats)).all() and feats.shape == (1, 2048)
    _ok("FID InceptionV3 (pytorch-fid pt_inception-2015-12-05)",
        "python -c \"from bevgen_tpu.metrics.inception import "
        "convert_inception_weights; convert_inception_weights("
        "'pt_inception-2015-12-05-6726825d.pth', 'inception.npz')\"")


def drill_loftr(tmp: Path) -> None:
    import torch
    from bevgen_tpu.metrics import loftr

    ref = loftr.init_random_params(np.random.default_rng(3))
    sd = {}
    for k, v in ref.items():
        a = np.asarray(v, np.float32)
        if a.ndim == 4:                       # HWIO -> OIHW
            a = a.transpose(3, 2, 0, 1)
        elif a.ndim == 2 and k.endswith(".weight"):
            a = a.T                           # (I,O) -> (O,I)
        sd["matcher." + k] = torch.tensor(a)  # kornia wraps in matcher.
    sd["matcher.backbone.layer1.0.bn1.num_batches_tracked"] = \
        torch.tensor(0)                       # converter must drop these
    ckpt = tmp / "loftr_outdoor.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    out_npz = tmp / "loftr.npz"
    loftr.convert_loftr_weights(str(ckpt), str(out_npz), self_check=False)
    back = dict(np.load(str(out_npz)))
    for k, v in ref.items():
        np.testing.assert_allclose(back[k], v, atol=1e-6, err_msg=k)
    matcher = loftr.LoFTRMatcher.from_npz(str(out_npz))
    rng = np.random.default_rng(4)
    m = matcher(np.asarray(rng.uniform(0, 1, (64, 48)), np.float32),
                np.asarray(rng.uniform(0, 1, (64, 48)), np.float32))
    assert "confidence" in m
    _ok("LoFTR outdoor (kornia loftr_outdoor.ckpt)",
        "python -c \"from bevgen_tpu.metrics.loftr import "
        "convert_loftr_weights; convert_loftr_weights("
        "'loftr_outdoor.ckpt', 'loftr.npz')\"")


def drill_clip_vocab(tmp: Path) -> None:
    from bevgen_tpu.utils.tokenizer import SimpleTokenizer

    # a miniature merges file in the real gz format: header line + one
    # merge pair per line
    merges = ["#version: 0.2",
              "t h", "th e</w>", "h e", "he l", "hel l", "hell o</w>"]
    path = tmp / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(merges))
    tok = SimpleTokenizer(str(path))
    ids = tok.encode("hello the world")
    assert ids and all(isinstance(i, int) for i in ids)
    assert tok.decode(ids).replace(" ", "") == "hellotheworld"
    _ok("CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz)",
        "SimpleTokenizer('bpe_simple_vocab_16e6.txt.gz') — drop the "
        "file anywhere and pass its path")


def _tests_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "tests"


def drill_published_checkpoints(tmp: Path) -> None:
    """The three README.md:53-56 checkpoints through load_weights
    routing + full-tree conversion at tiny config, using the inverse
    key-mapping oracles maintained (and themselves converter-tested)
    in tests/test_checkpoint.py."""
    import torch
    import jax
    sys.path.insert(0, str(_tests_dir()))
    import test_checkpoint as oracle  # noqa: E402

    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.pipelines.generate import BEVGenPipeline
    from bevgen_tpu.training.checkpoints import load_weights

    pipe = BEVGenPipeline.create(tiny_test_config())
    params = pipe.init_params(jax.random.PRNGKey(0))

    # --- stage-1 (argoverse_rgb.ckpt / argoverse_bev.ckpt layout) ----
    for stage, label in (("first_stage", "argoverse_rgb.ckpt"),
                         ("cond_stage", "argoverse_bev.ckpt")):
        sd = {}
        for path, leaf in oracle._flatten(params[stage]["params"]):
            key, to_torch = oracle._stage1_torch_key(list(path))
            sd[key] = torch.tensor(to_torch(leaf))
        p = tmp / label
        torch.save({"state_dict": sd}, p)
        out = load_weights(str(p), params)
        got = out["first_stage"]["params"]
        oracle._tree_allclose(got, params[stage]["params"])
        _ok(f"stage-1 checkpoint ({label})",
            f"generate.py model.{stage}_ckpt={label} — or "
            f"load_weights('{label}', pipeline_params)")

    # --- stage-2 MUSE Net2Net (argoverse_stage_two.ckpt layout) ------
    sd = {}
    mg = params["maskgit"]["params"]
    for path, leaf in oracle._flatten(mg["transformer"]):
        key, to_torch = oracle._muse_torch_key(list(path))
        sd[f"maskgit.transformer.{key}"] = torch.tensor(
            np.ascontiguousarray(to_torch(np.asarray(leaf))))
    critic = mg["critic"]["to_pred"]
    sd["maskgit.token_critic.to_pred.weight"] = torch.tensor(
        np.ascontiguousarray(np.asarray(critic["kernel"]).T))
    sd["maskgit.token_critic.to_pred.bias"] = torch.tensor(
        np.asarray(critic["bias"]))
    for stage, prefix in (("first_stage", "first_stage_model."),
                          ("cond_stage", "cond_stage_model.")):
        for path, leaf in oracle._flatten(params[stage]["params"]):
            key, to_torch = oracle._stage1_torch_key(list(path))
            sd[prefix + key] = torch.tensor(
                np.ascontiguousarray(to_torch(np.asarray(leaf))))
    p = tmp / "argoverse_stage_two.ckpt"
    torch.save({"state_dict": sd}, p)
    out = load_weights(str(p), params)
    oracle._tree_allclose(out["maskgit"]["params"]["transformer"],
                          mg["transformer"])
    oracle._tree_allclose(out["maskgit"]["params"]["critic"],
                          mg["critic"])
    oracle._tree_allclose(out["first_stage"]["params"],
                          params["first_stage"]["params"])
    _ok("stage-2 Net2Net checkpoint (argoverse_stage_two.ckpt)",
        "python -m bevgen_tpu.scripts.generate preset=argoverse_muse "
        "ckpt=argoverse_stage_two.ckpt")


DRILLS = [drill_lpips, drill_inception, drill_loftr, drill_clip_vocab,
          drill_published_checkpoints]


def main(argv=None):
    # converter drill is a host-side tool: force the CPU backend BEFORE
    # any jax use (the axon TPU plugin ignores the JAX_PLATFORMS env
    # var, and a drill on the tunneled TPU would serialize behind real
    # jobs in the remote compile queue)
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tmp", default=None,
                    help="work dir (default: a fresh TemporaryDirectory)")
    args = ap.parse_args(argv)
    ctx = (tempfile.TemporaryDirectory() if args.tmp is None else None)
    tmp = Path(ctx.name if ctx else args.tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    failures = []
    for drill in DRILLS:
        try:
            drill(tmp)
        except Exception as e:  # noqa: BLE001 - drill reports and continues
            import traceback
            traceback.print_exc()
            failures.append(f"{drill.__name__}: {e}")
    if failures:
        print(f"[drill] FAILED: {failures}")
        return 1
    print(f"[drill] all {len(DRILLS)} converter chains green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
