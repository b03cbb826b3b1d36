"""The gated-weights drill (scripts/weights_drill.py) must stay green:
every converter chain (LPIPS VGG, FID Inception, LoFTR, CLIP vocab, the
three published checkpoints) runs end-to-end on synthetic artifacts in
the exact real-file layouts, so first contact with the real weights is
mechanical (VERDICT r3 item 9; reference README.md:53-56)."""
import pytest

pytestmark = pytest.mark.slow


def test_weights_drill_all_chains_green(tmp_path):
    from bevgen_tpu.scripts import weights_drill
    assert weights_drill.main(["--tmp", str(tmp_path)]) == 0


REF_VGG_PTH = ("/root/reference/multi_view_generation/modules/losses/"
               "lpips/vgg.pth")


@pytest.mark.skipif(not __import__("os").path.exists(REF_VGG_PTH),
                    reason="reference checkout not mounted")
def test_real_lpips_lin_weights_flow_through_converter(tmp_path):
    """The ONE gated weight artifact that ships inside the reference
    checkout (modules/losses/lpips/vgg.pth — the taming LPIPS linear
    heads, utils/taming_utils.py:168's download target) runs through
    the REAL converter chain: first contact with a real file for the
    otherwise egress-gated weights programme. The VGG16 backbone half
    stays synthetic (torchvision is not in-image)."""
    import torch
    import numpy as np
    from bevgen_tpu.models.lpips import (LPIPS, convert_lpips_weights,
                                         load_lpips_params)
    from bevgen_tpu.scripts.weights_drill import (_VGG16_CONV_IDX,
                                                  _VGG16_CHANNELS)

    rng = np.random.default_rng(0)
    vgg_sd, cin = {}, 3
    for i, cout in zip(_VGG16_CONV_IDX, _VGG16_CHANNELS):
        vgg_sd[f"features.{i}.weight"] = torch.tensor(
            (0.05 * rng.standard_normal((cout, cin, 3, 3))).astype(
                np.float32))
        vgg_sd[f"features.{i}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32) * 0.05)
        cin = cout
    vgg_pth = tmp_path / "vgg16.pth"
    torch.save(vgg_sd, vgg_pth)

    out_npz = tmp_path / "lpips_real_lins.npz"
    convert_lpips_weights(str(vgg_pth), REF_VGG_PTH, str(out_npz))
    params = load_lpips_params(str(out_npz))

    # converted lin kernels match the REAL file's values exactly
    real = torch.load(REF_VGG_PTH, map_location="cpu", weights_only=False)
    for i in range(5):
        want = real[f"lin{i}.model.1.weight"].numpy()       # (1, C, 1, 1)
        got = np.asarray(params["params"][f"lin_{i}"]["kernel"])
        np.testing.assert_array_equal(got, np.transpose(want, (2, 3, 1, 0)))

    x = np.asarray(rng.standard_normal((1, 64, 64, 3)), np.float32)
    y = np.asarray(rng.standard_normal((1, 64, 64, 3)), np.float32)
    d = np.asarray(LPIPS().apply(params, x, y))
    assert np.isfinite(d).all() and (d >= 0).all()
