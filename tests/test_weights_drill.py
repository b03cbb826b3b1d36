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
