"""make_figures CLI over a synthetic output tree (reference
figure_generator.py / gen_video.py equivalents)."""
import numpy as np
import pytest
from PIL import Image

from bevgen_tpu.scripts import make_figures


@pytest.fixture()
def output_tree(tmp_path):
    rng = np.random.default_rng(0)
    for tok in ("scene_a", "scene_b"):
        for root in ("sample", "sample_gt"):
            d = tmp_path / root / tok
            d.mkdir(parents=True)
            for cam in ("cam0", "cam1"):
                Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                             np.uint8)).save(d / f"{cam}.jpg")
            np.savez_compressed(d / "bev.npz",
                                rng.uniform(0, 1, (16, 16, 7)))
    return tmp_path


def test_figures_mode(output_tree):
    make_figures.main([f"dir={output_tree}", "mode=figures"])
    outs = list((output_tree / "figures_out").glob("*.jpg")) + \
        list((output_tree / "figures_out").glob("*.png"))
    assert len(outs) >= 2


def test_site_mode(output_tree):
    make_figures.main([f"dir={output_tree}", "mode=site"])
    html = list((output_tree / "figures_out").glob("*.html"))
    assert html, "comparison site not written"
    text = html[0].read_text()
    assert "scene_a" in text and "scene_b" in text


def test_video_mode(output_tree):
    make_figures.main([f"dir={output_tree}", "mode=video", "fps=2"])
    vids = (list((output_tree / "figures_out").glob("*.mp4")) +
            list((output_tree / "figures_out").glob("*.gif")))
    assert vids, "video/gif not written"
