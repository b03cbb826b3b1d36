"""pseudo_seg CLI (reference scripts/cityscapes_gen.py equivalent)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from PIL import Image

from bevgen_tpu.scripts import pseudo_seg


class TinySeg(torch.nn.Module):
    def __init__(self, n_classes=5):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, n_classes, 1)

    def forward(self, x):
        return self.conv(x)


def test_pseudo_seg_writes_npz_mirror(tmp_path):
    root = tmp_path / "images"
    for name in ("log_a/CAM_FRONT/1.jpg", "log_a/CAM_BACK/2.jpg",
                 "log_b/CAM_FRONT/3.jpg"):
        p = root / name
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (64, 96, 3),
                                              np.uint8)).save(p)

    model_path = tmp_path / "seg.pt"
    torch.jit.script(TinySeg()).save(str(model_path))

    save_dir = tmp_path / "out"
    pseudo_seg.main([f"image_root={root}", f"save_dir={save_dir}",
                     f"model_path={model_path}", "size=48,24",
                     "batch_size=2"])

    outs = sorted(save_dir.rglob("*.npz"))
    assert len(outs) == 3
    pred = np.load(outs[0])["pred"]
    assert pred.shape == (24, 48) and pred.dtype == np.uint8
    assert pred.max() < 5


def test_pseudo_seg_sharding(tmp_path):
    root = tmp_path / "images"
    for i in range(4):
        p = root / f"log/cam/{i}.jpg"
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    model_path = tmp_path / "seg.pt"
    torch.jit.script(TinySeg()).save(str(model_path))
    save_dir = tmp_path / "out"
    pseudo_seg.main([f"image_root={root}", f"save_dir={save_dir}",
                     f"model_path={model_path}", "size=8,8",
                     "shard=1", "num_shards=2"])
    assert len(list(save_dir.rglob("*.npz"))) == 2


def test_pseudo_seg_requires_model(tmp_path):
    with pytest.raises(SystemExit, match="model_path"):
        pseudo_seg.main([f"image_root={tmp_path}", f"save_dir={tmp_path}"])
