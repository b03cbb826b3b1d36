"""Execute the REAL reference code at /root/reference inside pytest.

The reference's heavyweight/unavailable dependencies (deepspeed,
pytorch_lightning, nuscenes devkit, av2, torchvision, ...) are replaced
with minimal sys.modules stubs so its *pure* modules — permuter.py,
mask_generator.py, mingpt_sparse.py, muse_maskgit_pytorch.py — import
and run unmodified with torch/einops/scipy (all present in-image).

This makes golden tests compare against the reference's own outputs
rather than transcriptions of them (VERDICT round 1, "Next round" #2).

The stubs only ever fill in modules that are NOT installed; nothing
real is shadowed.
"""
from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

REF_ROOT = Path("/root/reference")


def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []  # behave as a package (submodule stubs importable)
    for k, v in attrs.items():
        setattr(mod, k, v)
    mod.__stub__ = True  # marker so we never shadow a real package
    sys.modules[name] = mod
    return mod


def _missing(name: str) -> bool:
    if name in sys.modules:
        return getattr(sys.modules[name], "__stub__", False)
    return importlib.util.find_spec(name.split(".")[0]) is None


class _RaisingModule(types.ModuleType):
    """Module whose attributes exist but explode when *called* — catches
    accidental use of stubbed functionality instead of silently lying."""

    def __getattr__(self, item):
        if item.startswith("__"):
            raise AttributeError(item)

        def _fail(*a, **k):
            raise NotImplementedError(
                f"reference test harness stub: {self.__name__}.{item} "
                f"was called — extend ref_harness.py if this path is "
                f"genuinely needed")
        return _fail


def install_stubs() -> None:
    """Idempotently install stubs + put /root/reference on sys.path."""
    if str(REF_ROOT) not in sys.path:
        # reference modules import as `multi_view_generation.*`
        sys.path.insert(0, str(REF_ROOT))

    if _missing("pyrootutils"):
        _module("pyrootutils",
                setup_root=lambda *a, **k: REF_ROOT,
                find_root=lambda *a, **k: REF_ROOT)

    if _missing("deepspeed"):
        class SparsityConfig:
            """Constructor-compatible with deepspeed's SparsityConfig
            (only stores the fields CustomSparsityConfig needs)."""

            def __init__(self, num_heads, block=16,
                         different_layout_per_head=False):
                self.num_heads = num_heads
                self.block = block
                self.different_layout_per_head = different_layout_per_head

        ds = _module("deepspeed")
        ops = _module("deepspeed.ops")
        sa = _module("deepspeed.ops.sparse_attention",
                     SparsityConfig=SparsityConfig)
        ds.ops = ops
        ops.sparse_attention = sa

    if _missing("torchvision"):
        tv = sys.modules.setdefault(
            "torchvision", _RaisingModule("torchvision"))
        tf = sys.modules.setdefault(
            "torchvision.transforms",
            _RaisingModule("torchvision.transforms"))
        tff = sys.modules.setdefault(
            "torchvision.transforms.functional",
            _RaisingModule("torchvision.transforms.functional"))
        tv.transforms = tf
        tf.functional = tff
        tv.__stub__ = tf.__stub__ = tff.__stub__ = True

    if _missing("image_utils"):
        class Im:  # author's private image wrapper; viz-only
            def __init__(self, *a, **k):
                raise NotImplementedError("image_utils.Im stub called")
        _module("image_utils", Im=Im)

    if _missing("beartype"):
        _module("beartype", beartype=lambda f: f)

    if _missing("muse_maskgit_pytorch"):
        mm = _module("muse_maskgit_pytorch")
        vv = _module("muse_maskgit_pytorch.vqgan_vae",
                     VQGanVAE=type("VQGanVAE", (), {}))
        t5 = _module(
            "muse_maskgit_pytorch.t5",
            t5_encode_text=None, get_encoded_dim=lambda name: 512,
            DEFAULT_T5_NAME="t5-small")
        mm.vqgan_vae = vv
        mm.t5 = t5

    if _missing("nuscenes"):
        ns = _module("nuscenes")
        nn_ = _module("nuscenes.nuscenes", NuScenes=type("NuScenes", (), {}))
        me = _module("nuscenes.map_expansion")
        ma = _module("nuscenes.map_expansion.map_api",
                     NuScenesMap=type("NuScenesMap", (), {}))
        ns.nuscenes = nn_
        ns.map_expansion = me
        me.map_api = ma

    if _missing("pyquaternion"):
        _module("pyquaternion", Quaternion=type("Quaternion", (), {}))

    if _missing("shapely"):
        sh = _module("shapely")
        geo = _module("shapely.geometry",
                      MultiPolygon=type("MultiPolygon", (), {}))
        sh.geometry = geo

    if _missing("av2"):
        _module("av2")

    if _missing("wandb"):
        _module("wandb")


def install_stage1_stubs() -> None:
    """Extra stubs needed to import the reference's stage-1 Lightning
    module file (modules/stage1/vqgan.py), which pulls in
    `multi_view_generation.utils` -> rich_utils/pylogger/callback ->
    pytorch_lightning/hydra/omegaconf at import time."""
    import torch.nn as nn

    if _missing("pytorch_lightning"):
        trainer_cls = type("Trainer", (), {})
        pl = _module("pytorch_lightning",
                     LightningModule=nn.Module,
                     LightningDataModule=object,
                     Callback=object, Trainer=trainer_cls)
        pl.trainer = _module("pytorch_lightning.trainer",
                             Trainer=trainer_cls)
        rz = lambda f: f  # noqa: E731
        util = _module("pytorch_lightning.utilities", rank_zero_only=rz)
        _module("pytorch_lightning.utilities.rank_zero", rank_zero_only=rz,
                rank_zero_info=lambda *a, **k: None)
        _module("pytorch_lightning.utilities.exceptions",
                MisconfigurationException=type(
                    "MisconfigurationException", (Exception,), {}))
        pl.utilities = util
        pl.loggers = _module("pytorch_lightning.loggers",
                             WandbLogger=type("WandbLogger", (), {}))
        _module("pytorch_lightning.loggers.logger",
                Logger=type("Logger", (), {}))
        pl.callbacks = _module(
            "pytorch_lightning.callbacks", Callback=object,
            ModelCheckpoint=type("ModelCheckpoint", (), {}),
            LearningRateMonitor=type("LearningRateMonitor", (), {}),
            RichProgressBar=type("RichProgressBar", (), {}),
            RichModelSummary=type("RichModelSummary", (), {}))

    if _missing("hydra"):
        hydra = _module("hydra")
        hydra.utils = _module("hydra.utils",
                              instantiate=lambda *a, **k: None)
        hydra.core = _module("hydra.core")
        _module("hydra.core.hydra_config",
                HydraConfig=type("HydraConfig", (), {}))

    if _missing("omegaconf"):
        _module("omegaconf", OmegaConf=type("OmegaConf", (), {}),
                DictConfig=dict, ListConfig=list, open_dict=None)


def import_ref_stage1():
    """Import the reference stage-1 models (vqgan.py), executing the
    real Encoder/Decoder/VectorQuantizer2/VQModel code.

    `multi_view_generation.utils` must be imported FIRST: the
    reference has a utils <-> utils.callback <-> stage1.vqgan import
    cycle that its own entry points resolve by importing utils before
    any model module (generate.py:10-14); importing vqgan.py directly
    would hit the partially-initialized-module error."""
    install_stubs()
    install_stage1_stubs()
    importlib.import_module("multi_view_generation.utils")
    return importlib.import_module(
        "multi_view_generation.modules.stage1.vqgan")


def import_ref_ar():
    """Import the reference AR Lightning module
    (modules/stage2/cond_transformer_multi_view.py) — needs the same
    Lightning/hydra stubs and utils-first import order as stage 1."""
    install_stubs()
    install_stage1_stubs()
    importlib.import_module("multi_view_generation.utils")
    return importlib.import_module(
        "multi_view_generation.modules.stage2.cond_transformer_multi_view")


def import_ref(module: str):
    """Import a reference module (e.g.
    'multi_view_generation.modules.transformer.permuter')."""
    install_stubs()
    return importlib.import_module(module)


def ref_gpt_config(our_cfg, backend: str = "pytorch", plot: bool = False):
    """Build the reference GPTConfig equivalent to one of our
    MultiViewConfig instances (runs the real __post_init__: permuter,
    masks, prob matrix)."""
    mingpt = import_ref(
        "multi_view_generation.modules.transformer.mingpt_sparse")
    return mingpt.GPTConfig(
        embd_pdrop=our_cfg.embd_pdrop,
        resid_pdrop=our_cfg.resid_pdrop,
        attn_pdrop=our_cfg.attn_pdrop,
        num_layers=our_cfg.num_layers,
        num_heads=our_cfg.num_heads,
        num_embed=our_cfg.num_embed,
        hidden_size=our_cfg.hidden_size,
        vocab_size=our_cfg.vocab_size,
        cond_vocab_size=our_cfg.cond_vocab_size,
        num_cams=our_cfg.num_cams,
        window_len=our_cfg.window_len,
        density=our_cfg.density,
        sparse_block_size=our_cfg.sparse_block_size,
        n_unmasked=our_cfg.n_unmasked,
        backend=backend,
        plot=plot,
        cam_res=tuple(our_cfg.cam_res),
        cam_latent_res=tuple(our_cfg.cam_latent_res),
        bev_latent_res=tuple(our_cfg.bev_latent_res),
        camera_bias=our_cfg.camera_bias,
        bev_embed=our_cfg.bev_embed,
        image_embed=our_cfg.image_embed,
        cam_names=our_cfg.cam_names,
        causal_order=our_cfg.causal_order,
        legacy_prob_matrix=our_cfg.legacy_prob_matrix,
        dataset=our_cfg.dataset.upper(),
    )


# ---------------------------------------------------------------------------
# data-layer execution stubs (VERDICT r4 item 5)
# ---------------------------------------------------------------------------

_AV2_HOME = None


def install_data_stubs():
    """Deepen the stubs so the reference `Argoverse` dataset EXECUTES in
    multi_camera mode on a synthetic AV2 log tree (bev_utils/argoverse.py
    + argoverse_multi_sensor_dataloader.py run unmodified).

    What is stubbed here is exclusively reference DEPENDENCIES — the av2
    devkit's IO/record helpers and torchvision's transform primitives —
    implemented faithfully to their public semantics. Every line of
    reference logic (sync cache construction via merge_asof, camera
    selection, square crops, PIL bicubic resize, normalization,
    intrinsic adjustment, inverse stacking) executes from
    /root/reference. Image decoding uses cv2 on BOTH sides so decoder
    variance cannot masquerade as a parity delta.

    Returns the av2 HOME Path (sync/sensor caches live under it)."""
    global _AV2_HOME
    install_stubs()
    if _AV2_HOME is not None:
        return _AV2_HOME

    import dataclasses
    import enum
    import tempfile

    import numpy as np
    import pandas as pd
    import torch

    _AV2_HOME = Path(tempfile.mkdtemp(prefix="av2_home_"))

    # ---- torchvision: faithful minimal transforms --------------------
    tf = sys.modules["torchvision.transforms"]
    tff = sys.modules["torchvision.transforms.functional"]

    class Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, t):
            mean = torch.as_tensor(self.mean, dtype=t.dtype)[:, None, None]
            std = torch.as_tensor(self.std, dtype=t.dtype)[:, None, None]
            return (t - mean) / std

    class ToPILImage:
        def __call__(self, x):
            from PIL import Image
            return Image.fromarray(np.asarray(x))

    def _jitter_range(v, center=1.0, clip_lo=0.0):
        if v is None or v == 0:
            return None
        return (max(clip_lo, center - v), center + v)

    class ColorJitter:
        """Constructor/get_params-compatible subset (params are only
        consumed under augment_cam_img=True, which the parity tests
        keep off)."""

        def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
            self.brightness = _jitter_range(brightness)
            self.contrast = _jitter_range(contrast)
            self.saturation = _jitter_range(saturation)
            self.hue = (-hue, hue) if hue else None

        @staticmethod
        def get_params(brightness=None, contrast=None, saturation=None,
                       hue=None):
            import random
            def draw(r):
                return None if r is None else random.uniform(*r)
            fn_idx = list(range(4))
            random.shuffle(fn_idx)
            return (fn_idx, draw(brightness), draw(contrast),
                    draw(saturation), draw(hue))

    def to_tensor(pil):
        arr = np.asarray(pil)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(
            arr.transpose(2, 0, 1)))
        return t.float().div(255) if t.dtype == torch.uint8 else t.float()

    def crop(pil, i, j, h, w):
        return pil.crop((j, i, j + w, i + h))

    tf.Compose = Compose
    tf.Normalize = Normalize
    tf.ToPILImage = ToPILImage
    tf.ColorJitter = ColorJitter
    tff.to_tensor = to_tensor
    tff.crop = crop

    # ---- albumentations: identity Compose ----------------------------
    if _missing("albumentations"):
        class ACompose:
            def __init__(self, transforms, **k):
                self.transforms = transforms

            def __call__(self, image=None, **k):
                assert not self.transforms, \
                    "albumentations stub only supports the identity " \
                    "Compose([]) the parity tests exercise"
                return {"image": image}

        _module("albumentations", Compose=ACompose,
                HorizontalFlip=type("HorizontalFlip", (), {}),
                ShiftScaleRotate=type("ShiftScaleRotate", (), {}))

    # ---- av2 devkit: record parsing + calibration + io ---------------
    class RingCameras(str, enum.Enum):
        RING_FRONT_CENTER = "ring_front_center"
        RING_FRONT_LEFT = "ring_front_left"
        RING_FRONT_RIGHT = "ring_front_right"
        RING_REAR_LEFT = "ring_rear_left"
        RING_REAR_RIGHT = "ring_rear_right"
        RING_SIDE_LEFT = "ring_side_left"
        RING_SIDE_RIGHT = "ring_side_right"

    class StereoCameras(str, enum.Enum):
        STEREO_FRONT_LEFT = "stereo_front_left"
        STEREO_FRONT_RIGHT = "stereo_front_right"

    class AnnotationCategories(str, enum.Enum):
        ANIMAL = "ANIMAL"
        ARTICULATED_BUS = "ARTICULATED_BUS"
        BICYCLE = "BICYCLE"
        BICYCLIST = "BICYCLIST"
        BOLLARD = "BOLLARD"
        BOX_TRUCK = "BOX_TRUCK"
        BUS = "BUS"
        CONSTRUCTION_BARREL = "CONSTRUCTION_BARREL"
        CONSTRUCTION_CONE = "CONSTRUCTION_CONE"
        DOG = "DOG"
        LARGE_VEHICLE = "LARGE_VEHICLE"
        MESSAGE_BOARD_TRAILER = "MESSAGE_BOARD_TRAILER"
        MOBILE_PEDESTRIAN_CROSSING_SIGN = "MOBILE_PEDESTRIAN_CROSSING_SIGN"
        MOTORCYCLE = "MOTORCYCLE"
        MOTORCYCLIST = "MOTORCYCLIST"
        OFFICIAL_SIGNALER = "OFFICIAL_SIGNALER"
        PEDESTRIAN = "PEDESTRIAN"
        RAILED_VEHICLE = "RAILED_VEHICLE"
        REGULAR_VEHICLE = "REGULAR_VEHICLE"
        SCHOOL_BUS = "SCHOOL_BUS"
        SIGN = "SIGN"
        STOP_SIGN = "STOP_SIGN"
        STROLLER = "STROLLER"
        TRAFFIC_LIGHT_TRAILER = "TRAFFIC_LIGHT_TRAILER"
        TRUCK = "TRUCK"
        TRUCK_CAB = "TRUCK_CAB"
        VEHICULAR_TRAILER = "VEHICULAR_TRAILER"
        WHEELCHAIR = "WHEELCHAIR"
        WHEELED_DEVICE = "WHEELED_DEVICE"
        WHEELED_RIDER = "WHEELED_RIDER"

    def convert_path_to_named_record(path):
        """av2.datasets.sensor.utils semantics: parse
        <root>/<split>/<log>/sensors/lidar/<ts>.feather or
        <root>/<split>/<log>/sensors/cameras/<cam>/<ts>.jpg."""
        path = Path(path)
        sensor_name = path.parent.stem
        log_path = (path.parents[2] if sensor_name == "lidar"
                    else path.parents[3])
        return {"split": log_path.parent.stem, "log_id": log_path.stem,
                "sensor_name": sensor_name, "timestamp_ns": int(path.stem)}

    def _quat_to_rot(qw, qx, qy, qz):
        q = np.array([qw, qx, qy, qz], np.float64)
        q = q / np.linalg.norm(q)
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)],
        ])

    @dataclasses.dataclass
    class _Intrinsics:
        K: "np.ndarray"

    @dataclasses.dataclass
    class _SE3:
        transform_matrix: "np.ndarray"

    class PinholeCamera:
        def __init__(self, K, ego_SE3_cam, cam_name):
            self.intrinsics = _Intrinsics(K=K)
            self.ego_SE3_cam = _SE3(transform_matrix=ego_SE3_cam)
            self.cam_name = cam_name

        @classmethod
        def from_feather(cls, log_dir, cam_name):
            intr = pd.read_feather(
                Path(log_dir) / "calibration" / "intrinsics.feather")
            row = intr[intr.sensor_name == cam_name].iloc[0]
            K = np.array([[row.fx_px, 0, row.cx_px],
                          [0, row.fy_px, row.cy_px],
                          [0, 0, 1]], np.float64)
            extr = pd.read_feather(Path(log_dir) / "calibration" /
                                   "egovehicle_SE3_sensor.feather")
            row = extr[extr.sensor_name == cam_name].iloc[0]
            E = np.eye(4)
            E[:3, :3] = _quat_to_rot(row.qw, row.qx, row.qy, row.qz)
            E[:3, 3] = [row.tx_m, row.ty_m, row.tz_m]
            return cls(K, E, cam_name)

    @dataclasses.dataclass
    class TimestampedImage:
        img: "np.ndarray"
        camera_model: object
        timestamp_ns: int

    def read_img(path, channel_order="RGB"):
        import cv2
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return (cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                if channel_order == "RGB" else img)

    class TimeUnit(enum.Enum):
        Second = "second"
        Millisecond = "millisecond"
        Microsecond = "microsecond"
        Nanosecond = "nanosecond"

    _SECONDS = {TimeUnit.Second: 1.0, TimeUnit.Millisecond: 1e-3,
                TimeUnit.Microsecond: 1e-6, TimeUnit.Nanosecond: 1e-9}

    def to_metric_time(ts, src, dst):
        return ts * (_SECONDS[src] / _SECONDS[dst])

    av2 = sys.modules.get("av2") or _module("av2")
    ds = _module("av2.datasets")
    sensor = _module("av2.datasets.sensor")
    _module("av2.datasets.sensor.constants", RingCameras=RingCameras,
            StereoCameras=StereoCameras,
            AnnotationCategories=AnnotationCategories)
    _module("av2.datasets.sensor.utils",
            convert_path_to_named_record=convert_path_to_named_record)
    geom = _module("av2.geometry")
    cam = _module("av2.geometry.camera")
    _module("av2.geometry.camera.pinhole_camera",
            PinholeCamera=PinholeCamera)
    _module("av2.map")
    _module("av2.map.map_api",
            ArgoverseStaticMap=type("ArgoverseStaticMap", (), {}))
    _module("av2.structures")
    _module("av2.structures.cuboid",
            CuboidList=type("CuboidList", (), {}))
    _module("av2.structures.sweep", Sweep=type("Sweep", (), {}))
    _module("av2.structures.timestamped_image",
            TimestampedImage=TimestampedImage)
    _module("av2.utils")
    _module("av2.utils.constants", HOME=_AV2_HOME)
    _module("av2.utils.io", TimestampedCitySE3EgoPoses=dict,
            read_city_SE3_ego=None, read_feather=pd.read_feather,
            read_img=read_img)
    _module("av2.utils.metric_time", TimeUnit=TimeUnit,
            to_metric_time=to_metric_time)
    av2.datasets = ds
    ds.sensor = sensor
    av2.geometry = geom
    geom.camera = cam
    return _AV2_HOME


def import_ref_argoverse():
    """Import the reference Argoverse dataset with the data stubs live.
    Returns (argoverse_module, av2_home)."""
    home = install_data_stubs()
    mod = importlib.import_module(
        "multi_view_generation.bev_utils.argoverse")
    return mod, home
