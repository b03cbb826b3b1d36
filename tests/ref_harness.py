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
