"""Hydra-ish CLI plumbing shared by the runnable scripts.

The reference drives everything through hydra `key=value` overrides
(generate.py, README.md:64-75); we keep that surface: positional
`key=value` tokens, `preset=<name>` selects a PipelineConfig, dotted
keys override nested dataclass fields, plus a few script-level keys the
scripts pop for themselves.
"""
from __future__ import annotations

import sys
from typing import Dict, Tuple

from bevgen_tpu.core.config import PRESETS, PipelineConfig, apply_overrides


def parse_argv(argv=None) -> Dict[str, str]:
    argv = argv if argv is not None else sys.argv[1:]
    out: Dict[str, str] = {}
    for tok in argv:
        if "=" not in tok:
            raise SystemExit(f"arguments must be key=value, got {tok!r}")
        k, v = tok.split("=", 1)
        out[k] = v
    return out


def load_yaml_config(path: str) -> PipelineConfig:
    """YAML pipeline config (bevgen_tpu/configs/*.yaml): an optional
    `preset` base plus nested field overrides."""
    import yaml
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    preset = data.pop("preset", "argoverse_muse")
    cfg = PRESETS[preset]()

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, key))
            else:
                out[key] = tuple(v) if isinstance(v, list) else v
        return out

    return apply_overrides(cfg, flatten(data))


# ---------------------------------------------------------------------------
# Mode mixins: hydra's list-composable config groups
# (reference 'modes=[argoverse,generate]', generate.py:75,
#  configs/train.yaml:22, configs/modes/*.yaml). Each mode is a delta
# layered onto the composed config IN LIST ORDER, before explicit
# key=value overrides (hydra precedence: defaults list < CLI overrides).
# A mode may also inject script-arg DEFAULTS (applied only where the
# user didn't pass the key) — that's how configs/modes/generate.yaml's
# datamodule surgery translates here.
# ---------------------------------------------------------------------------

def _mode_argoverse(cfg: PipelineConfig):
    """configs/modes/argoverse.yaml: 3 square front ring cameras on the
    Argoverse dataset (stage_2_argoverse model/datamodule override).
    The yaml's model.bbox_ce_weight=0.0 concerns the AR path's bbox
    up-weighting, which here is a per-call `weights` arg of ar_loss —
    zero by default already."""
    import dataclasses
    tf = cfg.transformer.replace(
        num_cams=3, cam_names="ARGOVERSE_FRONT_CAMERAS",
        dataset="argoverse", cam_res=(256, 256), cam_latent_res=(16, 16))
    return dataclasses.replace(cfg, transformer=tf), {}


def _mode_generate(cfg: PipelineConfig):
    """configs/modes/generate.yaml: inference task — evaluation split,
    outputs under eval_generate (our generate script's own defaults
    cover save_dir/callbacks; only the split default changes)."""
    return cfg, {"datamodule.split": "test"}


MODES = {"argoverse": _mode_argoverse, "generate": _mode_generate}


def apply_modes(cfg: PipelineConfig, modes_value: str,
                args: Dict[str, str]) -> PipelineConfig:
    """Apply `modes=[a,b]` (or `modes=a,b`) deltas in order; mode-
    injected script-arg defaults only fill keys the user didn't pass."""
    names = [m.strip() for m in modes_value.strip("[]").split(",")
             if m.strip()]
    for name in names:
        if name not in MODES:
            raise SystemExit(f"unknown mode {name!r}; "
                             f"choose from {sorted(MODES)}")
        cfg, injected = MODES[name](cfg)
        for k, v in injected.items():
            args.setdefault(k, v)
    return cfg


def build_config(args: Dict[str, str],
                 default_preset: str = "argoverse_muse"
                 ) -> Tuple[PipelineConfig, Dict[str, str]]:
    """Pop config-related keys from args, return (config, leftover).
    `config=<file.yaml>` loads a YAML config; `preset=` picks a named
    python preset; `modes=[a,b]` layers mode mixins; dotted keys
    override any of them."""
    args = dict(args)
    yaml_path = args.pop("config", None)
    modes_value = args.pop("modes", None)
    if yaml_path:
        cfg = load_yaml_config(yaml_path)
        preset = args.pop("preset", None)
        if preset:
            raise SystemExit("pass either config= or preset=, not both")
    else:
        preset = args.pop("preset", default_preset)
        if preset not in PRESETS:
            raise SystemExit(f"unknown preset {preset!r}; "
                             f"choose from {sorted(PRESETS)}")
        cfg = PRESETS[preset]()
    if modes_value:
        cfg = apply_modes(cfg, modes_value, args)
    return _apply_cli_overrides(cfg, args)


def _apply_cli_overrides(cfg: PipelineConfig, args: Dict[str, str]
                         ) -> Tuple[PipelineConfig, Dict[str, str]]:
    cfg_overrides = {}
    passthrough = {}
    import dataclasses
    top_fields = {f.name for f in dataclasses.fields(cfg)}
    for k, v in args.items():
        head = k.split(".", 1)[0]
        if head in top_fields:
            cfg_overrides[k] = v
        else:
            passthrough[k] = v
    cfg = apply_overrides(cfg, cfg_overrides)
    return cfg, passthrough


def print_config_tree(cfg: PipelineConfig, extra: Dict[str, object] = None,
                      console=None) -> None:
    """Render the composed config as a rich tree at startup
    (utils/rich_utils.py:18 print_config_tree parity). Derived fields
    (properties) are omitted — only the authored dataclass fields show,
    like the reference's composed-yaml dump."""
    import dataclasses
    from rich.console import Console
    from rich.tree import Tree

    def add(node, name, value):
        if dataclasses.is_dataclass(value):
            sub = node.add(f"[bold cyan]{name}[/]")
            for f in dataclasses.fields(value):
                add(sub, f.name, getattr(value, f.name))
        else:
            node.add(f"[green]{name}[/]: {value!r}")

    tree = Tree("[bold]config[/]")
    for f in dataclasses.fields(cfg):
        add(tree, f.name, getattr(cfg, f.name))
    for k, v in (extra or {}).items():
        tree.add(f"[yellow]{k}[/]: {v!r}")
    (console or Console()).print(tree)


def setup_platform(args: Dict[str, str]):
    """Honor platform=cpu / devices=N (or the JAX_PLATFORMS env var)
    before jax backend init.

    The env var alone is not enough on hosts with an out-of-tree TPU
    plugin that registers regardless of JAX_PLATFORMS — mirror whatever
    platform the user asked for into jax.config, which IS authoritative,
    so `JAX_PLATFORMS=cpu python -m bevgen_tpu.scripts.generate ...`
    doesn't silently run on the TPU."""
    import os
    plat = args.pop("platform", None) or os.environ.get("JAX_PLATFORMS")
    if plat:
        os.environ["JAX_PLATFORMS"] = plat
        if plat == "cpu" and "devices" in args:
            n = args.pop("devices")
            os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                       f" --xla_force_host_platform_device_count={n}")
        import jax
        jax.config.update("jax_platforms", plat)
    return args
