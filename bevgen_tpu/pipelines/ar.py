"""Autoregressive generation pipeline (the legacy/nuScenes path).

The canonical implementation lives in pipelines/ar_generate.py — this
module re-exports it. (Two near-identical ARPipeline classes used to
coexist here and there; consolidated so serving features — int8 tree,
sharded helper, canonical-rig init — and the reference-parity
uncached sampling loop all live on ONE class.)

Reference: cond_transformer_multi_view.py:155-227 sampling +
Net2NetTransformer glue.
"""
from bevgen_tpu.pipelines.ar_generate import (  # noqa: F401
    ARPipeline, make_sharded_ar_generate)
