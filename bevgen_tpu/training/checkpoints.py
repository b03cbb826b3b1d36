"""Checkpoint management: periodic + wall-clock-interval saves, EMA
variants, resume.

Reference equivalents: the two ModelCheckpoint callbacks (every epoch +
every 30 min wall-clock, utils/general.py:44-55), `-EMA` suffixed
checkpoints (ema.py:94-146) and the three-level load order
(README.md:112): stage-1 ckpts -> weights-only -> full train state.
"""
from __future__ import annotations

import re
import time
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from bevgen_tpu.core import checkpoint as ckpt_io


class CheckpointManager:
    def __init__(self, directory: str, interval_minutes: float = 30.0,
                 keep_last: int = 3, async_save: bool = False):
        """async_save=True moves serialization + fsync + pruning to a
        single background worker so the train loop only pays the
        device->host snapshot (which must stay synchronous for
        consistency). At most one write is in flight; a new save joins
        the previous one first, and any worker exception re-raises on
        that join / on wait()."""
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.interval_s = interval_minutes * 60.0
        self.keep_last = keep_last
        self._last_save = time.monotonic()
        self._pool = None
        self._pending = None
        if async_save:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer")

    def _write(self, tag: str, tree: Any, update_latest: bool,
               prune: bool):
        path = self.dir / tag
        if path.exists():
            import shutil
            shutil.rmtree(path)
        ckpt_io.save_checkpoint(str(path), tree)
        if update_latest:
            (self.dir / "LATEST").write_text(tag)
        if prune:
            self._prune()

    def _save(self, tag: str, state: Any, update_latest: bool = True,
              prune: bool = False):
        # host snapshot is synchronous either way — the caller may
        # mutate/donate the buffers on the very next step. Async mode
        # must COPY: np.asarray on an already-host-resident leaf is a
        # view, and the write races the loop's in-place updates.
        snap = np.array if self._pool is not None else np.asarray
        tree = jax.tree_util.tree_map(snap, state)
        if self._pool is None:
            self._write(tag, tree, update_latest, prune)
        else:
            self.wait()
            self._pending = self._pool.submit(
                self._write, tag, tree, update_latest, prune)

    def wait(self):
        """Join (and surface errors from) any in-flight async write."""
        if self._pending is not None:
            fut, self._pending = self._pending, None
            fut.result()

    @staticmethod
    def _is_writer() -> bool:
        """Rank-0-only write discipline, centralized: in a multi-process
        job every process may CALL save_* (trainers are rank-agnostic),
        but only process 0 acts. The orbax layer underneath is single-
        writer-scoped (core/checkpoint._make_checkpointer), so the
        non-writers must return before touching the filesystem — a
        per-process wall-clock skew must also never let two processes
        disagree about whether a save happened (only rank 0's clock is
        ever consulted)."""
        import jax
        return jax.process_index() == 0

    def save_step(self, step: int, state: Any, force: bool = False):
        """Wall-clock-interval save (the 30-min ModelCheckpoint)."""
        if not self._is_writer():
            return False
        now = time.monotonic()
        if force or (now - self._last_save) >= self.interval_s:
            self._save(f"step_{step:08d}", state, prune=True)
            self._last_save = now
            return True
        return False

    def save_epoch(self, epoch: int, state: Any):
        if not self._is_writer():
            return
        self._save(f"epoch_{epoch:04d}", state, prune=True)

    def save_ema(self, step: int, ema_params: Any):
        if not self._is_writer():
            return
        # EMA variants never own the resume pointer (LATEST must stay a
        # full params tree)
        self._save(f"step_{step:08d}-EMA", ema_params, update_latest=False)

    def _prune(self):
        tags = sorted(p.name for p in self.dir.iterdir()
                      if p.is_dir() and p.name.startswith("step_")
                      and not p.name.endswith("-EMA"))
        # never delete the checkpoint LATEST points to: a fresh run's
        # low-numbered tag sorts before stale higher-numbered tags left
        # in the dir, and pruning it would leave LATEST dangling (silent
        # restart-from-scratch on the next resume)
        marker = self.dir / "LATEST"
        latest = marker.read_text().strip() if marker.exists() else None
        doomed = [t for t in tags if t != latest][
            :max(0, len(tags) - self.keep_last)]
        for t in doomed:
            import shutil
            shutil.rmtree(self.dir / t, ignore_errors=True)
            # drop the -EMA sibling with its base checkpoint
            shutil.rmtree(self.dir / (t + "-EMA"), ignore_errors=True)

    def latest(self) -> Optional[str]:
        self.wait()
        marker = self.dir / "LATEST"
        if marker.exists():
            tag = marker.read_text().strip()
            if (self.dir / tag).exists():
                return str(self.dir / tag)
        return None

    def restore_latest(self, example: Any) -> Optional[Any]:
        path = self.latest()
        if path is None:
            return None
        return ckpt_io.restore_checkpoint(path, example)


def resolve_ema_path(path: str) -> str:
    """Resolve the `-EMA` sibling of a checkpoint path (the reference
    swaps EMA weights in for val/test — modules/stage2/ema.py:94-146;
    save_ema writes `step_XXXXXXXX-EMA` siblings here).

    Accepts either a concrete step dir (`.../step_00000042`) or a run
    dir containing step_* tags (picks the LATEST-pointed, else newest,
    step's EMA sibling). Raises FileNotFoundError when no EMA
    checkpoint exists — silently serving non-EMA weights when the user
    asked for EMA would be a quality bug."""
    p = Path(path)
    if p.name.endswith("-EMA"):
        return str(p)
    if p.is_dir() and p.name.startswith(("step_", "epoch_")):
        ema = p.parent / (p.name + "-EMA")
        if not ema.is_dir():
            raise FileNotFoundError(
                f"no EMA sibling for {p} (expected {ema})")
        return str(ema)
    if p.is_dir():
        marker = p / "LATEST"
        if marker.exists():
            tag = marker.read_text().strip()
        else:
            tags = sorted(d.name for d in p.iterdir() if d.is_dir()
                          and d.name.startswith("step_")
                          and not d.name.endswith("-EMA"))
            if not tags:
                raise FileNotFoundError(f"no step_* checkpoints in {p}")
            tag = tags[-1]
        ema = p / (tag + "-EMA")
        if not ema.is_dir():
            raise FileNotFoundError(
                f"no EMA sibling for {p / tag} (expected {ema})")
        return str(ema)
    raise FileNotFoundError(
        f"ema=true needs an orbax checkpoint dir, got {path}")


def _tree_has_key(tree: Any, key: str) -> bool:
    from collections.abc import Mapping
    if isinstance(tree, Mapping):
        return key in tree or any(_tree_has_key(v, key)
                                  for v in tree.values())
    return False


def load_weights(path: str, example_params: Any) -> Any:
    """Weights-only load (+model.ckpt_path level): orbax dir or torch
    .ckpt via the converter (utils/general.py:119).

    Torch checkpoints are routed by key prefix to the right converter:
    `maskgit.*` -> MUSE Net2Net (cond_transformer_multi_view_muse.py),
    top-level `transformer.*` -> AR Net2Net with the sparse GPT
    (cond_transformer_multi_view.py:30), bare `encoder./decoder.` ->
    a single stage-1 VQ model.

    Whether the converter keeps the checkpoint's unconditional
    `self_cond_to_init_embed.*` keys (muse_maskgit_pytorch.py:241) is
    inferred from `example_params`: if the target model was built with
    cfg.self_cond its init tree contains that module, and dropping the
    keys would leave the returned tree missing params."""
    from collections.abc import Mapping
    p = Path(path)
    if p.suffix in (".ckpt", ".pt", ".pth"):
        state = ckpt_io.load_torch_checkpoint(str(p))
        keys = list(state)
        if any(k.startswith("maskgit.") for k in keys):
            self_cond = _tree_has_key(example_params,
                                      "self_cond_to_init_embed")
            return ckpt_io.convert_net2net(state, self_cond=self_cond)
        if any(k.startswith("transformer.") for k in keys):
            return ckpt_io.convert_ar_net2net(state)
        if any(k.startswith(("encoder.", "decoder.", "quantize."))
               for k in keys):
            tree = {"params": ckpt_io.convert_stage1(state)}
            # production callers pass PIPELINE-shaped example trees
            # ({'first_stage', 'cond_stage', ...}); graft the bare
            # stage-1 model into its slot there, keeping the rest of
            # the example (a wholesale replace would KeyError at the
            # first encode)
            if (isinstance(example_params, Mapping)
                    and "first_stage" in example_params):
                out = dict(example_params)
                out["first_stage"] = tree
                print("[load_weights] bare stage-1 checkpoint grafted "
                      "into example tree's first_stage (cond_stage and "
                      "the rest keep their current values)")
                return out
            return tree
        raise ValueError(
            f"unrecognized torch checkpoint family in {path}: "
            f"sample keys {keys[:5]}")
    return ckpt_io.restore_checkpoint(str(p), example_params)
