"""Pre-tokenized dataset: tokenize once with stage-1, train stage-2
from token shards.

An idiomatic-TPU capability the reference lacks (SURVEY §7 hard-part 4):
the stage-2 training input is just codebook indices + BEV tokens +
camera matrices — a few KB per sample. Tokenizing the dataset once on
TPU and memory-mapping the shards removes jpeg decode entirely from the
training input pipeline, so the host can feed arbitrarily large batches.

Shard layout (one npz per shard):
  tokens        (n, cam, hw)   int16   stage-1 codebook indices
  cond_ids      (n, nc)        int16   BEV VQ-VAE indices
  intrinsics_inv(n, cam, 3, 3) float32
  extrinsics_inv(n, cam, 4, 4) float32
  sample_token  (n,)           str
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np


def tokenize_dataset(pipe, params, loader, out_dir: str,
                     shard_size: int = 1024):
    """Run stage-1 encoders over a loader and write token shards."""
    import jax
    import jax.numpy as jnp
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def encode(params, image, seg):
        toks = pipe.encode_images(params, image)
        cond = pipe.encode_bev(params, seg)
        return toks, cond

    buf: List[Dict[str, np.ndarray]] = []
    shard_idx = 0

    def flush():
        nonlocal buf, shard_idx
        if not buf:
            return
        merged = {k: np.concatenate([b[k] for b in buf]) for k in buf[0]
                  if k != "sample_token"}
        tokens_list = sum((list(b["sample_token"]) for b in buf), [])
        np.savez_compressed(out / f"shard_{shard_idx:05d}.npz",
                            sample_token=np.asarray(tokens_list),
                            **merged)
        shard_idx += 1
        buf = []

    n = 0
    for batch in loader:
        toks, cond = encode(params, jnp.asarray(batch["image"]),
                            jnp.asarray(batch["segmentation"]))
        buf.append({
            "tokens": np.asarray(toks, np.int16),
            "cond_ids": np.asarray(cond, np.int16),
            "intrinsics_inv": batch["intrinsics_inv"],
            "extrinsics_inv": batch["extrinsics_inv"],
            "sample_token": batch["sample_token"],
        })
        n += len(batch["sample_token"])
        if sum(len(b["sample_token"]) for b in buf) >= shard_size:
            flush()
    flush()
    return n


class TokenDataset:
    """Loads token shards fully into RAM (they're tiny) and serves
    stage-2 training samples."""

    def __init__(self, shard_dir: str):
        shards = sorted(Path(shard_dir).glob("shard_*.npz"))
        if not shards:
            raise FileNotFoundError(f"no shards in {shard_dir}")
        parts = [dict(np.load(s, allow_pickle=False)) for s in shards]
        self.tokens = np.concatenate([p["tokens"] for p in parts])
        self.cond_ids = np.concatenate([p["cond_ids"] for p in parts])
        self.intrinsics_inv = np.concatenate(
            [p["intrinsics_inv"] for p in parts])
        self.extrinsics_inv = np.concatenate(
            [p["extrinsics_inv"] for p in parts])
        self.sample_token = np.concatenate(
            [p["sample_token"] for p in parts])

    def __len__(self):
        return len(self.tokens)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return {
            "tokens": self.tokens[idx].astype(np.int32),
            "cond_ids": self.cond_ids[idx].astype(np.int32),
            "intrinsics_inv": self.intrinsics_inv[idx],
            "extrinsics_inv": self.extrinsics_inv[idx],
            "sample_token": str(self.sample_token[idx]),
        }
