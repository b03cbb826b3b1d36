"""Quick b16 flagship generate A/B across cosine-kernel choices.

  python scripts_dev/bench_quick.py [batch] [reps] [kernels...]

One process, one pipeline; the kernel choice env is flipped between
jits (cosine_kernel_choice() reads it at trace time). Sync via scalar
materialization (axon gotcha)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bevgen_tpu.core.config import argoverse_muse_7cam_config
from bevgen_tpu.data.fake import fake_batch
from bevgen_tpu.pipelines.generate import BEVGenPipeline

batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
kernels = sys.argv[3:] or ["fb2", "fb2c"]

cfg = argoverse_muse_7cam_config()
pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
params = pipe.init_params(jax.random.PRNGKey(0))
batch = fake_batch(cfg, batch_size=batch_size)
seg = jnp.asarray(batch["segmentation"])
ii = jnp.asarray(batch["intrinsics_inv"])
ei = jnp.asarray(batch["extrinsics_inv"])
n_images = batch_size * cfg.transformer.num_cams

for kern in kernels:
    os.environ["BEVGEN_COSINE_KERNEL"] = kern

    @jax.jit
    def run(params, seg, ii, ei, rng):
        return pipe.generate_fn(params, seg, ii, ei, rng)

    def sync(rng):
        imgs, ids = run(params, seg, ii, ei, rng)
        np.asarray(ids[0, 0, 0, 0])

    t0 = time.perf_counter()
    sync(jax.random.PRNGKey(1))
    print(f"{kern}: compile+1st {time.perf_counter()-t0:.0f}s", flush=True)
    sync(jax.random.PRNGKey(2))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        sync(jax.random.PRNGKey(3 + i))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{kern}: {n_images/np.median(times):.2f} img/s (median), "
          f"{n_images/best:.2f} (best) over {reps}", flush=True)
