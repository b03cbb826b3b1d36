"""Regenerate configs/int8_crossover.json on the current chip/kernels.

Measures the flagship generate (18-step self-critic decode) in bf16 and
int8 W8A8 at a batch sweep and writes the measured table the
`BEVGenPipeline.quantized(batch_hint=)` guard consults — so the
crossover stays honest when kernels or hardware change (VERDICT r4
item 7; round-4 sweep method: docs/PERF_NOTES.md per-mode table).

Run from /root/repo on the TPU:
  python scripts_dev/crossover_sweep.py            # batches 2,3,4,8,16
  SWEEP_BATCHES=2,3 SWEEP_REPS=3 python scripts_dev/crossover_sweep.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from bevgen_tpu.core.config import argoverse_muse_7cam_config
    from bevgen_tpu.pipelines.generate import BEVGenPipeline

    batches = [int(x) for x in os.environ.get(
        "SWEEP_BATCHES", "2,3,4,8,16").split(",") if x]
    reps = int(os.environ.get("SWEEP_REPS", "3"))

    cfg = argoverse_muse_7cam_config()
    pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
    params = pipe.init_params(jax.random.PRNGKey(0))
    qpipe, qparams = pipe.quantized(params, batch_hint=None)

    meas = {}
    for b in batches:
        row = {}
        for name, (p, pp) in (("bf16", (pipe, params)),
                              ("int8", (qpipe, qparams))):
            ips, _ = bench.measure(p, pp, cfg, b, reps, no_critic=False)
            row[name] = round(ips, 2)
            print(f"b{b} {name}: {row[name]} img/s", file=sys.stderr,
                  flush=True)
        meas[str(b)] = row

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bevgen_tpu", "configs", "int8_crossover.json")
    table = {
        "comment": "Measured batch -> images/sec for the flagship 7-cam "
                   "generate in bf16 vs int8 W8A8 (18-step self-critic "
                   "decode). Consumed by BEVGenPipeline.quantized("
                   "batch_hint=); regenerate with "
                   "scripts_dev/crossover_sweep.py.",
        "chip": jax.devices()[0].device_kind,
        "source": f"crossover_sweep.py, median of {reps}",
        "measurements": meas,
    }
    with open(out_path, "w") as f:
        json.dump(table, f, indent=2)
        f.write("\n")
    print(json.dumps(table))


if __name__ == "__main__":
    main()
