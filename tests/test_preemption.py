"""Preemption handling + async checkpointing.

TPU-fleet features the reference never needed on one A5000: SIGTERM
(pod preemption notice) turns into finish-step -> final checkpoint ->
exit 0, and checkpoint serialization can ride a background worker so
the step loop only pays the device->host snapshot.
"""
import os
import signal

import numpy as np
import pytest


def test_preemption_guard_sets_flag_and_restores_handlers():
    from bevgen_tpu.training.preemption import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        # signal delivery to the main thread is synchronous at the next
        # bytecode boundary
        assert guard.should_stop
    assert signal.getsignal(signal.SIGTERM) is before


def test_preemption_guard_second_signal_falls_through():
    from bevgen_tpu.training.preemption import PreemptionGuard

    hits = []
    prev = signal.signal(signal.SIGUSR1, lambda s, f: hits.append(s))
    try:
        with PreemptionGuard(signals=(signal.SIGUSR1,)) as guard:
            os.kill(os.getpid(), signal.SIGUSR1)
            assert guard.should_stop and not hits
            os.kill(os.getpid(), signal.SIGUSR1)  # second -> previous
            assert hits == [signal.SIGUSR1]
    finally:
        signal.signal(signal.SIGUSR1, prev)


def test_async_checkpoint_roundtrip_and_prune(tmp_path):
    from bevgen_tpu.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(tmp_path, interval_minutes=0.0, keep_last=2,
                            async_save=True)
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    for step in (1, 2, 3):
        assert mgr.save_step(step, {"w": tree["w"] + step})
        mgr.save_ema(step, {"w": tree["w"] * step})
    mgr.wait()

    kept = sorted(p.name for p in tmp_path.iterdir() if p.is_dir())
    assert kept == ["step_00000002", "step_00000002-EMA",
                    "step_00000003", "step_00000003-EMA"]
    restored = mgr.restore_latest({"w": np.zeros((2, 3), np.float32)})
    np.testing.assert_array_equal(restored["w"], tree["w"] + 3)


def test_async_checkpoint_snapshot_isolated_from_mutation(tmp_path):
    """The host snapshot happens synchronously in _save — mutating the
    source tree right after save_step must not corrupt the write."""
    from bevgen_tpu.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(tmp_path, async_save=True)
    live = {"w": np.ones((4,), np.float32)}
    mgr.save_step(1, live, force=True)
    live["w"] *= -1  # step loop mutates immediately
    mgr.wait()
    restored = mgr.restore_latest({"w": np.zeros((4,), np.float32)})
    np.testing.assert_array_equal(restored["w"], np.ones((4,)))


def test_async_checkpoint_error_surfaces_on_join(tmp_path, monkeypatch):
    from bevgen_tpu.training import checkpoints as mod

    mgr = mod.CheckpointManager(tmp_path, async_save=True)

    def boom(path, tree):
        raise IOError("disk full")
    monkeypatch.setattr(mod.ckpt_io, "save_checkpoint", boom)
    mgr.save_step(1, {"w": np.ones(2, np.float32)}, force=True)
    with pytest.raises(IOError, match="disk full"):
        mgr.wait()
    # the failed future is consumed; the manager stays usable
    mgr.wait()


@pytest.mark.slow
def test_train_stage2_sigterm_checkpoints_and_exits(
        tmp_path, capsys, monkeypatch):
    """Full preemption drive: SIGTERM mid-run -> loop breaks, a final
    forced checkpoint (params + -EMA sibling) lands, main returns.

    The signal is raised from INSIDE the step loop (3rd batch shard) so
    delivery always lands while the guard is installed — a wall-clock
    timer can beat main() to the guard and kill the process."""
    from bevgen_tpu.parallel import sharding as shd
    from bevgen_tpu.scripts import train_stage2

    ckpts = tmp_path / "ckpts"
    calls = {"n": 0}
    real = shd.shard_batch

    def shard_and_preempt(batch, mesh):
        calls["n"] += 1
        if calls["n"] == 3:
            os.kill(os.getpid(), signal.SIGTERM)
        return real(batch, mesh)
    monkeypatch.setattr(shd, "shard_batch", shard_and_preempt)

    train_stage2.main([
        "preset=tiny_test", "print_config=false", "fake=true",
        "steps=100000", "batch_size=2", "tp=1", "dp=1",
        f"ckpt_dir={ckpts}", "ckpt_async=true", "warmup_steps=1",
        "log_every=1000000"])
    out = capsys.readouterr().out
    assert '"preempted": true' in out
    assert out.strip().endswith("done")

    tags = sorted(p.name for p in ckpts.iterdir() if p.is_dir())
    steps = [t for t in tags if not t.endswith("-EMA")]
    assert steps and [t + "-EMA" in tags for t in steps].count(True) >= 1
    latest = (ckpts / "LATEST").read_text().strip()
    assert latest in tags
    # SIGTERM handlers restored for the rest of the suite
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
