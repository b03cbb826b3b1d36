"""Execute the remaining pure reference auxiliaries and match our
equivalents: BEV palette rendering (bev_utils/visualize.py:67 viz_bev),
the warmup-cosine LR schedule (utils/scheduler.py:3), and the
Labelator/SOSProvider conditioning encoders (utils/taming_utils.py:
103-131)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow  # executes the torch reference (minutes of CPU)


import ref_harness as rh  # noqa: E402


@pytest.fixture(autouse=True)
def _stubs():
    # importing anything under multi_view_generation.utils pulls in the
    # whole utils package (pylogger -> pytorch_lightning, rich_utils ->
    # hydra/omegaconf) — the stage-1 stub set covers it
    rh.install_stubs()
    rh.install_stage1_stubs()


def test_ref_viz_bev_matches_bit_for_bit():
    """viz_bev: channel-permutation quirk + priority argmax + palette
    blend must be byte-identical to the executed reference."""
    from bevgen_tpu.utils import viz as our_viz

    ref_viz = rh.import_ref("multi_view_generation.bev_utils.visualize")
    util = rh.import_ref("multi_view_generation.bev_utils.util")
    # the reference returns Im(result) (author's private wrapper, stub
    # raises) — capture the raw array instead
    captured = {}

    class _Im:
        def __init__(self, arr):
            captured["arr"] = arr

    orig = ref_viz.Im
    ref_viz.Im = _Im
    try:
        rng = np.random.default_rng(0)
        bev = rng.uniform(size=(7, 64, 64)).astype(np.float32)  # (c,h,w)
        ref_viz.viz_bev(bev.copy(), util.Dataset.ARGOVERSE)
    finally:
        ref_viz.Im = orig
    ref_img = captured["arr"]

    ours = our_viz.viz_bev(np.transpose(bev, (1, 2, 0)),
                           dataset="argoverse")
    ours_arr = ours.np if hasattr(ours, "np") else np.asarray(ours)
    assert ours_arr.dtype == np.uint8 and ref_img.dtype == np.uint8
    np.testing.assert_array_equal(ours_arr, ref_img)


def test_ref_warmup_cosine_schedule_matches():
    from bevgen_tpu.training.optim import warmup_cosine

    sched_mod = rh.import_ref("multi_view_generation.utils.scheduler")
    base_lr, warmup, total, lr_min = 3e-4, 10, 200, 1e-6
    ref = sched_mod.LambdaWarmUpCosineScheduler(
        warm_up_steps=warmup, lr_min=lr_min, lr_max=base_lr,
        lr_start=0.0, max_decay_steps=total)
    ours = warmup_cosine(base_lr, warmup, total, min_lr=lr_min)
    for n in [0, 1, 5, 9, 10, 11, 50, 199, 200, 500]:
        # ours computes in fp32 (jit-friendly), reference in fp64
        np.testing.assert_allclose(float(ours(n)), ref(n), rtol=1e-5,
                                   atol=1e-10, err_msg=f"step {n}")


def test_ref_labelator_and_sos_provider_match():
    from bevgen_tpu.models.conditioning import Labelator, SOSProvider

    tam = rh.import_ref("multi_view_generation.utils.taming_utils")

    labels = np.array([3, 0, 7])
    ref_c, _, ref_info = tam.Labelator(n_classes=10).encode(
        torch.from_numpy(labels))
    our_c, _, our_idx = Labelator(n_classes=10).encode(labels)
    np.testing.assert_array_equal(np.asarray(our_c), ref_c.numpy())
    np.testing.assert_array_equal(np.asarray(our_idx),
                                  ref_info[2].numpy())

    x = np.zeros((4, 5), np.float32)
    ref_c, _, ref_info = tam.SOSProvider(sos_token=11).encode(
        torch.from_numpy(x))
    our_c, _, our_idx = SOSProvider(sos_token=11).encode(x)
    np.testing.assert_array_equal(np.asarray(our_c), ref_c.numpy())
    np.testing.assert_array_equal(np.asarray(our_idx),
                                  ref_info[2].numpy())


def test_ref_ema_update_rule_matches():
    """Our functional EMA must follow the executed reference update
    (ema.py:148-151: fixed decay, torch._foreach mul/add) step for
    step — the reference has NO decay warmup ramp."""
    from bevgen_tpu.training import optim

    ema_mod = rh.import_ref("multi_view_generation.modules.stage2.ema")

    rng = np.random.default_rng(9)
    p = rng.standard_normal(16).astype(np.float32)
    ema_t = [torch.from_numpy(p.copy())]
    state = optim.ema_init({"w": p.copy()})
    decay = 0.9

    for step in range(5):
        cur = rng.standard_normal(16).astype(np.float32)
        ema_mod.ema_update(tuple(ema_t), (torch.from_numpy(cur),), decay)
        state = optim.ema_update(state, {"w": cur}, decay=decay)
        np.testing.assert_allclose(np.asarray(state.params["w"]),
                                   ema_t[0].numpy(), rtol=1e-6,
                                   err_msg=f"step {step}")
