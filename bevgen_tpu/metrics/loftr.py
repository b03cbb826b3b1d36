"""LoFTR learned matcher — flax port for the paper consistency metric.

The reference's cross-camera consistency numbers come from kornia's
LoFTR ("outdoor" weights) run over 50-px adjacent-edge windows
(/root/reference/multi_view_generation/scripts/metrics_consistency_sift.py:14,111-168).
This module ports the LoFTR architecture (Sun et al., CVPR 2021 —
detector-free matching: ResNet-FPN backbone, linear-attention coarse
transformer, dual-softmax mutual-NN matching, window fine refinement)
to flax so those numbers become reproducible on TPU once the public
checkpoint is converted with `convert_loftr_weights` (zero egress in
this image: the converter + self-check are gated-but-runnable, the
same discipline as metrics/inception.py).

Fidelity notes:
  * All module/parameter names mirror the original repo's state_dict
    (which kornia re-serves verbatim) so conversion is a structural
    rename, checked strictly — unmatched keys fail loudly.
  * BatchNorms run in eval mode (running stats as constants), matching
    LoFTR inference.
  * Inputs whose sides are not multiples of 8 (the reference's 50-px
    strips are not) are zero-padded up and the padded coarse cells are
    masked out of matching; the original torch code CRASHES on such
    inputs (FPN upsample shape mismatch), so padding is the minimal
    deviation that makes the reference's own edge-window protocol run.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# outdoor/indoor LoFTR hyperparameters (loftr/utils/cvpr_ds_config.py)
INITIAL_DIM = 128
BLOCK_DIMS = (128, 196, 256)
D_COARSE = 256
D_FINE = 128
NHEAD = 8
COARSE_LAYERS = ("self", "cross") * 4
FINE_LAYERS = ("self", "cross")
DS_TEMPERATURE = 0.1
MATCH_THR = 0.2
BORDER_RM = 2
FINE_WINDOW = 5
EPS_BN = 1e-5
EPS_LIN_ATTN = 1e-6


# ---------------------------------------------------------------------------
# parameter-tree helpers (params are plain nested dicts of jnp arrays,
# keyed by the ORIGINAL torch module path — conversion is then a pure
# tensor-layout change, never a rename)
# ---------------------------------------------------------------------------


def _conv(params, name, x, stride=1):
    # torch Conv2d(padding=k//2) pads SYMMETRICALLY; XLA "SAME" at
    # stride 2 pads (k//2 - 1, k//2), which shifts every strided conv
    # by one input pixel (caught by the executed-torch equivalence
    # suite, tests/test_loftr_ref.py) — pad explicitly
    w = params[f"{name}.weight"]  # (kh, kw, I, O) after conversion
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(params, name, x):
    w, b = params[f"{name}.weight"], params[f"{name}.bias"]
    m, v = params[f"{name}.running_mean"], params[f"{name}.running_var"]
    return (x - m) * jax.lax.rsqrt(v + EPS_BN) * w + b


def _linear(params, name, x, bias=True):
    y = x @ params[f"{name}.weight"]  # (I, O) after conversion
    if bias:
        y = y + params[f"{name}.bias"]
    return y


def _ln(params, name, x):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return xn * params[f"{name}.weight"] + params[f"{name}.bias"]


# ---------------------------------------------------------------------------
# backbone: ResNetFPN_8_2 (loftr/backbone/resnet_fpn.py)
# ---------------------------------------------------------------------------


def _basic_block(params, name, x, stride):
    y = jax.nn.relu(_bn(params, f"{name}.bn1",
                        _conv(params, f"{name}.conv1", x, stride)))
    y = _bn(params, f"{name}.bn2", _conv(params, f"{name}.conv2", y))
    if stride != 1:
        x = _bn(params, f"{name}.downsample.1",
                _conv(params, f"{name}.downsample.0", x, stride))
    return jax.nn.relu(x + y)


def _layer(params, name, x, stride):
    x = _basic_block(params, f"{name}.0", x, stride)
    return _basic_block(params, f"{name}.1", x, 1)


def _upsample2x(x):
    """bilinear 2x with ALIGN_CORNERS=TRUE — what the FPN's
    F.interpolate(..., align_corners=True) computes. jax.image.resize's
    'bilinear' is half-pixel-centers (align_corners=False) and differs
    everywhere except the corners (caught by tests/test_loftr_ref.py);
    implemented as two separable gather-lerps on the exact
    i*(n-1)/(2n-1) source coordinates."""
    n, h, w, c = x.shape

    def lerp_axis(t, size, axis):
        out = 2 * size
        coords = jnp.arange(out, dtype=jnp.float32) * (size - 1) / (out - 1)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        frac = (coords - lo).reshape(
            [-1 if a == axis else 1 for a in range(t.ndim)])
        return (jnp.take(t, lo, axis=axis) * (1.0 - frac)
                + jnp.take(t, hi, axis=axis) * frac)

    return lerp_axis(lerp_axis(x, h, 1), w, 2)


def _out_conv2(params, name, x):
    y = jax.nn.leaky_relu(_bn(params, f"{name}.1",
                              _conv(params, f"{name}.0", x)),
                          negative_slope=0.01)
    return _conv(params, f"{name}.3", y)


def backbone_fpn(params, x):
    """x: (b, H, W, 1) grayscale, H/W multiples of 8. Returns
    (coarse (b, H/8, W/8, 256), fine (b, H/2, W/2, 128))."""
    p = {k[len("backbone."):]: v for k, v in params.items()
         if k.startswith("backbone.")}
    x0 = jax.nn.relu(_bn(p, "bn1", _conv(p, "conv1", x, 2)))   # 1/2
    x1 = _layer(p, "layer1", x0, 1)                            # 1/2, 128
    x2 = _layer(p, "layer2", x1, 2)                            # 1/4, 196
    x3 = _layer(p, "layer3", x2, 2)                            # 1/8, 256

    x3_out = _conv(p, "layer3_outconv", x3)
    x2_out = _conv(p, "layer2_outconv", x2)
    x2_out = _out_conv2(p, "layer2_outconv2", x2_out + _upsample2x(x3_out))
    x1_out = _conv(p, "layer1_outconv", x1)
    x1_out = _out_conv2(p, "layer1_outconv2", x1_out + _upsample2x(x2_out))
    return x3_out, x1_out


# ---------------------------------------------------------------------------
# positional encoding (loftr/utils/position_encoding.py, temp_bug_fix)
# ---------------------------------------------------------------------------


def sine_position_encoding(h: int, w: int, d: int = D_COARSE) -> np.ndarray:
    """(h, w, d), the PositionEncodingSine table (temp_bug_fix=True —
    the form the published outdoor weights were trained with)."""
    pe = np.zeros((h, w, d), np.float32)
    ypos = np.arange(h, dtype=np.float32)[:, None, None]
    xpos = np.arange(w, dtype=np.float32)[None, :, None]
    div = np.exp(np.arange(0, d // 2, 2, dtype=np.float32)
                 * (-math.log(10000.0) / (d // 2)))
    pe[:, :, 0::4] = np.sin(xpos * div)
    pe[:, :, 1::4] = np.cos(xpos * div)
    pe[:, :, 2::4] = np.sin(ypos * div)
    pe[:, :, 3::4] = np.cos(ypos * div)
    return pe


# ---------------------------------------------------------------------------
# coarse/fine transformer (loftr/loftr_module/transformer.py)
# ---------------------------------------------------------------------------


def _linear_attention(q, k, v):
    """elu-kernel linear attention (loftr/loftr_module/linear_attention.py).
    q, k, v: (b, n, h, d)."""
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    v_len = v.shape[1]
    v = v / v_len
    kv = jnp.einsum("nshd,nshv->nhdv", k, v)
    z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", q, k.sum(1)) + EPS_LIN_ATTN)
    return jnp.einsum("nlhd,nhdv,nlh->nlhv", q, kv, z) * v_len


def _encoder_layer(params, name, x, source, nhead=NHEAD):
    b, n, d = x.shape
    dim = d // nhead
    q = _linear(params, f"{name}.q_proj", x, bias=False)
    k = _linear(params, f"{name}.k_proj", source, bias=False)
    v = _linear(params, f"{name}.v_proj", source, bias=False)
    msg = _linear_attention(q.reshape(b, n, nhead, dim),
                            k.reshape(b, -1, nhead, dim),
                            v.reshape(b, -1, nhead, dim))
    msg = _linear(params, f"{name}.merge", msg.reshape(b, n, d), bias=False)
    msg = _ln(params, f"{name}.norm1", msg)
    msg = jnp.concatenate([x, msg], axis=-1)
    msg = jax.nn.relu(_linear(params, f"{name}.mlp.0", msg, bias=False))
    msg = _linear(params, f"{name}.mlp.2", msg, bias=False)
    msg = _ln(params, f"{name}.norm2", msg)
    return x + msg


def local_feature_transformer(params, prefix, f0, f1, layer_names):
    for i, kind in enumerate(layer_names):
        name = f"{prefix}.layers.{i}"
        if kind == "self":
            f0 = _encoder_layer(params, name, f0, f0)
            f1 = _encoder_layer(params, name, f1, f1)
        else:
            f0n = _encoder_layer(params, name, f0, f1)
            f1 = _encoder_layer(params, name, f1, f0)
            f0 = f0n
    return f0, f1


# ---------------------------------------------------------------------------
# coarse matching (loftr/utils/coarse_matching.py, dual_softmax)
# ---------------------------------------------------------------------------


def coarse_match_confidence(f0, f1, valid0=None, valid1=None):
    """Dual-softmax confidence matrix (b, L, S). valid*: (b, L) bool —
    padded cells (non-multiple-of-8 inputs) are excluded."""
    f0 = f0 / (f0.shape[-1] ** 0.5)
    f1 = f1 / (f1.shape[-1] ** 0.5)
    sim = jnp.einsum("nlc,nsc->nls", f0, f1) / DS_TEMPERATURE
    if valid0 is not None:
        sim = jnp.where(valid0[:, :, None], sim, -1e9)
    if valid1 is not None:
        sim = jnp.where(valid1[:, None, :], sim, -1e9)
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


def _border_mask(hc, wc, border: int) -> np.ndarray:
    """(hc*wc,) bool: True for cells at least `border` away from every
    edge (mask_border in the original)."""
    m = np.zeros((hc, wc), bool)
    if hc > 2 * border and wc > 2 * border:
        m[border:hc - border, border:wc - border] = True
    else:  # degenerate strips: keep everything rather than nothing
        m[:] = True
    return m.reshape(-1)


def mutual_nearest_matches(conf, hw0, hw1, thr=MATCH_THR, border=BORDER_RM):
    """conf: (L, S) for ONE pair -> (idx0, idx1, mconf, valid) fixed-size
    arrays of length L (mask `valid`). Mutual-NN + threshold + border
    removal, matching CoarseMatching.get_coarse_match."""
    hc0, wc0 = hw0
    hc1, wc1 = hw1
    b0 = jnp.asarray(_border_mask(hc0, wc0, border))
    b1 = jnp.asarray(_border_mask(hc1, wc1, border))
    mask = conf > thr
    mask = mask & (conf == conf.max(axis=1, keepdims=True))
    mask = mask & (conf == conf.max(axis=0, keepdims=True))
    mask = mask & b0[:, None] & b1[None, :]
    # row-wise: each row has at most one True after mutual-NN
    idx1 = jnp.argmax(mask, axis=1)
    valid = mask.max(axis=1)
    mconf = jnp.where(valid, conf[jnp.arange(conf.shape[0]), idx1], 0.0)
    idx0 = jnp.arange(conf.shape[0])
    return idx0, idx1, mconf, valid


# ---------------------------------------------------------------------------
# fine preprocess + matching (loftr/loftr_module/fine_preprocess.py,
# loftr/utils/fine_matching.py)
# ---------------------------------------------------------------------------


def _unfold_windows(feat, idx, hc, wc, w=FINE_WINDOW, stride=2):
    """feat: (hf, wf, c) fine map; idx: (L,) coarse cell ids. Crop the
    w x w window centred on each coarse cell (stride = fine cells per
    coarse cell / 4 ... = hf / hc = 4 at 1/2 vs 1/8 -> the original
    unfolds with kernel w, stride=w_f//w_c=4, padding w//2). Returns
    (L, w*w, c)."""
    hf, wf, c = feat.shape
    s = hf // hc  # fine cells per coarse cell (4)
    pad = w // 2
    fpad = jnp.pad(feat, ((pad, pad), (pad, pad), (0, 0)))
    ys = (idx // wc) * s
    xs = (idx % wc) * s

    def crop(y, x):
        return jax.lax.dynamic_slice(fpad, (y, x, 0), (w, w, c))
    wins = jax.vmap(crop)(ys, xs)
    return wins.reshape(-1, w * w, c)


def fine_refine(params, fine0, fine1, idx0, idx1, hw0_c, hw1_c,
                coarse0=None, coarse1=None):
    """Window crop + optional coarse-context merge + fine transformer +
    spatial-expectation refinement. Returns per-match (dy, dx) in FINE
    pixels for image1 (image0 keypoints stay at window centres).
    fine*: (hf, wf, 128); coarse*: (L_all, 256) post-transformer
    features for cat_c_feat (fine_concat_coarse_feat=True outdoors)."""
    w = FINE_WINDOW
    f0 = _unfold_windows(fine0, idx0, *hw0_c, w=w)
    f1 = _unfold_windows(fine1, idx1, *hw1_c, w=w)

    if coarse0 is not None and "fine_preprocess.down_proj.weight" in params:
        c0 = _linear(params, "fine_preprocess.down_proj", coarse0[idx0])
        c1 = _linear(params, "fine_preprocess.down_proj", coarse1[idx1])
        ctx = jnp.concatenate([c0, c1], 0)[:, None, :]          # (2L,1,128)
        feats = jnp.concatenate([f0, f1], 0)                    # (2L,ww,128)
        merged = _linear(params, "fine_preprocess.merge_feat",
                         jnp.concatenate(
                             [feats, jnp.broadcast_to(
                                 ctx, feats.shape)], axis=-1))
        f0, f1 = jnp.split(merged, 2, axis=0)

    f0, f1 = local_feature_transformer(params, "loftr_fine", f0, f1,
                                       FINE_LAYERS)

    # FineMatching: centre feature of window0 vs all of window1
    centre = f0[:, w * w // 2, :]                                # (L, c)
    sim = jnp.einsum("lc,lwc->lw", centre, f1) / (f1.shape[-1] ** 0.5)
    heat = jax.nn.softmax(sim / 1.0, axis=-1).reshape(-1, w, w)
    grid = (jnp.arange(w, dtype=jnp.float32) - (w // 2))
    dy = (heat.sum(2) * grid).sum(-1)
    dx = (heat.sum(1) * grid).sum(-1)
    return dy, dx


# ---------------------------------------------------------------------------
# full matcher
# ---------------------------------------------------------------------------


def _pad_to_mult8(img):
    h, w = img.shape[:2]
    H = math.ceil(h / 8) * 8
    W = math.ceil(w / 8) * 8
    out = np.zeros((H, W) + img.shape[2:], np.float32)
    out[:h, :w] = img
    return out, (h, w)


def _coarse_valid(hw_real, hw_pad) -> np.ndarray:
    """(hc*wc,) bool marking coarse cells fully inside the real image."""
    hc, wc = hw_pad[0] // 8, hw_pad[1] // 8
    hr, wr = hw_real[0] // 8, math.ceil(hw_real[1] / 8)
    m = np.zeros((hc, wc), bool)
    m[:hr, :wr] = True
    return m.reshape(-1)


class LoFTRMatcher:
    """match(img0, img1) -> {keypoints0, keypoints1, confidence} for
    grayscale [0,1] HxW numpy images — the kornia-LoFTR call surface the
    consistency metric needs (metrics_consistency_sift.py:151-156)."""

    def __init__(self, params: Dict[str, Any], use_fine: bool = True):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.use_fine = use_fine
        self._jit = jax.jit(self._forward,
                            static_argnames=("hw0", "hw1"))

    @classmethod
    def from_npz(cls, npz_path: str) -> "LoFTRMatcher":
        data = np.load(npz_path)
        return cls({k: data[k] for k in data.files})

    def _forward(self, img0, img1, hw0: Tuple[int, int],
                 hw1: Tuple[int, int]):
        p = self.params
        hc0 = (img0.shape[0] // 8, img0.shape[1] // 8)
        hc1 = (img1.shape[0] // 8, img1.shape[1] // 8)
        c0, f0 = backbone_fpn(p, img0[None, :, :, None])
        c1, f1 = backbone_fpn(p, img1[None, :, :, None])
        pe0 = jnp.asarray(sine_position_encoding(*hc0))
        pe1 = jnp.asarray(sine_position_encoding(*hc1))
        t0 = (c0[0] + pe0).reshape(1, -1, D_COARSE)
        t1 = (c1[0] + pe1).reshape(1, -1, D_COARSE)
        v0 = jnp.asarray(_coarse_valid(hw0, img0.shape[:2]))
        v1 = jnp.asarray(_coarse_valid(hw1, img1.shape[:2]))
        t0, t1 = local_feature_transformer(p, "loftr_coarse", t0, t1,
                                           COARSE_LAYERS)
        conf = coarse_match_confidence(t0, t1, v0[None], v1[None])[0]
        idx0, idx1, mconf, valid = mutual_nearest_matches(conf, hc0, hc1)
        dy = dx = jnp.zeros_like(mconf)
        if self.use_fine and "loftr_fine.layers.0.q_proj.weight" in p:
            dy, dx = fine_refine(p, f0[0], f1[0], idx0, idx1, hc0, hc1,
                                 coarse0=t0[0], coarse1=t1[0])
        return idx0, idx1, mconf, valid, dy, dx

    def __call__(self, img0: np.ndarray, img1: np.ndarray):
        p0, hw0 = _pad_to_mult8(np.asarray(img0, np.float32))
        p1, hw1 = _pad_to_mult8(np.asarray(img1, np.float32))
        idx0, idx1, mconf, valid, dy, dx = map(np.asarray, self._jit(
            jnp.asarray(p0), jnp.asarray(p1), hw0=hw0, hw1=hw1))
        keep = valid.astype(bool)
        wc0 = p0.shape[1] // 8
        wc1 = p1.shape[1] // 8
        i0, i1 = idx0[keep], idx1[keep]
        # coarse cell centres in original pixels (scale 8), + fine delta
        # on image1 (scale: fine grid is 1/2 res -> 2 px per fine cell)
        k0 = np.stack([(i0 % wc0) * 8, (i0 // wc0) * 8], -1).astype(np.float32)
        k1 = np.stack([(i1 % wc1) * 8 + dx[keep] * 2,
                       (i1 // wc1) * 8 + dy[keep] * 2], -1).astype(np.float32)
        return {"keypoints0": k0, "keypoints1": k1,
                "confidence": mconf[keep].astype(np.float32)}


# ---------------------------------------------------------------------------
# weight conversion (kornia / original-repo checkpoint -> npz)
# ---------------------------------------------------------------------------

_TORCH_KEYS_REQUIRED_PREFIXES = ("backbone.", "loftr_coarse.",
                                 "loftr_fine.", "fine_preprocess.")


def convert_loftr_weights(ckpt_path: str, out_npz: str,
                          self_check: bool = True) -> Dict[str, np.ndarray]:
    """Convert a LoFTR checkpoint (kornia's loftr_outdoor.ckpt or the
    original repo's, either raw or under 'state_dict' with an optional
    'matcher.' prefix) to the npz this module loads.

    Layout changes only: conv (O,I,kh,kw)->(kh,kw,I,O), linear
    (O,I)->(I,O); everything else copies. Unknown keys fail loudly so a
    mismatched upstream format is diagnosed, never half-converted."""
    import torch
    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    out: Dict[str, np.ndarray] = {}
    skipped, unknown = [], []
    for key, ten in sd.items():
        k = key[len("matcher."):] if key.startswith("matcher.") else key
        a = ten.detach().numpy()
        if k.endswith("num_batches_tracked"):
            continue
        if not k.startswith(_TORCH_KEYS_REQUIRED_PREFIXES):
            skipped.append(k)  # e.g. pos_encoding buffers (recomputed)
            continue
        if a.ndim == 4:
            a = a.transpose(2, 3, 1, 0)           # conv -> HWIO
        elif a.ndim == 2 and k.endswith(".weight"):
            a = a.T                               # linear -> (I, O)
        out[k] = a
    missing = [k for k in ("backbone.conv1.weight",
                           "loftr_coarse.layers.0.q_proj.weight")
               if k not in out]
    if missing:
        raise ValueError(
            f"checkpoint at {ckpt_path} lacks expected LoFTR keys "
            f"{missing}; found prefixes: "
            f"{sorted({k.split('.')[0] for k in sd})}")
    if unknown:
        raise ValueError(f"unconverted keys: {unknown[:10]}")
    if skipped:
        print(f"[loftr] skipped {len(skipped)} non-weight keys "
              f"(pos-encoding buffers etc): {skipped[:5]}")
    np.savez(out_npz, **out)
    if self_check:
        _converter_self_check(ckpt_path, out)
    return out


def _converter_self_check(ckpt_path: str, params: Dict[str, np.ndarray],
                          atol: float = 5e-3):
    """Run kornia's LoFTR and this port on the same random pair and
    assert the match confidences agree. Requires kornia (not in this
    image — gated exactly like metrics/inception._converter_self_check)."""
    try:
        import torch
        from kornia.feature import LoFTR as KorniaLoFTR
    except ImportError:
        print("[loftr] kornia not importable — converter self-check "
              "skipped (run it wherever kornia + the ckpt live)")
        return
    matcher = KorniaLoFTR(pretrained=None)
    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    sd = {k[len("matcher."):] if k.startswith("matcher.") else k: v
          for k, v in sd.items()}
    matcher.load_state_dict(sd)
    matcher.eval()
    rng = np.random.default_rng(0)
    a = rng.random((128, 128), np.float32)
    b = np.roll(a, 4, axis=1)
    with torch.inference_mode():
        ref = matcher({"image0": torch.from_numpy(a)[None, None],
                       "image1": torch.from_numpy(b)[None, None]})
    ours = LoFTRMatcher(params)(a, b)
    ref_conf = np.sort(ref["confidence"].numpy())
    our_conf = np.sort(ours["confidence"])
    n = min(len(ref_conf), len(our_conf))
    assert n > 0, "self-check produced no matches on either side"
    err = float(np.abs(ref_conf[-n:] - our_conf[-n:]).max())
    assert err < atol, f"loftr converter self-check failed: {err}"
    print(f"[loftr] self-check ok: {n} matches, max conf err {err:.2e}")


def init_random_params(rng: np.random.Generator,
                       fine: bool = True) -> Dict[str, np.ndarray]:
    """Random parameter tree with the exact converted-checkpoint
    structure — lets architecture tests (and the consistency-metric
    plumbing) run without the gated weights."""
    p: Dict[str, np.ndarray] = {}

    def conv(name, ci, co, k):
        p[f"{name}.weight"] = (rng.standard_normal((k, k, ci, co))
                               * (1.0 / math.sqrt(k * k * ci))
                               ).astype(np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = np.zeros(c, np.float32)
        p[f"{name}.running_var"] = np.ones(c, np.float32)

    def block(name, ci, co, downsample):
        conv(f"{name}.conv1", ci, co, 3)
        bn(f"{name}.bn1", co)
        conv(f"{name}.conv2", co, co, 3)
        bn(f"{name}.bn2", co)
        if downsample:
            conv(f"{name}.downsample.0", ci, co, 1)
            bn(f"{name}.downsample.1", co)

    d0, d1, d2 = BLOCK_DIMS
    conv("backbone.conv1", 1, INITIAL_DIM, 7)
    bn("backbone.bn1", INITIAL_DIM)
    block("backbone.layer1.0", INITIAL_DIM, d0, False)
    block("backbone.layer1.1", d0, d0, False)
    block("backbone.layer2.0", d0, d1, True)
    block("backbone.layer2.1", d1, d1, False)
    block("backbone.layer3.0", d1, d2, True)
    block("backbone.layer3.1", d2, d2, False)
    conv("backbone.layer3_outconv", d2, d2, 1)
    conv("backbone.layer2_outconv", d1, d2, 1)
    conv("backbone.layer2_outconv2.0", d2, d2, 3)
    bn("backbone.layer2_outconv2.1", d2)
    conv("backbone.layer2_outconv2.3", d2, d1, 3)
    conv("backbone.layer1_outconv", d0, d1, 1)
    conv("backbone.layer1_outconv2.0", d1, d1, 3)
    bn("backbone.layer1_outconv2.1", d1)
    conv("backbone.layer1_outconv2.3", d1, d0, 3)

    def lin(name, ci, co, bias=False):
        p[f"{name}.weight"] = (rng.standard_normal((ci, co))
                               / math.sqrt(ci)).astype(np.float32)
        if bias:
            p[f"{name}.bias"] = np.zeros(co, np.float32)

    def ln(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)

    def enc_layer(name, d):
        lin(f"{name}.q_proj", d, d)
        lin(f"{name}.k_proj", d, d)
        lin(f"{name}.v_proj", d, d)
        lin(f"{name}.merge", d, d)
        lin(f"{name}.mlp.0", 2 * d, 2 * d)
        lin(f"{name}.mlp.2", 2 * d, d)
        ln(f"{name}.norm1", d)
        ln(f"{name}.norm2", d)

    for i in range(len(COARSE_LAYERS)):
        enc_layer(f"loftr_coarse.layers.{i}", D_COARSE)
    if fine:
        for i in range(len(FINE_LAYERS)):
            enc_layer(f"loftr_fine.layers.{i}", D_FINE)
        lin("fine_preprocess.down_proj", D_COARSE, D_FINE, bias=True)
        lin("fine_preprocess.merge_feat", 2 * D_FINE, D_FINE, bias=True)
    return p
