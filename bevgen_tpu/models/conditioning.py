"""Auxiliary conditioning encoders.

Reference: utils/taming_utils.py:103-131 — `Labelator` (class-label ->
one-token conditioning "code") and `SOSProvider` (constant start-of-
sequence token), used by the unconditional/class-conditional Net2Net
variants.
"""
from __future__ import annotations

import jax.numpy as jnp


class Labelator:
    """Class label -> quantized one-token conditioning
    (taming_utils.py:103-116)."""

    def __init__(self, n_classes: int, quantize_interface: bool = True):
        self.n_classes = n_classes
        self.quantize_interface = quantize_interface

    def encode(self, labels):
        c = jnp.asarray(labels, jnp.int32).reshape(-1, 1)
        if self.quantize_interface:
            return c, None, c
        return c


class SOSProvider:
    """Constant start-of-sequence token (taming_utils.py:117-131)."""

    def __init__(self, sos_token: int, quantize_interface: bool = True):
        self.sos_token = sos_token
        self.quantize_interface = quantize_interface

    def encode(self, x):
        b = x.shape[0]
        c = jnp.full((b, 1), self.sos_token, jnp.int32)
        if self.quantize_interface:
            return c, None, c
        return c
