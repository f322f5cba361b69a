"""Parameterless encodings: Identity, Empty, Frequency, TriangleWave, OneBlob.

Pure-jnp implementations; XLA fuses them into surrounding computation, which
is the TPU equivalent of the reference's single elementwise kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..common import PI
from .base import Encoding


class IdentityEncoding(Encoding):
    """y = x * scale + offset (reference: encodings/identity.h:46-85)."""

    otype = "Identity"
    pad_value = 1.0

    def __init__(self, n_dims_to_encode: int, scale: float = 1.0, offset: float = 0.0):
        super().__init__(n_dims_to_encode)
        self.scale = float(scale)
        self.offset = float(offset)
        self.n_output_dims = n_dims_to_encode

    def apply(self, params, x):
        return self._pad(x.astype(jnp.float32) * self.scale + self.offset)

    def hyperparams(self):
        return {"otype": self.otype, "scale": self.scale, "offset": self.offset}


class EmptyEncoding(Encoding):
    """Swallows inputs, emits only padding (reference: encodings/empty.h:46-92)."""

    otype = "Empty"
    pad_value = 1.0

    def __init__(self, n_dims_to_encode: int):
        super().__init__(n_dims_to_encode)
        self.n_output_dims = 0

    def apply(self, params, x):
        y = jnp.zeros((x.shape[0], 0), jnp.float32)
        # Gradient wrt x is zero by construction (x is unused).
        return self._pad(y)


class FrequencyEncoding(Encoding):
    """NeRF-style sin/cos frequency encoding
    (reference: encodings/frequency.h:46-103).

    Per input dim d and frequency k: output pairs
    ``sin(2^k * pi * x_d)``, ``cos(2^k * pi * x_d)`` — the cosine realized as
    a pi/2 phase shift, ordered [d0k0sin, d0k0cos, d0k1sin, ...].
    """

    otype = "Frequency"
    pad_value = 1.0

    def __init__(self, n_frequencies: int, n_dims_to_encode: int):
        super().__init__(n_dims_to_encode)
        self.n_frequencies = int(n_frequencies)
        self.n_output_dims = n_dims_to_encode * self.n_frequencies * 2

    def apply(self, params, x):
        x = x.astype(jnp.float32)
        freq_scale = jnp.asarray(
            [2.0**k for k in range(self.n_frequencies)], jnp.float32
        )
        # (B, D, F)
        scaled = x[:, :, None] * freq_scale[None, None, :] * PI
        phased = jnp.stack(
            [jnp.sin(scaled), jnp.sin(scaled + PI / 2)], axis=-1
        )  # (B, D, F, 2): [sin, cos]
        y = phased.reshape(x.shape[0], self.n_output_dims)
        return self._pad(y)

    def hyperparams(self):
        return {"otype": self.otype, "n_frequencies": self.n_frequencies}


class TriangleWaveEncoding(Encoding):
    """Cheap triangle-wave alternative to Frequency, used by NRC
    (reference: encodings/triangle_wave.h:46-81).

    Per dim d, frequency k: ``tri(x * 2^(k-1) + k * 0.25)`` where
    ``tri(v) = |v - floor(v) - 0.5| * 4 - 1``.
    """

    otype = "TriangleWave"
    pad_value = 1.0

    def __init__(self, n_frequencies: int, n_dims_to_encode: int):
        super().__init__(n_dims_to_encode)
        self.n_frequencies = int(n_frequencies)
        self.n_output_dims = n_dims_to_encode * self.n_frequencies

    def apply(self, params, x):
        x = x.astype(jnp.float32)
        ks = np.arange(self.n_frequencies)
        freq_scale = jnp.asarray(2.0 ** (ks - 1.0), jnp.float32)
        phase = jnp.asarray(ks * 0.25, jnp.float32)
        val = x[:, :, None] * freq_scale[None, None, :] + phase[None, None, :]
        result = jnp.abs(val - jnp.floor(val) - 0.5) * 4.0 - 1.0
        y = result.reshape(x.shape[0], self.n_output_dims)
        return self._pad(y)

    def hyperparams(self):
        return {"otype": self.otype, "n_frequencies": self.n_frequencies}


def _quartic_cdf(x, inv_radius):
    """CDF of the quartic kernel (reference: common_device.h:1080-1095)."""
    u = x * inv_radius
    u2 = u * u
    u4 = u2 * u2
    return jnp.clip(
        (15.0 / 16.0) * u * (1.0 - (2.0 / 3.0) * u2 + (1.0 / 5.0) * u4) + 0.5,
        0.0,
        1.0,
    )


class OneBlobEncoding(Encoding):
    """OneBlob encoding (NRC / Neural Importance Sampling) with wraparound
    (reference: encodings/oneblob.h:47-127).

    Per input dim, n_bins outputs: integral of a quartic kernel centered at x
    over each bin [k/n, (k+1)/n), with wraparound contributions from x-1 and
    x+1 so the encoding is periodic on [0, 1).
    """

    otype = "OneBlob"
    pad_value = 1.0

    def __init__(self, n_bins: int, n_dims_to_encode: int):
        super().__init__(n_dims_to_encode)
        if n_bins <= 0 or (n_bins & (n_bins - 1)) != 0:
            raise ValueError("OneBlob: n_bins must be a power of two")
        self.n_bins = int(n_bins)
        self.n_output_dims = n_dims_to_encode * self.n_bins

    def apply(self, params, x):
        x = x.astype(jnp.float32)
        n = self.n_bins
        boundaries = jnp.asarray(np.arange(n + 1) / n, jnp.float32)  # (n+1,)
        # (B, D, n+1): wrapped CDF at every bin boundary
        arg = boundaries[None, None, :] - x[:, :, None]
        cdf = (
            _quartic_cdf(arg, n)
            + _quartic_cdf(arg - 1.0, n)
            + _quartic_cdf(arg + 1.0, n)
        )
        y = cdf[:, :, 1:] - cdf[:, :, :-1]
        # The wraparound means boundary n (== boundary 0 + 1) gains the +1
        # saturated mass lost at the left edge (oneblob.h:61-64): with the
        # three-term wrapped CDF above, cdf(1 - x) already includes it, so no
        # correction term is needed.
        return self._pad(y.reshape(x.shape[0], self.n_output_dims))

    def hyperparams(self):
        return {"otype": self.otype, "n_bins": self.n_bins}
