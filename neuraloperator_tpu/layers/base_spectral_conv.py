"""Base spectral convolution interface.

Equivalent of reference ``neuralop/layers/base_spectral_conv.py:4-27``: the
contract every spectral conv module satisfies — implement ``__call__`` and
``transform`` (skip-branch resolution matching).
"""

import flax.linen as nn


class BaseSpectralConv(nn.Module):
    """Interface: subclasses implement __call__(x, output_shape=None) and
    transform(x, output_shape=None)."""

    def transform(self, x, output_shape=None):
        raise NotImplementedError(
            "spectral conv modules must implement transform() to resample "
            "skip branches to the layer's output resolution"
        )
