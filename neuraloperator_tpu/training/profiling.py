"""Profiling and throughput instrumentation.

The reference has no built-in profiling (SURVEY §5: ad-hoc timeit in the
trainer, a torchtnt FLOP recipe in the docs). Here profiling is first-class:
``trace`` wraps a block in a ``jax.profiler`` trace viewable in
TensorBoard/XProf, ``ThroughputMeter`` tracks steps/sec and
samples/sec, and ``flops_per_fno_step`` gives the analytic FLOP count of an
FNO training step for MFU-style utilization reporting.
"""

import contextlib
import math
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/neuraloperator_tpu_trace"):
    """Profile a block: `with trace(): step(...)` -> TensorBoard trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Steps/sec and samples/sec over a sliding window."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self):
        self._t0 = None
        self._steps = 0
        self._samples = 0

    def step(self, n_samples: int = 0):
        self._steps += 1
        if self._steps == self.warmup_steps:
            self._t0 = time.perf_counter()
            self._steps_at_t0 = self._steps
            self._samples_at_t0 = self._samples
        self._samples += n_samples

    @property
    def steps_per_sec(self) -> Optional[float]:
        if self._t0 is None or self._steps <= self._steps_at_t0:
            return None
        return (self._steps - self._steps_at_t0) / (
            time.perf_counter() - self._t0
        )

    @property
    def samples_per_sec(self) -> Optional[float]:
        sps = self.steps_per_sec
        if sps is None or self._steps == 0:
            return None
        return (self._samples - self._samples_at_t0) / (
            time.perf_counter() - self._t0
        )


def flops_per_fno_step(
    batch: int,
    resolution,
    n_modes,
    hidden_channels: int,
    n_layers: int,
    in_channels: int = 1,
    out_channels: int = 1,
    lifting_ratio: float = 2,
    projection_ratio: float = 2,
    training: bool = True,
) -> float:
    """Analytic FLOPs of one FNO forward (x3 for fwd+bwd if training).

    Counts the mode contraction (complex ~ 8 real flops per MAC), the FFTs
    (5 N log2 N per transform) and the pointwise MLPs.
    """
    if isinstance(resolution, int):
        resolution = [resolution] * len(n_modes)
    S = math.prod(resolution)
    kept = math.prod(
        [m if i < len(n_modes) - 1 else m // 2 + 1 for i, m in enumerate(n_modes)]
    )
    C = hidden_channels
    # contraction: per layer, kept modes x C x C complex MACs
    contract = n_layers * kept * C * C * 8 * batch
    # ffts: fwd+inv per layer over C channels
    fft = n_layers * 2 * C * batch * 5 * S * math.log2(max(S, 2))
    # lifting/projection/channel mlps (pointwise)
    lift = batch * S * (in_channels + len(n_modes)) * lifting_ratio * C * 2
    lift += batch * S * lifting_ratio * C * C * 2
    proj = batch * S * C * projection_ratio * C * 2
    proj += batch * S * projection_ratio * C * out_channels * 2
    mlp = n_layers * batch * S * (C * C // 2) * 2 * 2
    total = contract + fft + lift + proj + mlp
    return 3.0 * total if training else total
