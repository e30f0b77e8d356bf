"""GPipe-style pipeline parallelism over the 'model' mesh axis.

Reference counterpart: none — the reference's only model parallelism is
scattering multigrid patches over the NCCL group
(``/root/reference/neuralop/training/patching.py:82-105``). Pipeline
parallelism is the TPU-native way to scale *depth*: stage ``s`` holds
``n_layers / n_stages`` consecutive Fourier layers, microbatches stream
through the stages, and activations hop between neighbouring devices over
ICI via ``lax.ppermute``. The schedule is plain GPipe: with ``M``
microbatches and ``S`` stages the pipeline runs ``M + S - 1`` ticks, so
utilisation is ``M / (M + S - 1)`` — pick ``M >= 4 * S`` to keep the
bubble small.

The loop is a single ``lax.scan`` of (stage-apply → ppermute), so the whole
forward is ONE compiled program and reverse-mode AD yields the matching
reverse pipeline schedule automatically (``ppermute`` transposes to the
reversed permutation) — no hand-written backward pass.

Composes with data parallelism: batch stays sharded over the 'data' axis
while activations stream over 'model' (each data-shard runs its own
pipeline replica over the same stage weights).

This targets the ``scan_layers=True`` FNO family, whose middle blocks are
a single traced layer with parameters stacked on a leading ``n_layers``
axis — exactly the layout pipeline stages shard (stage ``s`` takes rows
``[s*k, (s+1)*k)`` of every stacked parameter).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..layers.scan_fno_block import _ScanLayer

__all__ = ["gpipe", "pipelined_fno_forward"]


def gpipe(
    stage_fn: Callable,
    stage_args,
    x_mb: jnp.ndarray,
    *,
    n_stages: int,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Differentiable GPipe loop. Call INSIDE ``shard_map``.

    Args:
        stage_fn: ``stage_fn(stage_args, x) -> y`` applying this device's
            stage to one microbatch; must preserve shape and dtype.
        stage_args: per-stage parameters (already the LOCAL shard —
            ``shard_map`` with a leading-axis ``P(axis_name)`` spec).
        x_mb: ``[M, mb, ...]`` stacked microbatches, replicated across
            ``axis_name`` (shard other axes, e.g. 'data', freely).
        n_stages: static pipeline depth ``S`` (== mesh size of axis_name).
        axis_name: mesh axis the stages live on.

    Returns:
        ``[M, mb, ...]`` outputs, replicated across ``axis_name``.
    """
    stage = lax.axis_index(axis_name)
    n_mb = x_mb.shape[0]
    n_ticks = n_mb + n_stages - 1
    # ring shift stage i -> i+1; the wrap edge (S-1 -> 0) only ever carries
    # bubble garbage that stage 0 immediately overwrites with fresh input
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(state, t):
        inp = lax.dynamic_index_in_dim(
            x_mb, jnp.minimum(t, n_mb - 1), 0, keepdims=False
        )
        inp = jnp.where(stage == 0, inp, state)
        out = stage_fn(stage_args, inp)
        nxt = lax.ppermute(out, axis_name, perm)
        return nxt, out

    _, outs = lax.scan(tick, jnp.zeros_like(x_mb[0]), jnp.arange(n_ticks))
    # microbatch m exits the last stage at tick m + S - 1
    y = outs[n_stages - 1 :]
    return lax.psum(
        jnp.where(stage == n_stages - 1, y, jnp.zeros_like(y)), axis_name
    )


def _fno_stage_fn(layer: _ScanLayer) -> Callable:
    """Apply this stage's slice of stacked Fourier layers sequentially."""

    def stage_fn(stage_args, x):
        stacked_params, not_last_flags = stage_args

        def body(h, p_f):
            p, f = p_f
            # _ScanLayer.__call__ returns (x, None) — the nn.scan body
            # convention — so unpack the carry
            h, _ = layer.apply({"params": p}, h, f)
            return h, None

        x, _ = lax.scan(body, x, (stacked_params, not_last_flags))
        return x

    return stage_fn


def pipelined_fno_forward(
    model,
    params,
    x: jnp.ndarray,
    mesh,
    *,
    n_microbatches: int,
    data_axis: str = "data",
    model_axis: str = "model",
) -> jnp.ndarray:
    """Pipeline-parallel forward of a ``scan_layers=True`` FNO.

    The middle Fourier blocks run as ``mesh.shape[model_axis]`` pipeline
    stages (consecutive layers per stage); embedding/lifting/padding and
    unpad/projection are pointwise in space and tiny next to the blocks,
    so they run replicated over the model axis (batch sharding over
    ``data_axis`` still applies to them via ordinary jit).

    Numerically identical to ``model.apply`` on one device (same params,
    same order of operations per layer).

    Args:
        model: an ``FNO(..., scan_layers=True)`` instance with
            ``n_layers % n_stages == 0``.
        params: the model's params pytree (``fno_blocks/layers/...`` leaves
            carry the stacked leading ``n_layers`` axis).
        x: ``[B, C, *spatial]`` input; ``B % n_microbatches == 0`` and the
            microbatch size must stay divisible by the 'data' axis size.
        mesh: a ``('data', 'model')`` mesh (from ``parallel.mesh.init``).
        n_microbatches: GPipe microbatch count ``M``.
    """
    if not model.scan_layers:
        raise ValueError(
            "pipelined_fno_forward requires FNO(..., scan_layers=True) "
            "(stacked per-layer parameters)"
        )
    n_stages = mesh.shape[model_axis]
    n_layers = model.n_layers
    if n_layers % n_stages != 0:
        raise ValueError(
            f"n_layers={n_layers} not divisible by {n_stages} pipeline stages"
        )
    batch = x.shape[0]
    if batch % n_microbatches != 0:
        raise ValueError(
            f"batch {batch} not divisible by n_microbatches={n_microbatches}"
        )

    def pre(m, x):
        emb = m._embedding()
        if emb is not None:
            x = emb(x)
        x = m.lifting(x)
        dp = m._domain_padding()
        if dp is not None:
            x = dp.pad(x)
        return x

    def post(m, x):
        dp = m._domain_padding()
        if dp is not None:
            x = dp.unpad(x)
        return m.projection(x)

    h = model.apply({"params": params}, x, method=pre)

    mb = batch // n_microbatches
    h_mb = h.reshape((n_microbatches, mb) + h.shape[1:])

    stacked = params["fno_blocks"]["layers"]
    not_last = jnp.arange(n_layers) < n_layers - 1
    layer = _ScanLayer(
        channels=model.hidden_channels,
        n_modes=tuple(model.n_modes),
        fno_skip=model.fno_skip,
        channel_mlp_skip=model.channel_mlp_skip,
        channel_mlp_expansion=model.channel_mlp_expansion,
        non_linearity=model.non_linearity,
        max_n_modes=(
            tuple(model.max_n_modes) if model.max_n_modes is not None else None
        ),
        weight_dtype=model.weight_dtype,
    )
    stage_fn = _fno_stage_fn(layer)

    stacked_specs = jax.tree_util.tree_map(lambda _: P(model_axis), stacked)
    act_spec = P(None, data_axis)

    def pipe(stacked_local, flags_local, xmb):
        return gpipe(
            stage_fn,
            (stacked_local, flags_local),
            xmb,
            n_stages=n_stages,
            axis_name=model_axis,
        )

    y_mb = jax.shard_map(
        pipe,
        mesh=mesh,
        in_specs=(stacked_specs, P(model_axis), act_spec),
        out_specs=act_spec,
        check_vma=False,
    )(stacked, not_last, h_mb)

    y = y_mb.reshape((batch,) + y_mb.shape[2:])
    return model.apply({"params": params}, y, method=post)
