"""Production inference: AOT-compiled forwards and portable artifacts.

The reference has no deployment story beyond ``model.eval()``; serving a
neural operator on TPU wants three things the training path does not
give you directly:

1. **Ahead-of-time compilation** — ``jax.jit`` compiles on first call,
   which on a remote-relayed TPU can take minutes; a serving process
   should pay that cost at load time, not on the first request.
   ``CompiledForward`` lowers and compiles the forward for a fixed set
   of batch-size buckets up front.
2. **Static shapes under a dynamic request stream** — XLA/TPU programs
   are shape-specialized. ``CompiledForward`` pads each request batch up
   to the smallest compiled bucket and slices the result back, so any
   request size in ``[1, max(batch_sizes)]`` hits a pre-compiled
   program (the classic bucketing recipe, e.g. TF-Serving / JetStream).
3. **A portable artifact** — ``export_forward`` serializes the forward
   (weights baked in as constants) to a StableHLO artifact via
   ``jax.export``; ``load_exported`` runs it without the model class,
   the flax params tree, or even this package on the serving host.

No reference counterpart (ahead of reference); closest intent is the
inference use of ``Trainer.evaluate``
(/root/reference/neuralop/training/trainer.py:589-671).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = [
    "CompiledForward",
    "export_forward",
    "load_exported",
    "quantize_params_int8",
]


# leaves smaller than this stay in full precision: biases and norm
# scales are a rounding error of the weight bytes but carry outsized
# numerical sensitivity
_QUANT_MIN_SIZE = 4096


def quantize_params_int8(params, dequant_dtype=jnp.bfloat16):
    """Weight-only int8 quantization for serving.

    Each floating leaf with >= ``_QUANT_MIN_SIZE`` elements is stored as
    symmetric per-row int8 (absmax scale over the last axis); small
    leaves (biases, norms) stay untouched. Returns a pytree of
    ``(int8_or_raw_leaf, scale_or_None)`` pairs;
    :func:`dequantize_params` reverses it inside the compiled forward.
    4x less weight HBM than f32 (2x vs bf16) at the cost of per-row
    rounding error; measure quality per-model before shipping
    (``CompiledForward(quantize='int8')`` makes the A/B a one-liner).
    """
    def q(a):
        if (
            not jnp.issubdtype(a.dtype, jnp.floating)
            or a.size < _QUANT_MIN_SIZE
            or a.ndim < 1
        ):
            return a, None
        s = jnp.max(jnp.abs(a), axis=-1, keepdims=True).astype(jnp.float32)
        s = jnp.maximum(s, 1e-30)
        qa = jnp.clip(
            jnp.round(a.astype(jnp.float32) / s * 127.0), -127, 127
        ).astype(jnp.int8)
        return qa, s

    del dequant_dtype  # recorded at dequant time
    return jax.tree_util.tree_map(q, params)


def dequantize_params(qtree, dequant_dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_params_int8` (runs inside the compiled
    forward, so the dequantized copy lives only transiently in VMEM/HBM
    for the duration of the program)."""
    def dq(pair):
        qa, s = pair
        if s is None:
            return qa
        return (qa.astype(jnp.float32) * (s / 127.0)).astype(dequant_dtype)

    return jax.tree_util.tree_map(
        dq, qtree, is_leaf=lambda x: isinstance(x, tuple)
    )


def _round_up_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(
        f"request batch {n} exceeds the largest compiled bucket "
        f"{buckets[-1]}; construct CompiledForward with a larger "
        f"batch_sizes entry"
    )


class CompiledForward:
    """AOT-compiled, batch-bucketed forward for serving.

    Parameters
    ----------
    model : flax module with ``.apply``
    params : parameter pytree (device-put once at construction)
    example_input : array ``(b, ...)`` fixing every non-batch dim + dtype
    batch_sizes : bucket list (default ``(1, 8)``), sorted ascending;
        each gets its own compiled program at construction time
    param_dtype : optionally cast floating params (e.g. ``jnp.bfloat16``
        for weight-halved serving; quality characterization in
        BASELINE.md's mixed-precision study)
    quantize : ``'int8'`` stores large weight leaves as symmetric
        per-row int8 (4x less weight HBM than f32) and dequantizes to
        bf16 inside each compiled program — weight-only quantization;
        activations/matmuls stay bf16. A/B output error before shipping.
    preprocess_fn : optional function applied to the input *inside* the
        compiled program — use it to bake the training-time encoder into
        the endpoint (e.g. ``data_processor.in_normalizer.transform``),
        otherwise a model trained with ``encode_input=True`` expects
        pre-normalized requests
    postprocess_fn : optional function applied to the model output
        *inside* the compiled program — use it to bake the training-time
        decoder into the endpoint (e.g.
        ``data_processor.out_normalizer.inverse_transform``), otherwise
        a model trained with ``encode_output=True`` serves
        normalized-space predictions
    mesh : optional ``jax.sharding.Mesh`` for multi-chip serving:
        params are replicated and each bucket's batch axis is sharded
        over the ``'data'`` mesh axis (every bucket must be divisible
        by it) — XLA then runs the forward data-parallel with no code
        change in the model
    apply_kwargs : static kwargs forwarded to ``model.apply``

    Output leaves whose leading axis is the batch axis are sliced back
    to the request size; leaves without a leading batch axis (aux
    outputs) pass through unchanged — note such aux values were computed
    on the zero-padded batch.
    """

    def __init__(
        self,
        model,
        params,
        example_input,
        batch_sizes: Sequence[int] = (1, 8),
        param_dtype=None,
        quantize: Optional[str] = None,
        preprocess_fn: Optional[Callable] = None,
        postprocess_fn: Optional[Callable] = None,
        mesh=None,
        **apply_kwargs,
    ):
        if param_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(param_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                params,
            )
        dequant = None
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unsupported quantize={quantize!r}")
            # weight-only int8: stored as (int8, per-row scale) pairs,
            # dequantized to bf16 inside each compiled program
            params = quantize_params_int8(params)
            dequant = lambda p: dequantize_params(p)  # noqa: E731
        self.batch_sizes = tuple(sorted(int(b) for b in batch_sizes))
        feat_shape = tuple(example_input.shape[1:])
        dtype = example_input.dtype
        in_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape.get("data", 1)
            for b in self.batch_sizes:
                if b % n_data:
                    raise ValueError(
                        f"bucket {b} not divisible by the 'data' mesh "
                        f"axis size {n_data}"
                    )
            params = jax.device_put(params, NamedSharding(mesh, P()))
            in_sharding = NamedSharding(
                mesh, P("data", *([None] * len(feat_shape)))
            )
        self._params = jax.device_put(params)

        def fwd(p, x):
            if dequant is not None:
                p = dequant(p)
            if preprocess_fn is not None:
                x = preprocess_fn(x)
            out = model.apply({"params": p}, x, **apply_kwargs)
            return postprocess_fn(out) if postprocess_fn is not None else out

        self._compiled = {}
        self.compile_seconds = {}
        self._feat_shape, self._dtype = feat_shape, dtype
        jitted = jax.jit(fwd)
        for b in self.batch_sizes:
            spec = jax.ShapeDtypeStruct(
                (b,) + feat_shape, dtype, sharding=in_sharding
            )
            t0 = time.perf_counter()
            self._compiled[b] = jitted.lower(self._params, spec).compile()
            self.compile_seconds[b] = time.perf_counter() - t0

    def __call__(self, x):
        n = x.shape[0]
        b = _round_up_bucket(n, self.batch_sizes)
        if b != n:
            pad = [(0, b - n)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, pad)
        out = self._compiled[b](self._params, x)
        return jax.tree_util.tree_map(
            lambda o: o[:n]
            if getattr(o, "ndim", 0) >= 1 and o.shape[0] == b
            else o,
            out,
        )

    def latency_probe(self, batch_size: Optional[int] = None, iters: int = 10):
        """Measured end-to-end latency (s) per request at one bucket.

        ``batch_size`` must be a compiled bucket (default: the smallest)
        so the reported number is labeled by the program that actually
        ran. Forces a host transfer per iteration — on relay-attached
        runtimes ``block_until_ready`` alone does not wait for device
        compute (see CLAUDE.md), so this is the honest serving number.
        """
        if batch_size is None:
            b = self.batch_sizes[0]
        elif batch_size in self.batch_sizes:
            b = batch_size
        else:
            raise ValueError(
                f"batch_size {batch_size} is not a compiled bucket "
                f"{self.batch_sizes}; probe an exact bucket so the "
                f"latency is attributed to the right program"
            )
        x = jnp.zeros((b,) + self._feat_shape, self._dtype)
        first = self._compiled[b](self._params, x)
        float(jnp.asarray(jax.tree_util.tree_leaves(first)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self._compiled[b](self._params, x)
            float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / iters


def export_forward(
    model,
    params,
    example_input,
    path: Optional[str] = None,
    polymorphic_batch: bool = True,
    platforms: Optional[Sequence[str]] = None,
    preprocess_fn: Optional[Callable] = None,
    postprocess_fn: Optional[Callable] = None,
    **apply_kwargs,
) -> bytes:
    """Serialize the forward to a portable StableHLO artifact.

    The parameters are baked into the artifact as constants, so the
    serving host needs neither the model class nor the params tree.
    With ``polymorphic_batch`` the leading dim is exported symbolically
    (any batch size runs); set it False for a shape-specialized
    artifact. ``platforms`` pins lowering targets (e.g.
    ``("tpu", "cpu")``); default is the exporting process's backend.

    Returns the serialized bytes; also writes them to ``path`` if given.
    ``postprocess_fn`` (e.g. the training normalizer's
    ``inverse_transform``) is baked into the artifact — without it a
    model trained with ``encode_output=True`` serves normalized-space
    predictions.
    """

    def fwd(x):
        if preprocess_fn is not None:
            x = preprocess_fn(x)
        out = model.apply({"params": params}, x, **apply_kwargs)
        return postprocess_fn(out) if postprocess_fn is not None else out

    feat_shape = tuple(example_input.shape[1:])
    if polymorphic_batch:
        (batch,) = jax_export.symbolic_shape("b")
        shape = (batch,) + feat_shape
    else:
        shape = tuple(example_input.shape)
    spec = jax.ShapeDtypeStruct(shape, example_input.dtype)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jax_export.export(jax.jit(fwd), **kwargs)(spec)
    blob = exported.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def load_exported(path_or_bytes) -> Callable:
    """Load an ``export_forward`` artifact into a jitted callable."""
    blob = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else Path(path_or_bytes).read_bytes()
    )
    exported = jax_export.deserialize(bytes(blob))
    return jax.jit(exported.call)
