"""N-dimensional Fourier Neural Operator (FNO / TFNO).

Equivalent of reference ``neuralop/models/fno.py``: positional grid
embedding -> lifting ChannelMLP -> optional domain padding -> ``n_layers``
FNOBlocks -> unpad -> projection ChannelMLP. TFNO = FNO with Tucker
factorization (rank 0.1) defaults.
"""

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..layers.channel_mlp import ChannelMLP, gelu
from ..layers.complex import ComplexValued
from ..layers.embeddings import GridEmbedding2D, GridEmbeddingND
from ..layers.fno_block import FNOBlocks
from ..layers.scan_fno_block import ScanFNOBlocks
from ..layers.padding import DomainPadding
from ..layers.spectral_convolution import SpectralConv
from .base_model import register_model

Number = Union[int, float]


@register_model(name="FNO")
class FNO(nn.Module):
    """See reference FNO docstring (models/fno.py:25-174) for parameter
    definitions; fields mirror it one-to-one. Callable-typed parameters
    (``non_linearity``, ``conv_module``) take the same defaults.
    """

    n_modes: Tuple[int, ...]
    in_channels: int
    out_channels: int
    hidden_channels: int
    n_layers: int = 4
    lifting_channel_ratio: Number = 2
    projection_channel_ratio: Number = 2
    positional_embedding: Union[str, None, GridEmbeddingND] = "grid"
    non_linearity: Callable = gelu
    norm: Optional[str] = None
    norm_groups: int = 1
    complex_data: bool = False
    use_channel_mlp: bool = True
    channel_mlp_dropout: float = 0.0
    channel_mlp_expansion: float = 0.5
    channel_mlp_skip: Optional[str] = "soft-gating"
    fno_skip: Optional[str] = "linear"
    conv_bias_kernel: int = 1
    resolution_scaling_factor: Union[None, Number, Tuple[Number, ...]] = None
    domain_padding: Union[None, Number, Tuple[Number, ...]] = None
    fno_block_precision: str = "full"
    stabilizer: Optional[str] = None
    max_n_modes: Optional[Tuple[int, ...]] = None
    factorization: Optional[str] = None
    rank: Union[float, Tuple[int, ...]] = 1.0
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    decomposition_kwargs: Optional[dict] = None
    separable: bool = False
    preactivation: bool = False
    conv_module: type = SpectralConv
    enforce_hermitian_symmetry: bool = True
    weight_dtype: str = "float32"
    scan_layers: bool = False
    remat: bool = False

    @property
    def n_dim(self) -> int:
        return len(self.n_modes)

    @property
    def lifting_channels(self) -> int:
        return int(self.lifting_channel_ratio * self.hidden_channels)

    @property
    def projection_channels(self) -> int:
        return int(self.projection_channel_ratio * self.hidden_channels)

    def _embedding(self):
        pe = self.positional_embedding
        if pe == "grid":
            return GridEmbeddingND(
                in_channels=self.in_channels,
                dim=self.n_dim,
                grid_boundaries=[[0.0, 1.0]] * self.n_dim,
            )
        if isinstance(pe, (GridEmbedding2D, GridEmbeddingND)):
            if isinstance(pe, GridEmbedding2D) and self.n_dim != 2:
                raise ValueError(
                    f"expected {self.n_dim}-d positional embedding, got 2-d"
                )
            return pe
        if pe is None:
            return None
        raise ValueError(
            f"positional_embedding must be 'grid', an embedding, or None; got {pe!r}"
        )

    def _domain_padding(self):
        dp = self.domain_padding
        if dp is None:
            return None
        nonzero = (
            sum(dp) > 0 if isinstance(dp, (list, tuple)) else float(dp) > 0
        )
        if not nonzero:
            return None
        return DomainPadding(
            domain_padding=list(dp) if isinstance(dp, (list, tuple)) else dp,
            resolution_scaling_factor=self.resolution_scaling_factor,
        )

    def setup(self):
        embedding = self._embedding()
        lifting_in = self.in_channels + (self.n_dim if embedding is not None else 0)

        def mk_lifting(name=None):
            return ChannelMLP(
                in_channels=lifting_in,
                out_channels=self.hidden_channels,
                hidden_channels=self.lifting_channels,
                n_layers=2,
                n_dim=self.n_dim,
                non_linearity=self.non_linearity,
                name=name,
            )

        def mk_projection(name=None):
            return ChannelMLP(
                in_channels=self.hidden_channels,
                out_channels=self.out_channels,
                hidden_channels=self.projection_channels,
                n_layers=2,
                n_dim=self.n_dim,
                non_linearity=self.non_linearity,
                name=name,
            )

        if self.complex_data:
            self.lifting = ComplexValued(module_factory=mk_lifting, name="lifting")
            self.projection = ComplexValued(
                module_factory=mk_projection, name="projection"
            )
        else:
            self.lifting = mk_lifting("lifting")
            self.projection = mk_projection("projection")

        if self.scan_layers:
            unsupported = {
                "norm": self.norm is not None,
                "preactivation": self.preactivation,
                "stabilizer": self.stabilizer is not None,
                "resolution_scaling_factor":
                    self.resolution_scaling_factor is not None,
                "complex_data": self.complex_data,
                "factorization": self.factorization is not None,
                "separable": self.separable,
                "conv_bias_kernel>1": self.conv_bias_kernel != 1,
                "use_channel_mlp=False": not self.use_channel_mlp,
                "fno_skip=None": self.fno_skip is None,
                "channel_mlp_skip=None": self.channel_mlp_skip is None,
            }
            bad = [k for k, v in unsupported.items() if v]
            if bad:
                raise ValueError(
                    f"scan_layers=True does not support: {', '.join(bad)}; "
                    "use the unrolled FNOBlocks path"
                )
            self.fno_blocks = ScanFNOBlocks(
                remat=self.remat,
                in_channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                n_modes=self.n_modes,
                n_layers=self.n_layers,
                fno_skip=self.fno_skip,
                channel_mlp_skip=self.channel_mlp_skip,
                channel_mlp_expansion=self.channel_mlp_expansion,
                non_linearity=self.non_linearity,
                max_n_modes=self.max_n_modes,
                weight_dtype=self.weight_dtype,
                name="fno_blocks",
            )
            return

        # remat: recompute each block's activations in the backward pass
        # instead of storing them — the TPU-native counterpart of the
        # reference's CPU activation offloading for high-resolution inputs
        # (doc/source/user_guide "CPU Offloading"). index/output_shape/
        # n_modes are static python args of FNOBlocks.__call__.
        blocks_cls = (
            nn.remat(FNOBlocks, static_argnums=(2, 3, 5))
            if self.remat
            else FNOBlocks
        )
        self.fno_blocks = blocks_cls(
            in_channels=self.hidden_channels,
            out_channels=self.hidden_channels,
            n_modes=self.n_modes,
            resolution_scaling_factor=self.resolution_scaling_factor,
            use_channel_mlp=self.use_channel_mlp,
            channel_mlp_dropout=self.channel_mlp_dropout,
            channel_mlp_expansion=self.channel_mlp_expansion,
            non_linearity=self.non_linearity,
            stabilizer=self.stabilizer,
            norm=self.norm,
            norm_groups=self.norm_groups,
            preactivation=self.preactivation,
            fno_skip=self.fno_skip,
            conv_bias_kernel=self.conv_bias_kernel,
            channel_mlp_skip=self.channel_mlp_skip,
            complex_data=self.complex_data,
            max_n_modes=self.max_n_modes,
            fno_block_precision=self.fno_block_precision,
            rank=self.rank,
            fixed_rank_modes=self.fixed_rank_modes,
            implementation=self.implementation,
            separable=self.separable,
            factorization=self.factorization,
            decomposition_kwargs=self.decomposition_kwargs,
            conv_module=self.conv_module,
            n_layers=self.n_layers,
            enforce_hermitian_symmetry=self.enforce_hermitian_symmetry,
            weight_dtype=self.weight_dtype,
            name="fno_blocks",
        )

    def __call__(
        self,
        x: jnp.ndarray,
        output_shape: Union[None, Tuple[int, ...], list] = None,
        n_modes: Optional[Tuple[int, ...]] = None,
        ada_in_embedding: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Forward pass; x: (batch, in_channels, d1..dN).

        ``output_shape``: None, a tuple (applied to the last block), or a
        list of per-layer tuples — reference fno.py:348-407.
        ``n_modes``: optional per-call mode override (incremental FNO).
        """
        if output_shape is None:
            output_shapes = [None] * self.n_layers
        elif isinstance(output_shape, tuple):
            output_shapes = [None] * (self.n_layers - 1) + [output_shape]
        else:
            output_shapes = list(output_shape)

        embedding = self._embedding()
        if embedding is not None:
            x = embedding(x)

        x = self.lifting(x)

        dp = self._domain_padding()
        if dp is not None:
            x = dp.pad(x)

        if self.scan_layers:
            if any(o is not None for o in output_shapes) or n_modes is not None:
                raise ValueError(
                    "scan_layers=True does not support per-call output_shape "
                    "or n_modes overrides"
                )
            x = self.fno_blocks(x)
        else:
            for i in range(self.n_layers):
                # positional args: nn.remat's static_argnums only covers
                # positional arguments (output_shape/n_modes are static)
                x = self.fno_blocks(
                    x, i, output_shapes[i], ada_in_embedding, n_modes
                )

        if dp is not None:
            x = dp.unpad(x)

        return self.projection(x)


def partialclass(new_name: str, cls, **kwargs):
    """Dynamically subclass a flax module with new field defaults.

    Counterpart of reference ``fno.py:419-446`` (which rebinds
    ``__init__`` via partialmethod). Flax modules are dataclasses, so the
    idiomatic equivalent is a subclass that re-declares the overridden
    fields with new defaults — exactly how ``SFNO``/``TFNO`` are defined.

    >>> MyFNO = partialclass("MyFNO", FNO, factorization="tucker", rank=0.05)
    """
    annotations = {}
    mro_annotations = {}
    for base in reversed(cls.__mro__):
        mro_annotations.update(getattr(base, "__annotations__", {}))
    for k in kwargs:
        if k not in mro_annotations:
            raise TypeError(f"{cls.__name__} has no field {k!r}")
        annotations[k] = mro_annotations[k]
    namespace = {"__annotations__": annotations, "__doc__": cls.__doc__}
    namespace.update(kwargs)
    return type(new_name, (cls,), namespace)


@register_model(name="TFNO")
class TFNO(FNO):
    """Tucker-factorized FNO: rank-0.1 Tucker weights by default.

    Mirrors reference ``TFNO`` (fno.py:449-484).
    """

    factorization: Optional[str] = "tucker"
    rank: Union[float, Tuple[int, ...]] = 0.1
