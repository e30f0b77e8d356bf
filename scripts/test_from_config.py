"""Config-to-model smoke test.

Counterpart of /root/reference/scripts/test_from_config.py: builds a model
purely from a config tree through the ``get_model`` registry and runs a
forward/backward pass — guards the config-driven factory path.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from neuraloperator_tpu.config import DarcyConfig, make_config_from_cli
from neuraloperator_tpu.models import get_model


def main():
    config = make_config_from_cli(DarcyConfig)
    model = get_model(config.to_dict())
    n_dim = len(config.model.n_modes)
    shape = (2, config.model.data_channels) + (16,) * n_dim
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    out = jax.jit(lambda v, xx: model.apply(v, xx))(variables, x)
    loss, grads = jax.value_and_grad(
        lambda p: jnp.sum(model.apply({"params": p}, x) ** 2)
    )(variables["params"])
    n_leaves = len(jax.tree_util.tree_leaves(grads))
    print(f"model {type(model).__name__}: out {out.shape}, "
          f"loss {float(loss):.4f}, {n_leaves} gradient leaves")
    return model


if __name__ == "__main__":
    main()
