"""Functional train state.

The SPMD replacement for the reference's mutable module + torch optimizer
pair: everything the step mutates lives in one donated pytree
{params, batch_stats, opt_state, step} (+ SSL buffers added by the
contrastive engine), threaded through the jitted step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    # Contrastive/SSL carried buffers (EMA params, queues, memory banks);
    # empty dict for plain supervised/speed training.
    ssl: Dict[str, Any] = flax.struct.field(default_factory=dict)


def create_train_state(model, tx, rng, sample_input, train: bool = False) -> TrainState:
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample_input,
        train=train,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def param_count(params) -> int:
    import numpy as np

    return int(
        sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    )
