"""Minimal train state (params + opt state + step + rng), orbax-friendly."""

from __future__ import annotations

from typing import Any

import jax
import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng,
               tx_params=None):
        """tx_params: the subtree the optimizer actually operates on (the
        trainable split under real LiT locking, optim.make_partition);
        defaults to the full params tree."""
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params if tx_params is None
                                     else tx_params), rng=rng)

    def apply_gradients(self, tx: optax.GradientTransformation, grads):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)
