"""Learning-rate schedules.

Behavioral spec: the reference decays only the ``means`` LR, exponentially
(lerp in log space) from ``lr_init`` to ``lr_final`` over ``max_steps``
(``/root/reference/model/utils.py:19-28``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def log_lerp_schedule(lr_init: float, lr_final: float, max_steps: int):
    """Returns step -> lr, lerping in log space; works on python ints and on
    traced jnp arrays (used inside the jitted train step)."""
    log_init = float(np.log(lr_init))
    log_final = float(np.log(lr_final))

    def schedule(step):
        if isinstance(step, (int, float, np.generic)):
            # host path: the train loop calls this with a python int every
            # step — eager jnp ops here would dispatch one-by-one over a
            # remote-device link and fetch the result (~1 RTT per op,
            # measured ~30 ms/step on the axon tunnel)
            t = min(1.0, float(step) / float(max_steps))
            return float(np.exp(log_init * (1.0 - t) + log_final * t))
        t = jnp.minimum(1.0, jnp.asarray(step, jnp.float32) / float(max_steps))
        return jnp.exp(log_init * (1.0 - t) + log_final * t)

    return schedule
