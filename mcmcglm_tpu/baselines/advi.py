"""Mean-field ADVI baseline: variational inference on the same log posterior.

Cross-validation baseline required by BASELINE.json ("VI baselines on the
same log-density").  q(beta) = N(m, diag(exp(log_s)^2)); maximises the ELBO
with the reparameterisation trick and optax Adam.  The whole optimisation is
one lax.scan under jit — ideal accelerator shape (each iteration is a
(mc_samples, d) matvec + elementwise pass).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

__all__ = ["advi_fit", "ADVIResult"]


class ADVIResult(NamedTuple):
    mean: jax.Array  # (d,)
    scale: jax.Array  # (d,) posterior std of q
    elbo_trace: jax.Array  # (n_steps,)

    def sample(self, key, n: int):
        eps = jax.random.normal(key, (n, self.mean.shape[-1]), self.mean.dtype)
        return self.mean + eps * self.scale


def advi_fit(
    key,
    logpost: Callable,
    init_mean,
    n_steps: int = 2000,
    mc_samples: int = 8,
    learning_rate: float = 0.02,
) -> ADVIResult:
    """Fit a mean-field gaussian approximation to exp(logpost)."""
    init_mean = jnp.asarray(init_mean)
    d = init_mean.shape[-1]
    params0 = {
        "m": init_mean,
        "log_s": jnp.full((d,), -1.0, init_mean.dtype),
    }
    opt = optax.adam(learning_rate)
    opt_state0 = opt.init(params0)
    batched_logpost = jax.vmap(logpost)

    def neg_elbo(params, key):
        eps = jax.random.normal(key, (mc_samples, d), init_mean.dtype)
        s = jnp.exp(params["log_s"])
        z = params["m"] + eps * s
        # E_q[log p] via MC + gaussian entropy (up to const)
        energy = jnp.mean(batched_logpost(z))
        entropy = jnp.sum(params["log_s"])
        return -(energy + entropy)

    grad_fn = jax.value_and_grad(neg_elbo)

    def step(carry, key):
        params, opt_state = carry
        loss, g = grad_fn(params, key)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    keys = jax.random.split(key, n_steps)
    (params, _), elbo = lax.scan(step, (params0, opt_state0), keys)
    return ADVIResult(params["m"], jnp.exp(params["log_s"]), elbo)
