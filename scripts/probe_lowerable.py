"""Client-side Mosaic lowerability probe for the family eta-rel paths.

Resolves the ADVICE r3 claim that ``jax.nn.softplus`` (lowered via
``log1p``) cannot lower inside Pallas TPU kernels — which would silently
demote the negbin (and logit!) batteries to XLA.  ``jax.jit(fn).lower``
runs Mosaic lowering client-side (no remote compile), so this is cheap
even over the tunnel.

Run: /opt/venv/bin/python scripts/probe_lowerable.py   (TPU backend)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe_primitive(name, fn):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[...] = fn(x_ref[...])

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    try:
        jax.jit(call).lower(jax.ShapeDtypeStruct((8, 128), jnp.float32))
        print(f"LOWERS      {name}", flush=True)
        return True
    except Exception as exc:
        msg = str(exc).splitlines()[0][:100]
        print(f"NO-LOWERING {name}: {type(exc).__name__}: {msg}", flush=True)
        return False


def probe_battery(family, extra=None, battery="pallas3"):
    from mcmcglm_tpu.freerun import FreeRunCGGibbs
    import mcmcglm_tpu as mg

    rng = np.random.default_rng(0)
    n, d = 512, 8
    X = rng.normal(size=(n, d))
    y = rng.poisson(2.0, size=n).astype(float) if family != "binomial" else (
        rng.binomial(1, 0.5, size=n).astype(float))
    try:
        fr = FreeRunCGGibbs(
            X, y, family, mg.IIDPrior(mg.Normal(0, 1), d), extra=extra,
            tuning={"w": 0.5}, spec_k=4, battery_impl=battery,
        )
        ok = fr._battery_lowerable()
        print(f"battery {battery:8s} {family:18s}: "
              f"{'LOWERS' if ok else 'NO-LOWERING'}", flush=True)
    except Exception as exc:
        print(f"battery {battery:8s} {family:18s}: CONSTRUCT-FAIL "
              f"{type(exc).__name__}: {exc}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe_primitive("jax.nn.softplus", jax.nn.softplus)
    probe_primitive("jnp.log1p", jnp.log1p)
    probe_primitive("jnp.expm1", jnp.expm1)
    probe_primitive("lax.lgamma", jax.lax.lgamma)
    probe_primitive("lax.erf", jax.lax.erf)
    probe_primitive("logaddexp0", lambda x: jnp.logaddexp(x, 0.0))
    for fam, extra in (("binomial", None), ("poisson", None),
                       ("negative.binomial", {"size": 1.0})):
        for b in ("pallas3", "pallas2"):
            probe_battery(fam, extra, b)
