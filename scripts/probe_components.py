"""One-off: per-component pass costs for the freerun north-star pass."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import mcmcglm_tpu as mg
from mcmcglm_tpu.datagen import generate_glm_data
from mcmcglm_tpu.freerun import FreeRunCGGibbs

def timeit(fn, *args, reps=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

C, n, d = 256, 10_000, 1000
X, y, _ = generate_glm_data("binomial", n=n, d=d, seed=0)
eng = FreeRunCGGibbs(X, y, "binomial", mg.IIDPrior(mg.Normal(0.0, 1.0), d), tuning={"w": 0.5},
                     eval_cache="scalar")  # the probes below assume ld0 is the (C,) scalar cache
assert eng.eval_cache == "scalar"
print("eval_cache:", eng.eval_cache, flush=True)
state = eng.init(jax.random.key(0), C)
Xt = eng.Xt; eta = state.eta; j = state.j; xprop = state.xprop; b0 = state.b0; ll0 = state.ld0

@jax.jit
def fused_eval_scalar(eta, j, xprop, b0, ll0):
    xg = jnp.take(Xt, j, axis=0)
    e = eta + xg * (xprop - b0)[:, None]
    ld_e = eng.family.log_density_eta(e, eng.y, eng.extra)
    return jnp.sum(ld_e, axis=-1) - ll0
print(f"fused eval f only (2 in, 0 out): {timeit(fused_eval_scalar, eta, j, xprop, b0, ll0)*1e6:.1f} us", flush=True)

@jax.jit
def fused_eval_commit(eta, j, xprop, b0, ll0):
    xg = jnp.take(Xt, j, axis=0)
    e = eta + xg * (xprop - b0)[:, None]
    ld_e = eng.family.log_density_eta(e, eng.y, eng.extra)
    f = jnp.sum(ld_e, axis=-1) - ll0
    acc = f > -1.0
    return jnp.where(acc[:, None], e, eta), f
print(f"fused eval + eta commit (3 str): {timeit(fused_eval_commit, eta, j, xprop, b0, ll0)*1e6:.1f} us", flush=True)

@jax.jit
def stream_rw(eta): return eta * 1.0001 + 1.0
print(f"stream read+write (C,n):         {timeit(stream_rw, eta)*1e6:.1f} us", flush=True)

@jax.jit
def gather_only(j): return jnp.sum(jnp.take(Xt, j, axis=0), axis=-1)
print(f"gather+reduce only (1 stream):   {timeit(gather_only, j)*1e6:.1f} us", flush=True)

@jax.jit
def transcend(eta): return jnp.sum(jnp.logaddexp(0.0, eta), axis=-1)
print(f"softplus+reduce (1 stream):      {timeit(transcend, eta)*1e6:.1f} us", flush=True)
mb = C*n*4/1e6
print(f"(C,n) = {mb:.1f} MB -> 1 stream @819GB/s = {mb/819*1e3:.1f} us", flush=True)
