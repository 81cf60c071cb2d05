"""TPU gather-strategy microbenchmark for the deferred-texturing pass.

N=4.15M lane indices into a P~500-row table, 20 components needed:
  a) 20 separate (P,) gathers       (current _texture_factors shape)
  b) one (P, 20) row gather
  c) one-hot (N, P) @ (P, 20) MXU matmul
  d) a 4M-index gather into a (32k, 3) uint8 image (the texel fetch)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N, P, K = 4_147_200, 512, 20

def timed(name, fn, *args, iters=4):
    @jax.jit
    def run(*a):
        def body(acc, i):
            return acc + fn(i, *a), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return tot
    t0 = time.perf_counter(); float(run(*args))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter(); s = float(run(*args))
    dt = (time.perf_counter() - t0) / iters
    assert s == s
    print(f"{name}: {dt*1000:.2f} ms/iter (compile {comp:.1f}s)", flush=True)

key = jax.random.key(0)
idx = jax.random.randint(key, (N,), 0, P, dtype=jnp.int32)
tbl = jax.random.uniform(key, (P, K), jnp.float32)
img = jax.random.randint(key, (256, 128, 3), 0, 255, dtype=jnp.int32
                         ).astype(jnp.uint8)
ii = jax.random.randint(key, (N,), 0, 128, dtype=jnp.int32)
jj = jax.random.randint(key, (N,), 0, 256, dtype=jnp.int32)

timed("a 20 separate gathers", lambda i, ix, t: sum(
    jnp.sum(t[:, k][ix]) for k in range(K)) * 0.0 + jnp.sum(t[:, 0][ix]),
    idx, tbl)

timed("a2 20 separate gathers (really)", lambda i, ix, t: sum(
    jnp.sum(t[:, k][ix] * (k + 1.0)) for k in range(K)), idx, tbl)

timed("b row gather (P,20)", lambda i, ix, t: jnp.sum(
    t[ix] * jnp.arange(1.0, K + 1.0)), idx, tbl)

def onehot_mm(i, ix, t):
    oh = (ix[:, None] == jnp.arange(P)[None, :]).astype(jnp.float32)
    return jnp.sum(jnp.dot(oh, t, preferred_element_type=jnp.float32)
                   * jnp.arange(1.0, K + 1.0))
timed("c one-hot matmul", onehot_mm, idx, tbl)

timed("d image texel gather", lambda i, a, b, im: jnp.sum(
    im[b, a].astype(jnp.float32)), ii, jj, img)
