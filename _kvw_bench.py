import time
import jax, jax.numpy as jnp, numpy as np
from aria_tpu.ops.kv_write import kv_cache_write

L, B, H, S, D = 28, 32, 20, 512, 128
key = jax.random.PRNGKey(0)
kc = jax.random.randint(key, (L, B, H, S, D), -128, 127, jnp.int8)
vc = jax.random.randint(jax.random.PRNGKey(8), (L, B, H, S, D), -128, 127, jnp.int8)
kn = jax.random.randint(jax.random.PRNGKey(1), (B, H, D), -128, 127, jnp.int8)
vn = jax.random.randint(jax.random.PRNGKey(2), (B, H, D), -128, 127, jnp.int8)
pos = jax.random.randint(jax.random.PRNGKey(5), (B,), 0, S, jnp.int32)
rows = jnp.arange(B, dtype=jnp.int32)
li = jnp.int32(7)

bi = jnp.arange(B)[:, None, None]
hi = jnp.arange(H)[None, :, None]
si = pos[:, None, None]

N = 1000

@jax.jit
def loop_pallas(kc, vc):
    def body(i, c):
        k, v = c
        return kv_cache_write(k, v, li % 28, rows, (pos + i) % S, kn, vn)
    return jax.lax.fori_loop(0, N, body, (kc, vc))

@jax.jit
def loop_scat(kc, vc):
    def body(i, c):
        k, v = c
        s2 = ((pos + i) % S)[:, None, None]
        return (k.at[li, bi, hi, s2].set(kn[:, :, None, :]),
                v.at[li, bi, hi, s2].set(vn[:, :, None, :]))
    return jax.lax.fori_loop(0, N, body, (kc, vc))

for name, f in [("pallas", loop_pallas), ("scatter", loop_scat)]:
    o = f(kc, vc); jax.block_until_ready(o)
    t0 = time.perf_counter(); o = f(kc, vc); jax.block_until_ready(o)
    t1 = time.perf_counter()
    print(f"{name}: {(t1-t0)/N*1e6:.2f} us per K+V write pair")
