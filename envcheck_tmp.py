import sys, os, time
import jax, jax.numpy as jnp
print("argv0:", sys.argv[0] if sys.argv else None)
print("JAX_PLATFORMS env:", os.environ.get("JAX_PLATFORMS"))
print("backend:", jax.default_backend(), jax.devices())
x = jnp.ones((1024, 1024))
f = jax.jit(lambda a: a @ a)
f(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(50): r = f(x)
r.block_until_ready()
print(f"1k matmul x50 chained: {(time.perf_counter()-t0)/50*1e6:.0f} us/call")
