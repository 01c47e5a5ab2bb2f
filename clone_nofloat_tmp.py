import time, sys
import jax, jax.numpy as jnp, numpy as np, optax
from __graft_entry__ import _flagship_model
from bcnf_tpu.utils.misc import inn_nll_loss

BATCH, SEQ = 256, 30
model = _flagship_model()
params = model.init(jax.random.key(0))
optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
opt_state = optimizer.init(params)
rng = np.random.default_rng(0)
y = jnp.asarray(rng.normal(size=(BATCH, 19)), jnp.float32)
traj = jnp.asarray(rng.normal(size=(BATCH, SEQ, 3)), jnp.float32)

@jax.jit
def train_step(params, opt_state, y, traj):
    def loss_fn(p):
        z, log_det = model.forward(p, y, traj)
        return inn_nll_loss(z, log_det)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

t0 = time.time()
params, opt_state, loss = train_step(params, opt_state, y, traj)
loss.block_until_ready()
print(f"compile+first: {time.time()-t0:.1f}s")
for k in range(3):
    t0 = time.time()
    for _ in range(30):
        params, opt_state, loss = train_step(params, opt_state, y, traj)
    loss.block_until_ready()
    print(f"round {k}: {(time.time()-t0)/30*1e3:.2f} ms/step")
