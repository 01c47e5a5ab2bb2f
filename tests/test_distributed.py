"""True multi-process data parallelism: 2 `jax.distributed` CPU processes.

The virtual 8-device mesh (tests/test_parallel.py) validates sharding
semantics in one process; this module validates the *cross-process* path the
CLI exposes (`bcnf-tpu train --dp-devices N --coordinator ... --num-processes
... --process-id ...`): coordinator handshake, global mesh spanning two
processes, `shard_batch`/`replicate` building global arrays from
host-replicated data, and a sharded loss/grad step matching the
single-process full-batch result exactly.

Each worker computes (a) the sharded global-mesh loss+grad-norm and (b) the
local unsharded full-batch loss+grad-norm, and asserts they agree; the parent
only checks both workers exited cleanly.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    # two local devices per process -> 4-device global mesh over 2 processes
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

    import jax
    jax.config.update("jax_platforms", "cpu")
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from bcnf_tpu.models import (ConcatenateCondition, CondRealNVP,
                                 FeatureNetworkStack, FullyConnectedFeatureNetwork)
    from bcnf_tpu.parallel import make_mesh, replicate, shard_batch
    from bcnf_tpu.utils.misc import inn_nll_loss

    stack = FeatureNetworkStack([
        ConcatenateCondition(input_size=None, output_size=4),
        FullyConnectedFeatureNetwork(sizes=[4, 16, 8]),
    ])
    model = CondRealNVP(size=3, nested_sizes=[24], n_blocks=3, n_conditions=8,
                        feature_network_stack=stack, act_norm=True, random_state=0)
    params = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)  # identical data in both processes
    B = 32
    y = rng.normal(size=(B, 3)).astype(np.float32)
    cond = rng.normal(size=(B, 4)).astype(np.float32)

    def loss_fn(p, y, c):
        z, ld = model.forward(p, y, c)
        return inn_nll_loss(z, ld)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # (a) sharded over the 4-device global mesh
    mesh = make_mesh()
    gp = replicate(mesh, params)
    gy, gc = shard_batch(mesh, (jnp.asarray(y), jnp.asarray(cond)))
    loss_g, grads_g = grad_fn(gp, gy, gc)
    gnorm_g = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads_g)))

    # (b) local unsharded full batch
    loss_l, grads_l = grad_fn(params, jnp.asarray(y), jnp.asarray(cond))
    gnorm_l = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads_l)))

    dl = abs(float(loss_g) - float(loss_l))
    dg = abs(float(gnorm_g) - float(gnorm_l))
    assert dl < 1e-5, f"loss mismatch: {dl}"
    assert dg < 1e-4 * max(1.0, float(gnorm_l)), f"grad-norm mismatch: {dg}"
    print(f"proc {pid}: OK loss={float(loss_g):.6f} dl={dl:.2e} dg={dg:.2e}",
          flush=True)
""")


@pytest.mark.slow
def test_two_process_distributed_training_step(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coordinator = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    worker_path = tmp_path / "worker.py"
    worker_path.write_text(WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_path), coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "OK" in out
