"""Pallas TPU kernel: the ENTIRE RealNVP stack fused into one kernel.

Motivation (measured, see `results/pallas_tune.json` and PARITY.md): a single
fused coupling only matches XLA — the XLA sampling path is bound by HBM
round-trips of the (B, H) activations between the ~26 blocks x 5 layers of
the flow, not by any one op. This kernel runs the *whole* chain
(reference `CondRealNVP_v2.forward/inverse`, `src/bcnf/models/cnf.py:467-508`:
per block [ActNorm, AffineCoupling, Orthonormal] + final coupling) for a
batch tile without the activations ever leaving VMEM:

- grid = (batch_tiles, n_blocks+1); the block axis is innermost and
  sequential, the activation lives in a VMEM scratch across block steps;
- per-block weights are streamed HBM->VMEM by the BlockSpec pipeline
  (double-buffered by Pallas), so weight traffic is K x ~5.5 MB per batch
  tile while activation traffic is exactly one read + one write per row;
- the hoisted condition projections h_proj (n_blocks+1, N, H) are *shared
  across posterior draws* through a modulo index_map: rows are laid out
  draws-major so a batch tile maps to one contiguous condition chunk.

Supports one-way affine couplings with the Linear layer family (the dominant
published configuration: every `configs/runs/{old,nll,hybrid}` model);
`CondRealNVP.use_pallas` falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _eye_like(size: int, dtype: Any) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return (rows == cols).astype(dtype)


def _dot(x, w, mode):
    """Matmul at the requested fidelity. `"x3"` is the BF16_BF16_F32_X3
    algorithm written out by hand (Pallas dots don't take DotAlgorithm
    presets): split each f32 operand into a bf16 high part and a bf16
    residual, then sum the three significant bf16xbf16->f32 products —
    ~2e-3 relative error at 3 MXU passes instead of HIGHEST's 6."""
    if mode == "x3":
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        wh = w.astype(jnp.bfloat16)
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        # precision pinned to DEFAULT: a surrounding default_matmul_precision
        # ("highest") context would otherwise stamp fp32 contract precision
        # onto these bf16 dots, which Mosaic rejects ("Bad lhs type")
        d = lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.DEFAULT,
                                 preferred_element_type=jnp.float32)
        return d(xh, wh) + (d(xh, wl) + d(xl, wh))
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[mode]
    return jnp.dot(x, w, precision=prec, preferred_element_type=jnp.float32)


def _mlp(x_a, h_proj, w1y_ref, b1_ref, wm_ref, bm_ref, wout_ref, bout_ref, n_hidden, prec):
    """The coupling MLP chain for one block (weights have leading block dim 1)."""
    x = jax.nn.gelu(_dot(x_a, w1y_ref[0], prec) + b1_ref[0, 0][None, :] + h_proj)
    for i in range(n_hidden):
        x = jax.nn.gelu(_dot(x, wm_ref[0, i], prec) + bm_ref[0, i][None, :])
    return _dot(x, wout_ref[0], prec) + bout_ref[0, 0][None, :]


def _flow_kernel(
    # inputs (BlockSpec-sliced)
    x_in_ref, h_proj_ref, an_s_ref, an_b_ref, ortho_ref,
    w1y_ref, b1_ref, wm_ref, bm_ref, wout_ref, bout_ref,
    # outputs
    out_ref, ld_ref,
    # scratch
    x_s, ld_s,
    *,
    n_steps: int, n_hidden: int, d_a: int, d_b: int,
    inverse: bool, cond_tile_reps: int, prec: Any,
):
    b = pl.program_id(1)
    size = d_a + d_b

    @pl.when(b == 0)
    def _init():
        x_s[:] = x_in_ref[:]
        ld_s[:] = jnp.zeros_like(ld_s)

    x = x_s[:]
    h_proj = h_proj_ref[0]
    # 1-D per-block vectors carry a singleton axis for TPU block alignment
    an_s_row = an_s_ref[0, 0][None, :]
    an_b_row = an_b_ref[0, 0][None, :]
    if cond_tile_reps > 1:
        # tile the (N, H) condition chunk over draws within the batch tile
        n, hdim = h_proj.shape
        h_proj = jnp.broadcast_to(h_proj[None], (cond_tile_reps, n, hdim)).reshape(
            cond_tile_reps * n, hdim
        )

    an_s = an_s_row
    an_b = an_b_row
    ortho = ortho_ref[0]
    eye = _eye_like(size, x.dtype)

    if not inverse:
        # inner blocks: ActNorm -> coupling -> orthonormal; final (b == K): coupling only
        is_inner = (b < n_steps - 1).astype(x.dtype)
        s_eff = is_inner * an_s + (1.0 - is_inner)
        b_eff = is_inner * an_b
        x = x * s_eff + b_eff
        ld = jnp.sum(jnp.log(jnp.abs(s_eff)), axis=-1, keepdims=True)

        x_a = x[:, :d_a]
        out = _mlp(x_a, h_proj, w1y_ref, b1_ref, wm_ref, bm_ref, wout_ref, bout_ref, n_hidden, prec)
        t = out[:, :d_b]
        s = jnp.tanh(out[:, d_b:])
        z_b = jnp.exp(s) * x[:, d_a:] + t
        ld = ld + jnp.sum(s, axis=-1, keepdims=True)
        x = jnp.concatenate([x_a, z_b], axis=-1)

        ortho_eff = is_inner * ortho + (1.0 - is_inner) * eye
        x = jnp.dot(x, ortho_eff, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        x_s[:] = x
        ld_s[:] = ld_s[:] + ld
    else:
        # step 0: final coupling inverse; steps >= 1: ortho^T -> coupling -> ActNorm^-1
        is_inner = (b > 0).astype(x.dtype)
        ortho_eff = is_inner * ortho.T + (1.0 - is_inner) * eye
        x = jnp.dot(x, ortho_eff, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)

        z_a = x[:, :d_a]
        out = _mlp(z_a, h_proj, w1y_ref, b1_ref, wm_ref, bm_ref, wout_ref, bout_ref, n_hidden, prec)
        t = out[:, :d_b]
        s = jnp.tanh(out[:, d_b:])
        y_b = (x[:, d_a:] - t) * jnp.exp(-s)
        x = jnp.concatenate([z_a, y_b], axis=-1)

        s_eff = is_inner * an_s + (1.0 - is_inner)
        b_eff = is_inner * an_b
        x = (x - b_eff) / s_eff
        x_s[:] = x

    @pl.when(b == n_steps - 1)
    def _emit():
        out_ref[:] = x_s[:]
        if not inverse:
            ld_ref[:] = ld_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("inverse", "block_b", "n_cond", "precision", "interpret"),
)
def fused_flow(
    x: jnp.ndarray,            # (B, size) rows draws-major: row = draw * n_cond + cond
    h_proj: jnp.ndarray,       # (K+1, N, H): inner blocks 0..K-1, final at K
    an_scale: jnp.ndarray,     # (K+1, size) (entry K unused -> ones)
    an_bias: jnp.ndarray,      # (K+1, size) (entry K unused -> zeros)
    ortho: jnp.ndarray,        # (K+1, size, size) (forward orientation; entry K unused)
    w1y: jnp.ndarray,          # (K+1, d_a, H)
    b1: jnp.ndarray,           # (K+1, H)
    wm: jnp.ndarray,           # (K+1, n_hidden, H, H)
    bm: jnp.ndarray,           # (K+1, n_hidden, H)
    wout: jnp.ndarray,         # (K+1, H, 2*d_b)
    bout: jnp.ndarray,         # (K+1, 2*d_b)
    *,
    inverse: bool,
    n_cond: int,
    block_b: int = 512,
    precision: str = "default",
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray] | jnp.ndarray:
    """Run the whole flow in one kernel. Forward returns `(z, logdet)`,
    inverse returns `y`. See module docstring for the layout contract."""
    B, size = x.shape
    n_steps, _, H = h_proj.shape  # K+1
    n_hidden = wm.shape[1]
    d_a = w1y.shape[1]
    d_b = size - d_a

    block_b = min(block_b, B)
    if B % block_b:
        raise ValueError(f"B={B} must be a multiple of block_b={block_b}")
    # condition chunk <-> batch tile mapping (draws-major rows)
    if block_b <= n_cond:
        if n_cond % block_b:
            raise ValueError(f"n_cond={n_cond} must be a multiple of block_b={block_b}")
        cond_tile_reps = 1
        n_cond_tiles = n_cond // block_b
        cond_block = block_b
    else:
        if block_b % n_cond:
            raise ValueError(f"block_b={block_b} must be a multiple of n_cond={n_cond}")
        cond_tile_reps = block_b // n_cond
        n_cond_tiles = 1
        cond_block = n_cond

    # singleton middle axis so the last-two block dims equal the array dims
    an_scale = an_scale[:, None, :]
    an_bias = an_bias[:, None, :]
    b1 = b1[:, None, :]
    bout = bout[:, None, :]

    grid = (B // block_b, n_steps)
    if precision not in ("default", "highest", "x3"):
        raise ValueError(f"Unsupported fused-kernel precision mode: {precision}")
    prec = precision

    # block index along the stacked-weights axis: forward visits 0..K in
    # order (final last); inverse visits K (final) then K-1..0.
    if inverse:
        step_idx = lambda t, b: n_steps - 1 - b
    else:
        step_idx = lambda t, b: b

    def wspec(shape: tuple) -> pl.BlockSpec:
        return pl.BlockSpec(
            (1, *shape), lambda t, b: (step_idx(t, b), *(0 for _ in shape)),
            memory_space=pltpu.VMEM,
        )

    batch_spec = pl.BlockSpec(
        (block_b, size), lambda t, b: (t, 0), memory_space=pltpu.VMEM
    )
    hproj_spec = pl.BlockSpec(
        (1, cond_block, H),
        lambda t, b: (step_idx(t, b), t % n_cond_tiles, 0),
        memory_space=pltpu.VMEM,
    )

    in_specs = [
        batch_spec,                 # x
        hproj_spec,                 # h_proj
        wspec((1, size)),           # an_scale
        wspec((1, size)),           # an_bias
        wspec((size, size)),        # ortho
        wspec((d_a, H)),            # w1y
        wspec((1, H)),              # b1
        wspec((n_hidden, H, H)),    # wm
        wspec((n_hidden, H)),       # bm
        wspec((H, 2 * d_b)),        # wout
        wspec((1, 2 * d_b)),        # bout
    ]

    kernel = functools.partial(
        _flow_kernel,
        n_steps=n_steps, n_hidden=n_hidden, d_a=d_a, d_b=d_b,
        inverse=inverse, cond_tile_reps=cond_tile_reps, prec=prec,
    )

    out, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            batch_spec,
            pl.BlockSpec((block_b, 1), lambda t, b: (t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, size), x.dtype),
            jax.ShapeDtypeStruct((B, 1), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, size), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the default 16 MB scoped-vmem cap is conservative; the streamed
            # per-block weights (~5 MB double-buffered) + condition chunk +
            # activation scratch need more headroom at block_b >= 512
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, h_proj, an_scale, an_bias, ortho, w1y, b1, wm, bm, wout, bout)

    if inverse:
        return out
    return out, ld[:, 0]


def stack_flow_params(model: Any, params: dict) -> dict:
    """Assemble the stacked per-block kernel arguments from a CondRealNVP
    param tree (one-way Linear affine couplings; `mlp_params_to_kernel_args`
    analogue for the whole stack). Entry K is the final coupling; its
    ActNorm/orthonormal slots are identity."""
    size = model.size
    d_a = model.coupling.d_a
    blocks = params["blocks"]
    cp = blocks["coupling"]["a"]["layers"]  # leaves (K, ...)
    fin = params["final"]["a"]["layers"]

    cat = lambda a, b: jnp.concatenate([a, b[None]], axis=0)
    K = cp[0]["w"].shape[0]

    w1 = cat(cp[0]["w"], fin[0]["w"])          # (K+1, d_a + n_cond_proj?, H)
    w1y = w1[:, :d_a, :]
    b1 = cat(cp[0]["b"], fin[0]["b"])
    wm = jnp.stack([cat(cp[i]["w"], fin[i]["w"]) for i in range(1, len(cp) - 1)], axis=1)
    bm = jnp.stack([cat(cp[i]["b"], fin[i]["b"]) for i in range(1, len(cp) - 1)], axis=1)
    wout = cat(cp[-1]["w"], fin[-1]["w"])
    bout = cat(cp[-1]["b"], fin[-1]["b"])

    if model.actnorm is not None:
        an_s = cat(blocks["actnorm"]["scale"], jnp.ones(size))
        an_b = cat(blocks["actnorm"]["bias"], jnp.zeros(size))
    else:
        an_s = jnp.ones((K + 1, size))
        an_b = jnp.zeros((K + 1, size))
    ortho = cat(blocks["ortho"], jnp.eye(size))

    return {
        "an_scale": an_s, "an_bias": an_b, "ortho": ortho,
        "w1y": w1y, "b1": b1, "wm": wm, "bm": bm, "wout": wout, "bout": bout,
    }


def pad_hidden(kargs: dict, h_proj: jnp.ndarray, lane: int = 128) -> tuple[dict, jnp.ndarray]:
    """Zero-pad the hidden width H to a lane multiple. Exact same function:
    padded units see zero weights and zero bias, and gelu(0) = 0, so they
    contribute nothing downstream. Aligned tiles avoid wasted MXU lanes
    (H=526 spans 5 lane tiles with the last 86% empty)."""
    H = kargs["b1"].shape[-1]
    Hp = ((H + lane - 1) // lane) * lane
    if Hp == H:
        return kargs, h_proj
    p = Hp - H
    out = dict(kargs)
    out["w1y"] = jnp.pad(kargs["w1y"], ((0, 0), (0, 0), (0, p)))
    out["b1"] = jnp.pad(kargs["b1"], ((0, 0), (0, p)))
    out["wm"] = jnp.pad(kargs["wm"], ((0, 0), (0, 0), (0, p), (0, p)))
    out["bm"] = jnp.pad(kargs["bm"], ((0, 0), (0, 0), (0, p)))
    out["wout"] = jnp.pad(kargs["wout"], ((0, 0), (0, p), (0, 0)))
    return out, jnp.pad(h_proj, ((0, 0), (0, 0), (0, p)))


# ---------------------------------------------------------------------------
# Training fast path: fused forward + hand-written backward (custom VJP)
# ---------------------------------------------------------------------------
#
# The XLA training step materializes ~15 (B, H) residuals per block in HBM
# for the backward pass. Here the forward kernel stores only the tiny
# (B, size) block boundaries; the backward kernel re-runs each block's MLP
# from its boundary (activations stay in VMEM), then backprops — the
# RevNet/remat trade (1.33x matmul FLOPs for near-zero residual traffic),
# executed as two Pallas kernels so intermediate activations never touch HBM
# at all. Gradients returned for everything trainable (weights, ActNorm,
# condition projections h_proj, and the input x); the orthonormal mixing
# matrices are fixed buffers (reference cnf.py:322-324) and get zeros.


def _dotg(a, b, dims, mode):
    """dot_general at the requested fidelity (same modes as `_dot`)."""
    if mode == "x3":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda x, y: jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        return d(ah, bh) + (d(ah, bl) + d(al, bh))
    prec = {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[mode]
    return jax.lax.dot_general(a, b, dims, precision=prec,
                               preferred_element_type=jnp.float32)


_MM = (((1,), (0,)), ((), ()))    # a @ b
_MM_BT = (((1,), (1,)), ((), ()))  # a @ b.T
_MM_AT = (((0,), (0,)), ((), ()))  # a.T @ b


def _flow_fwd_train_kernel(
    x_in_ref, h_proj_ref, an_s_ref, an_b_ref, ortho_ref,
    w1y_ref, b1_ref, wm_ref, bm_ref, wout_ref, bout_ref,
    out_ref, ld_ref, bound_ref,
    x_s, ld_s,
    *, n_steps, n_hidden, d_a, d_b, prec,
):
    """Forward pass emitting z, logdet, and the per-block boundary inputs
    (grid = (batch_tiles, n_steps), block axis inner/sequential)."""
    b = pl.program_id(1)
    size = d_a + d_b

    @pl.when(b == 0)
    def _init():
        x_s[:] = x_in_ref[:]
        ld_s[:] = jnp.zeros_like(ld_s)

    x = x_s[:]
    bound_ref[0] = x  # input of block b (residual for backward)

    h_proj = h_proj_ref[0]
    an_s_row = an_s_ref[0, 0][None, :]
    an_b_row = an_b_ref[0, 0][None, :]
    ortho = ortho_ref[0]
    eye = _eye_like(size, x.dtype)

    is_inner = (b < n_steps - 1).astype(x.dtype)
    s_eff = is_inner * an_s_row + (1.0 - is_inner)
    b_eff = is_inner * an_b_row
    x = x * s_eff + b_eff
    ld = jnp.sum(jnp.log(jnp.abs(s_eff)), axis=-1, keepdims=True)

    x_a = x[:, :d_a]
    out = _mlp(x_a, h_proj, w1y_ref, b1_ref, wm_ref, bm_ref, wout_ref, bout_ref, n_hidden, prec)
    t = out[:, :d_b]
    s = jnp.tanh(out[:, d_b:])
    z_b = jnp.exp(s) * x[:, d_a:] + t
    ld = ld + jnp.sum(s, axis=-1, keepdims=True)
    x = jnp.concatenate([x_a, z_b], axis=-1)

    ortho_eff = is_inner * ortho + (1.0 - is_inner) * eye
    x = jnp.dot(x, ortho_eff, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    x_s[:] = x
    ld_s[:] = ld_s[:] + ld

    @pl.when(b == n_steps - 1)
    def _emit():
        out_ref[:] = x_s[:]
        ld_ref[:] = ld_s[:]


def _flow_bwd_train_kernel(
    bound_ref, h_proj_ref, dz_ref, dld_ref,
    an_s_ref, an_b_ref, ortho_ref,
    w1y_ref, b1_ref, wm_ref, bm_ref, wout_ref, bout_ref,
    # grads out
    dx_ref, dhp_ref, dan_s_ref, dan_b_ref,
    dw1y_ref, db1_ref, dwm_ref, dbm_ref, dwout_ref, dbout_ref,
    # scratch
    dx_full,
    *, n_steps, n_hidden, d_a, d_b, block_b, prec,
):
    """Backward pass (grid = (n_steps, batch_tiles), block axis OUTER in
    reverse block order so per-block weight-grad accumulators stay resident
    in VMEM across the inner batch-tile loop)."""
    g = pl.program_id(0)          # 0 .. n_steps-1, block = n_steps-1-g
    t = pl.program_id(1)
    size = d_a + d_b
    rows = pl.ds(t * block_b, block_b)

    @pl.when(g == 0)
    def _seed():
        dx_full[rows, :] = dz_ref[:]

    @pl.when(t == 0)
    def _zero_acc():
        dan_s_ref[:] = jnp.zeros_like(dan_s_ref)
        dan_b_ref[:] = jnp.zeros_like(dan_b_ref)
        dw1y_ref[:] = jnp.zeros_like(dw1y_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dwm_ref[:] = jnp.zeros_like(dwm_ref)
        dbm_ref[:] = jnp.zeros_like(dbm_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)

    is_inner = (g > 0).astype(jnp.float32)
    an_s_row = an_s_ref[0, 0][None, :]
    an_b_row = an_b_ref[0, 0][None, :]
    s_eff = is_inner * an_s_row + (1.0 - is_inner)
    b_eff = is_inner * an_b_row
    ortho = ortho_ref[0]
    eye = _eye_like(size, jnp.float32)
    ortho_eff = is_inner * ortho + (1.0 - is_inner) * eye

    x_k = bound_ref[0]            # block input (B, size)
    h_proj = h_proj_ref[0]
    dld = dld_ref[:]              # (B, 1)
    dy = dx_full[rows, :]         # cotangent of block output

    # ---- recompute forward internals, keeping pre-activations
    x1 = x_k * s_eff + b_eff
    x_a = x1[:, :d_a]
    x1_b = x1[:, d_a:]
    a0 = _dot(x_a, w1y_ref[0], prec) + b1_ref[0, 0][None, :] + h_proj
    acts = [a0]
    h = jax.nn.gelu(a0)
    hs = [h]
    for i in range(n_hidden):
        a = _dot(h, wm_ref[0, i], prec) + bm_ref[0, i][None, :]
        acts.append(a)
        h = jax.nn.gelu(a)
        hs.append(h)
    out = _dot(h, wout_ref[0], prec) + bout_ref[0, 0][None, :]
    s_pre = out[:, d_b:]
    s = jnp.tanh(s_pre)
    es = jnp.exp(s)

    # ---- backward
    dx2 = _dotg(dy, ortho_eff, _MM_BT, "highest")
    dx_a_direct = dx2[:, :d_a]
    dz_b = dx2[:, d_a:]

    ds = dz_b * es * x1_b + dld           # d(sum s) via logdet + via z_b
    dt = dz_b
    dx1_b = dz_b * es
    ds_pre = ds * (1.0 - s * s)
    dout = jnp.concatenate([dt, ds_pre], axis=-1)

    dwout_ref[:] = dwout_ref[:] + _dotg(hs[-1], dout, _MM_AT, prec)[None]
    dbout_ref[:] = dbout_ref[:] + jnp.sum(dout, axis=0)[None, None, :]
    dh = _dotg(dout, wout_ref[0], _MM_BT, prec)
    for i in range(n_hidden - 1, -1, -1):
        _, gelu_vjp = jax.vjp(jax.nn.gelu, acts[i + 1])
        da = gelu_vjp(dh)[0]
        dwm_ref[0, i] = dwm_ref[0, i] + _dotg(hs[i], da, _MM_AT, prec)
        dbm_ref[0, i] = dbm_ref[0, i] + jnp.sum(da, axis=0)
        dh = _dotg(da, wm_ref[0, i], _MM_BT, prec)
    _, gelu_vjp0 = jax.vjp(jax.nn.gelu, acts[0])
    da0 = gelu_vjp0(dh)[0]
    dw1y_ref[:] = dw1y_ref[:] + _dotg(x_a, da0, _MM_AT, prec)[None]
    db1_ref[:] = db1_ref[:] + jnp.sum(da0, axis=0)[None, None, :]
    dhp_ref[0] = da0
    dx_a_mlp = _dotg(da0, w1y_ref[0], _MM_BT, prec)

    dx1 = jnp.concatenate([dx_a_direct + dx_a_mlp, dx1_b], axis=-1)

    # ActNorm grads (zero at the final coupling via is_inner)
    dld_total = jnp.sum(dld)
    dan_s_ref[:] = dan_s_ref[:] + is_inner * (
        jnp.sum(dx1 * x_k, axis=0) + dld_total / an_s_row[0]
    )[None, None, :]
    dan_b_ref[:] = dan_b_ref[:] + is_inner * jnp.sum(dx1, axis=0)[None, None, :]

    dx = dx1 * s_eff
    dx_full[rows, :] = dx
    dx_ref[:] = dx


@functools.lru_cache(maxsize=None)
def _make_fused_flow_train(
    n_steps: int, n_hidden: int, d_a: int, d_b: int, H: int,
    block_b: int, prec: str, interpret: bool,
):
    """Build the custom-VJP'd fused training forward for one static shape
    family. Positional signature:
    (x, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout) -> (z, ld)
    with an_s/an_b (K+1, 1, size), b1/bout (K+1, 1, ...) — the singleton
    middle axis keeps TPU block dims aligned (same as `fused_flow`)."""
    size = d_a + d_b

    def wspec(shape, rev):
        idx = (lambda a, b: (n_steps - 1 - a, *(0 for _ in shape))) if rev else (
            lambda a, b: (b, *(0 for _ in shape)))
        return pl.BlockSpec((1, *shape), idx, memory_space=pltpu.VMEM)

    def fwd_call(x, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout):
        B = x.shape[0]
        grid = (B // block_b, n_steps)
        batch_spec = pl.BlockSpec((block_b, size), lambda t, b: (t, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _flow_fwd_train_kernel,
            n_steps=n_steps, n_hidden=n_hidden, d_a=d_a, d_b=d_b, prec=prec,
        )
        z, ld, bound = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                batch_spec,
                pl.BlockSpec((1, block_b, H), lambda t, b: (b, t, 0), memory_space=pltpu.VMEM),
                wspec((1, size), False), wspec((1, size), False),
                wspec((size, size), False),
                wspec((d_a, H), False), wspec((1, H), False),
                wspec((n_hidden, H, H), False), wspec((n_hidden, H), False),
                wspec((H, 2 * d_b), False), wspec((1, 2 * d_b), False),
            ],
            out_specs=(
                batch_spec,
                pl.BlockSpec((block_b, 1), lambda t, b: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_b, size), lambda t, b: (b, t, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, size), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, B, size), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_b, size), jnp.float32),
                pltpu.VMEM((block_b, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout)
        return z, ld, bound

    def bwd_call(bound, h_proj, dz, dld, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout):
        B = dz.shape[0]
        grid = (n_steps, B // block_b)
        batch_spec_t = pl.BlockSpec((block_b, size), lambda g, t: (t, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _flow_bwd_train_kernel,
            n_steps=n_steps, n_hidden=n_hidden, d_a=d_a, d_b=d_b,
            block_b=block_b, prec=prec,
        )
        rev3 = lambda g, t: (n_steps - 1 - g, t, 0)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_b, size), rev3, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_b, H), rev3, memory_space=pltpu.VMEM),
                batch_spec_t,
                pl.BlockSpec((block_b, 1), lambda g, t: (t, 0), memory_space=pltpu.VMEM),
                wspec((1, size), True), wspec((1, size), True),
                wspec((size, size), True),
                wspec((d_a, H), True), wspec((1, H), True),
                wspec((n_hidden, H, H), True), wspec((n_hidden, H), True),
                wspec((H, 2 * d_b), True), wspec((1, 2 * d_b), True),
            ],
            out_specs=(
                batch_spec_t,                                           # dx
                pl.BlockSpec((1, block_b, H), rev3, memory_space=pltpu.VMEM),  # dh_proj
                wspec((1, size), True), wspec((1, size), True),         # dan_s/b
                wspec((d_a, H), True), wspec((1, H), True),             # dw1y, db1
                wspec((n_hidden, H, H), True), wspec((n_hidden, H), True),
                wspec((H, 2 * d_b), True), wspec((1, 2 * d_b), True),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, size), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, B, H), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, 1, size), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, 1, size), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, d_a, H), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, 1, H), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, n_hidden, H, H), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, n_hidden, H), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, H, 2 * d_b), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, 1, 2 * d_b), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((B, size), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(bound, h_proj, dz, dld, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout)
        return outs

    @jax.custom_vjp
    def f(x, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout):
        z, ld, _ = fwd_call(x, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout)
        return z, ld[:, 0]

    def f_fwd(x, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout):
        z, ld, bound = fwd_call(x, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout)
        return (z, ld[:, 0]), (bound, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout)

    def f_bwd(res, cts):
        bound, h_proj, an_s, an_b, ortho, w1y, b1, wm, bm, wout, bout = res
        dz, dld = cts
        (dx, dhp, dan_s, dan_b, dw1y, db1, dwm, dbm, dwout, dbout) = bwd_call(
            bound, h_proj, dz, dld[:, None], an_s, an_b, ortho,
            w1y, b1, wm, bm, wout, bout,
        )
        return (dx, dhp, dan_s, dan_b, jnp.zeros_like(ortho),
                dw1y, db1, dwm, dbm, dwout, dbout)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_flow_train(
    x: jnp.ndarray,
    h_proj: jnp.ndarray,
    kargs: dict,
    *,
    block_b: int = 512,
    precision: str = "default",
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray] | None:
    """Differentiable fused training forward (`z, logdet`) over the whole
    flow. Returns None when the shape family is unsupported (caller falls
    back to the XLA scan path). `kargs` per `stack_flow_params`/`pad_hidden`."""
    B, size = x.shape
    n_steps, _, H = h_proj.shape
    d_a = kargs["w1y"].shape[1]
    n_hidden = kargs["wm"].shape[1]
    bb = min(block_b, B)
    if B % bb:
        return None
    if precision not in ("default", "highest", "x3"):
        return None
    f = _make_fused_flow_train(
        n_steps, n_hidden, d_a, size - d_a, H, bb, precision, interpret
    )
    return f(
        x, h_proj,
        kargs["an_scale"][:, None, :], kargs["an_bias"][:, None, :],
        kargs["ortho"],
        kargs["w1y"], kargs["b1"][:, None, :], kargs["wm"], kargs["bm"],
        kargs["wout"], kargs["bout"][:, None, :],
    )
