"""RETIRED (archive path): measured ~180x slower than the
jitted lax.scan (benchmarks/KERNELS.md); kept correctness-pinned
(tests/test_train_kernel.py), gated off by the missing .fused_train_ok
sentinel.

Whole-training-run Pallas kernel for RealNVP ELBO training.

ONE `pallas_call` executes the ENTIRE Adam training scan on-chip: the grid
iterates over optimization steps (TPU grid steps run sequentially, so
output refs persist and act as the training carry), the coupling weights
and Adam moments stay VMEM-resident for the whole run, each step's
presampled base draws stream in per grid step, and per-step losses stream
out. Per step the kernel runs: forward through every coupling block
(+ log-det), target log-density + ELBO, the hand-written reverse sweep of
`ops/coupling_pallas.py`, and the Adam update — with ZERO HBM round-trips
for parameters/activations and zero per-op XLA dispatch between them.

MEASURED OUTCOME (benchmarks/KERNELS.md, TPU v5e, 2026-08-20): this is a
NEGATIVE result — ~180× slower than the jitted `lax.scan` over the unfused
optax step on the reference headline config (142 vs 25,347 steps/s), with
f32 trajectory drift past 5e-3 within 200 steps (Mosaic's dot-with-ones
reductions change accumulation order vs XLA). `lax.scan` already compiles
the whole training loop into one executable, so there was no per-step
dispatch to eliminate; the Mosaic grid serializes on SMEM scalar stores
and tiny non-MXU-shaped matmuls. Kept as a correctness-tested experiment
(equivalence with the optax path is pinned in tests/test_train_kernel.py,
interpret mode); NOT used by bench.py unless
benchmarks/validate_fused_train.py has validated it on real hardware and
written the sentinel — which it currently refuses to do.

Constraints (asserted in the wrapper):
  * the target log-density callable must be jnp-traceable with
    Python-scalar (not array) closure constants — Mosaic cannot lower
    captured constant ARRAYS, scalars are fine. Its gradient is taken
    in-kernel via `jax.vjp` (elementwise targets lower cleanly; the MLP
    backward that Mosaic refuses is hand-written, not vjp'd).
  * diagonal-Gaussian base (loc/scale passed as (1, d) operands).
  * Adam exactly mirrors `optax.adam` (bias-corrected moments,
    eps OUTSIDE the sqrt).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coupling_pallas import (
    _apply_coupling,
    _coupling_bwd,
    _coupling_fwd_cache,
    _sel_matrix,
    _weight_spec,
)

__all__ = ["adam_train_realnvp_fused"]

_LOG_2PI = 1.8378770664093453


def _train_kernel(
    step0_ref,
    xs_ref,
    loc_ref,
    scale_ref,
    *refs,
    tree_def,
    sels,
    n_blocks,
    target_logp,
    lr,
    b1,
    b2,
    eps,
):
    n_w = tree_def.num_leaves
    w_in = refs[:n_w]
    m_in = refs[n_w:2 * n_w]
    v_in = refs[2 * n_w:3 * n_w]
    losses_ref = refs[3 * n_w]
    w_refs = refs[3 * n_w + 1:4 * n_w + 1]
    m_refs = refs[4 * n_w + 1:5 * n_w + 1]
    v_refs = refs[5 * n_w + 1:6 * n_w + 1]

    step = pl.program_id(0)

    # grid step 0: copy the incoming weights/moments into the carried refs
    # (the grid is one CHUNK of the run; the wrapper threads them between
    # chunk launches)
    @pl.when(step == 0)
    def _init():
        for wi, mi, vi, w, m, v in zip(w_in, m_in, v_in,
                                       w_refs, m_refs, v_refs):
            w[:] = wi[:]
            m[:] = mi[:]
            v[:] = vi[:]

    x = xs_ref[0]  # (batch, d) — this step's presampled base draws
    batch, d = x.shape
    dtype = x.dtype
    groups = jax.tree_util.tree_unflatten(tree_def, [r[:] for r in w_refs])
    idx_e, comp_e, idx_o, comp_o = sels
    sel_ae = _sel_matrix(d, idx_e, dtype)
    sel_be = _sel_matrix(d, comp_e, dtype)
    sel_ao = _sel_matrix(d, idx_o, dtype)
    sel_bo = _sel_matrix(d, comp_o, dtype)

    def block_weights(i):
        def at(pair):
            W, b = pair
            return W[i], b[i]
        return (
            [at(p) for p in groups["even"]["s"]],
            [at(p) for p in groups["even"]["t"]],
            [at(p) for p in groups["odd"]["s"]],
            [at(p) for p in groups["odd"]["t"]],
        )

    # ---- forward: whole coupling stack, caching each coupling's input ----
    ld = x[:, 0] * 0
    inputs = []  # (block_idx, group, sel_a, sel_b, s_w, t_w, x_in)
    y = x
    for i in range(n_blocks):
        es, et, osw, otw = block_weights(i)
        for (bi, grp, sa, sb, sw, tw) in (
            (i, "even", sel_ae, sel_be, es, et),
            (i, "odd", sel_ao, sel_bo, osw, otw),
        ):
            inputs.append((bi, grp, sa, sb, sw, tw, y))
            y, ld = _apply_coupling(y, ld, sa, sb, sw, tw, False)

    # ---- loss: negative ELBO over the batch --------------------------------
    # Scalar reductions go through the MXU as dot-with-ones: Mosaic cannot
    # lower full 1-D vector reductions here ("Not implemented: Offset
    # change" on the vector.multi_reduction it emits for jnp.mean/sum of a
    # (batch,) vector whose layout carries an implicit-dim offset).
    logp_y, pull = jax.vjp(target_logp, y)
    loc = loc_ref[:]      # (1, d), broadcasts over the batch
    scale = scale_ref[:]
    ones_d = jnp.ones((d, 1), dtype)
    log_scale_sum = jnp.dot(jnp.log(scale), ones_d,
                            preferred_element_type=dtype)[0, 0]
    z = (x - loc) / scale
    logq0 = (
        -0.5 * jnp.dot(z * z, ones_d, preferred_element_type=dtype)[:, 0]
        - log_scale_sum
        - 0.5 * d * _LOG_2PI
    )
    terms = (logp_y - logq0 + ld)[None, :]  # (1, batch)
    ones_b = jnp.ones((batch, 1), dtype)
    loss = -jnp.dot(terms, ones_b, preferred_element_type=dtype)[0, 0] / batch
    # whole-array SMEM ref (persists across grid steps); dynamic scalar store
    losses_ref[step, 0] = loss

    # ---- backward: hand-written reverse sweep ------------------------------
    inv_b = 1.0 / batch
    (g,) = pull(jnp.full((batch,), -inv_b, dtype))
    gld = jnp.full((batch,), -inv_b, dtype)

    leaf_idx = jax.tree_util.tree_unflatten(tree_def, list(range(n_w)))
    # bias corrections 1 − βᵗ as exp(t·log β) — Mosaic lowers exp/log,
    # not a general scalar pow. t is the GLOBAL step: chunk base + local.
    import math
    t = (step0_ref[0, 0] + step + 1).astype(dtype)
    corr1 = 1.0 - jnp.exp(t * math.log(b1))
    corr2 = 1.0 - jnp.exp(t * math.log(b2))

    def adam_update(grp, net, bi, gws):
        """optax.adam-exact update applied to the [bi] slice of each
        stacked leaf, in place."""
        for li, grads in enumerate(gws):
            for ref_i, gleaf in zip(leaf_idx[grp][net][li], grads):
                w_ref, m_ref, v_ref = w_refs[ref_i], m_refs[ref_i], v_refs[ref_i]
                m = b1 * m_ref[bi] + (1.0 - b1) * gleaf
                v = b2 * v_ref[bi] + (1.0 - b2) * gleaf * gleaf
                m_ref[bi] = m
                v_ref[bi] = v
                update = (m / corr1) / (jnp.sqrt(v / corr2) + eps)
                w_ref[bi] = w_ref[bi] - lr * update

    ld0 = x[:, 0] * 0
    for (bi, grp, sa, sb, sw, tw, x_in) in reversed(inputs):
        _, _, cache = _coupling_fwd_cache(x_in, ld0, sa, sb, sw, tw, False)
        g, gws_s, gws_t = _coupling_bwd(g, gld, cache, sa, sb, sw, tw, False)
        adam_update(grp, "s", bi, gws_s)
        adam_update(grp, "t", bi, gws_t)


def adam_train_realnvp_fused(
    xs: jax.Array,
    groups: dict,
    idx_even: tuple,
    idx_odd: tuple,
    target_logp: Callable,
    base_loc: jax.Array,
    base_scale: jax.Array,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
    chunk: int = 512,
):
    """Run a FULL Adam/ELBO training scan in Pallas kernel launches.

    ``xs``: (n_steps, batch, d) presampled base draws (one batch per step).
    ``groups``: FusedRealNVP stacked weights {'even'|'odd': {'s'|'t':
    [(W, b), ...]}} with leading block axis. ``target_logp``: jnp-traceable
    log-density (Python-scalar closure constants only). ``base_loc`` /
    ``base_scale``: (d,) diagonal-Gaussian base parameters.

    The run is split into launches of ``chunk`` grid steps: per-step scalar
    losses live in one whole-array SMEM ref (TPU pads each SMEM window
    scalar to 512 B, so the ~1 MiB SMEM caps a launch at ~2048 steps), and
    weights/Adam moments are threaded between launches through HBM —
    O(n_steps / chunk) round-trips of a few-KB pytree, with everything
    VMEM-resident within a chunk.

    Returns ``(groups_trained, losses)`` with ``losses`` shaped (n_steps,).
    """
    n_steps, batch, d = xs.shape
    idx_even = tuple(int(i) for i in idx_even)
    idx_odd = tuple(int(i) for i in idx_odd)
    comp_even = tuple(i for i in range(d) if i not in set(idx_even))
    comp_odd = tuple(i for i in range(d) if i not in set(idx_odd))

    flat_w, tree_def = jax.tree_util.tree_flatten(groups)
    n_w = tree_def.num_leaves
    n_blocks = flat_w[0].shape[0]
    dtype = xs.dtype
    loc = jnp.broadcast_to(base_loc, (d,)).astype(dtype)[None, :]
    scale = jnp.broadcast_to(base_scale, (d,)).astype(dtype)[None, :]

    kern = functools.partial(
        _train_kernel,
        tree_def=tree_def,
        sels=(idx_even, comp_even, idx_odd, comp_odd),
        n_blocks=n_blocks,
        target_logp=target_logp,
        lr=float(lr),
        b1=float(b1),
        b2=float(b2),
        eps=float(eps),
    )
    carry_specs = [_weight_spec(a) for a in flat_w]
    carry_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat_w]

    def run_chunk(step0, xs_c, flat_w, flat_m, flat_v):
        c = xs_c.shape[0]
        out = pl.pallas_call(
            kern,
            grid=(c,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, batch, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            + carry_specs + carry_specs + carry_specs,
            # whole-array SMEM block: a (1, 1) sliding block is unlowerable
            # (TPU blocks must tile to (8, 128) or equal the array dims);
            # the full (c, 1) ref persists across grid steps and takes
            # dynamic scalar stores
            out_specs=[pl.BlockSpec((c, 1), lambda i: (0, 0),
                                    memory_space=pltpu.SMEM)]
            + carry_specs + carry_specs + carry_specs,
            out_shape=[jax.ShapeDtypeStruct((c, 1), dtype)]
            + carry_shapes + carry_shapes + carry_shapes,
            interpret=interpret,
        )(step0, xs_c, loc, scale, *flat_w, *flat_m, *flat_v)
        losses = out[0][:, 0]
        return (list(out[1:1 + n_w]), list(out[1 + n_w:1 + 2 * n_w]),
                list(out[1 + 2 * n_w:1 + 3 * n_w]), losses)

    flat_m = [jnp.zeros_like(a) for a in flat_w]
    flat_v = [jnp.zeros_like(a) for a in flat_w]
    losses_parts = []
    start = 0
    while start < n_steps:
        c = min(chunk, n_steps - start)
        step0 = jnp.full((1, 1), start, jnp.int32)
        flat_w, flat_m, flat_v, losses_c = run_chunk(
            step0, xs[start:start + c], flat_w, flat_m, flat_v
        )
        losses_parts.append(losses_c)
        start += c
    losses = (losses_parts[0] if len(losses_parts) == 1
              else jnp.concatenate(losses_parts))
    groups_out = jax.tree_util.tree_unflatten(tree_def, flat_w)
    return groups_out, losses
