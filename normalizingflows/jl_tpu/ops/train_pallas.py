"""Whole-training-run Pallas kernel for RealNVP ELBO training.

ONE `pallas_call` executes the ENTIRE Adam training scan on-chip: the grid
iterates over optimization steps (TPU grid steps run sequentially, so
output refs persist and act as the training carry), the coupling weights
and Adam moments stay VMEM-resident for the whole run, each step's
presampled base draws stream in per grid step, and per-step losses stream
out. Per step the kernel runs: forward through every coupling block
(+ log-det), target log-density + ELBO, the hand-written reverse sweep of
`ops/coupling_pallas.py`, and the Adam update — with ZERO HBM round-trips
for parameters/activations and zero per-op XLA dispatch between them.

This is the speed-of-light path for the reference's headline workload
(RealNVP on the hard banana, `example/demo_RealNVP.jl:20-61`): the config
is latency-bound (batch 16, d=2, [16,16]×3), so eliminating the ~10²
per-step op boundaries of the XLA scan body is worth more than any
single-op optimization. Equivalence with the unfused optax path is pinned
in tests/test_train_kernel.py (same presampled draws → same loss
trajectory and final weights within f32 tolerance).

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
    losses_ref = refs[n_w]
    w_refs = refs[n_w + 1:2 * n_w + 1]
    m_refs = refs[2 * n_w + 1:3 * n_w + 1]
    v_refs = refs[3 * n_w + 1:4 * n_w + 1]

    step = pl.program_id(0)

    # grid step 0: copy initial weights into the carried refs, zero moments
    @pl.when(step == 0)
    def _init():
        for wi, w, m, v in zip(w_in, w_refs, m_refs, v_refs):
            w[:] = wi[:]
            m[:] = wi[:] * 0
            v[:] = wi[:] * 0

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
    logp_y, pull = jax.vjp(target_logp, y)
    loc = loc_ref[:]      # (1, d), broadcasts over the batch
    scale = scale_ref[:]
    z = (x - loc) / scale
    logq0 = (
        -0.5 * jnp.sum(z * z, axis=-1)
        - jnp.sum(jnp.log(scale))
        - 0.5 * d * _LOG_2PI
    )
    loss = -jnp.mean(logp_y - logq0 + ld)
    losses_ref[0, 0] = loss

    # ---- backward: hand-written reverse sweep ------------------------------
    inv_b = 1.0 / batch
    (g,) = pull(jnp.full((batch,), -inv_b, dtype))
    gld = jnp.full((batch,), -inv_b, dtype)

    leaf_idx = jax.tree_util.tree_unflatten(tree_def, list(range(n_w)))
    # bias corrections 1 − βᵗ as exp(t·log β) — Mosaic lowers exp/log,
    # not a general scalar pow
    import math
    t = (step + 1).astype(dtype)
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
):
    """Run a FULL Adam/ELBO training scan in one Pallas kernel.

    ``xs``: (n_steps, batch, d) presampled base draws (one batch per step).
    ``groups``: FusedRealNVP stacked weights {'even'|'odd': {'s'|'t':
    [(W, b), ...]}} with leading block axis. ``target_logp``: jnp-traceable
    log-density (Python-scalar closure constants only). ``base_loc`` /
    ``base_scale``: (d,) diagonal-Gaussian base parameters.

    Returns ``(groups_trained, losses)`` with ``losses`` shaped (n_steps,).
    """
    n_steps, batch, d = xs.shape
    idx_even = tuple(int(i) for i in idx_even)
    idx_odd = tuple(int(i) for i in idx_odd)
    comp_even = tuple(i for i in range(d) if i not in set(idx_even))
    comp_odd = tuple(i for i in range(d) if i not in set(idx_odd))

    flat_w, tree_def = jax.tree_util.tree_flatten(groups)
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
    out = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, batch, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + carry_specs,
        out_specs=[pl.BlockSpec((1, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
        + carry_specs + carry_specs + carry_specs,
        out_shape=[jax.ShapeDtypeStruct((n_steps, 1), dtype)]
        + carry_shapes + carry_shapes + carry_shapes,
        interpret=interpret,
    )(xs, loc, scale, *flat_w)
    losses = out[0][:, 0]
    n_w = tree_def.num_leaves
    w_out = out[1:1 + n_w]
    groups_out = jax.tree_util.tree_unflatten(tree_def, list(w_out))
    return groups_out, losses
