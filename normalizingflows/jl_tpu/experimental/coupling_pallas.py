"""Fused full-flow RealNVP Pallas kernel — RETIRED (archive path).

STATUS (round 4): measured NET LOSS vs XLA on every configuration,
including the bf16 rematch (2277 vs 7605 steps/s on the wide train row —
benchmarks/KERNELS.md "Round-4 bf16 rematch → RETIRED"). Kept
correctness-pinned (tests/test_coupling_kernel.py) as the documented
counterfactual; `realnvp(fused=False)` is the default everywhere and no
production path constructs this kernel.

One `pallas_call` applies an ENTIRE stack of affine-coupling blocks —
partition, both conditioner MLPs, exp-scale-shift, log-det row-reduction,
and combine, for every block — while the activations stay resident in VMEM.
The unfused path (even as one XLA program) writes each layer's (batch, d)
intermediates and each conditioner's (batch, h) activations to HBM; this
kernel reads x once and writes (y, log_det) once per tile — the bandwidth
floor for the sampling / ELBO-forward paths (reference hot loop:
`src/flows/realnvp.jl:77-83` under `_batched_elbos`,
`src/objectives/elbo.jl:65-70`).

Layout & mapping:
  * grid over batch tiles (TILE rows); all stacked block weights live in
    VMEM whole (a RealNVP conditioner stack is KBs).
  * partition/combine are one-hot selection matmuls (x @ Sel, y @ Selᵀ) on
    the MXU — works for ANY static mask, no gathers.
  * block loop is a `fori_loop` with dynamic indexing into the stacked
    weight refs; within a block: even-mask coupling then odd-mask coupling
    (`RealNVP_layer`, reference `realnvp.jl:132-145`).
  * backward = recompute-forward + a HAND-WRITTEN reverse sweep INSIDE a
    second kernel (flops traded for HBM traffic; no residuals
    materialize), exposed via `jax.custom_vjp`. The backward must be
    manual: `jax.vjp` inside the kernel emits `add_any` cotangent
    accumulations that Mosaic fuses into `vector.multi_reduction` ops
    with non-constant accumulators, which it refuses to compile
    ("only constant accumulators supported") — explicit matmuls + adds
    lower cleanly.

Weight pytree convention (see `models/coupling.py::FusedRealNVP`): two
coupling groups ('even', 'odd'); each group is a dict of stacked Dense
params with leading axis n_blocks:
    {'s': [(W, b), ...depth], 't': [(W, b), ...depth]}
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["coupling_stack_fused"]

TILE = 256


def _leaky_relu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _sel_matrix(dim, idx, dtype):
    """One-hot selection matrix (dim, |idx|) built from STATIC indices via
    iota + scalar compares only (no captured constant arrays — pallas
    requires kernel-closure constants to be built in-kernel)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (dim, len(idx)), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (dim, len(idx)), 1)
    target = jnp.zeros((dim, len(idx)), jnp.int32)
    for j, i in enumerate(idx):
        target = jnp.where(cols == j, jnp.int32(i), target)
    return (rows == target).astype(dtype)


# Full-f32 matmuls: TPU DEFAULT precision rounds f32 inputs to bf16 on the
# MXU, which corrupts the one-hot selection products (x itself gets rounded)
# and compounds across the coupling stack. These matrices are tiny (d and
# hdims ≤ a few hundred); the kernel is bandwidth-bound, so HIGHEST is free.
_PREC = jax.lax.Precision.HIGHEST


def _dot(a, b, cd=None):
    """Matmul. ``cd`` (compute dtype, e.g. bf16) applies the same mixed-
    precision policy as `nets._mixed_matmul` — bf16 operands, f32
    accumulation, one native MXU pass — to the CONDITIONER matmuls only.
    Selection matmuls always run HIGHEST: they are one-hot picks whose
    product must reproduce x's values exactly."""
    if cd is not None:
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=jnp.float32).astype(a.dtype)
    return jnp.dot(a, b, precision=_PREC, preferred_element_type=a.dtype)


def _mlp(xb, weights, out_tanh, cd=None):
    """Apply a Dense chain [(W,b), ...] with leaky-relu hiddens."""
    h = xb
    depth = len(weights)
    for li, (W, b) in enumerate(weights):
        h = _dot(h, W, cd) + b
        if li < depth - 1:
            h = _leaky_relu(h)
        elif out_tanh:
            h = jnp.tanh(h)
    return h


def _apply_coupling(x, ld, sel_a, sel_b, s_weights, t_weights, inverse,
                    cd=None):
    """One affine coupling on a (TILE, d) tile with selection matmuls."""
    x_a = _dot(x, sel_a)
    x_b = _dot(x, sel_b)
    s = _mlp(x_b, s_weights, out_tanh=True, cd=cd)
    t = _mlp(x_b, t_weights, out_tanh=False, cd=cd)
    if inverse:
        y_a = (x_a - t) * jnp.exp(-s)
        ld = ld - jnp.sum(s, axis=-1)
    else:
        y_a = x_a * jnp.exp(s) + t
        ld = ld + jnp.sum(s, axis=-1)
    y = _dot(y_a, sel_a.T) + _dot(x_b, sel_b.T)
    return y, ld


def _tile_flow(x, flat_weights, *, tree_def, sels, n_blocks, depth, inverse,
               compute_dtype=None):
    """Whole-flow transform of a (TILE, d) tile. Pure jnp — shared by the
    forward kernel and the in-kernel vjp of the backward kernel.

    flat_weights: flat list of stacked arrays (leading axis n_blocks).
    sels: STATIC index tuples (idx_even, comp_even, idx_odd, comp_odd)."""
    groups = jax.tree_util.tree_unflatten(tree_def, flat_weights)
    d = x.shape[-1]
    idx_e, comp_e, idx_o, comp_o = sels
    sel_ae = _sel_matrix(d, idx_e, x.dtype)
    sel_be = _sel_matrix(d, comp_e, x.dtype)
    sel_ao = _sel_matrix(d, idx_o, x.dtype)
    sel_bo = _sel_matrix(d, comp_o, x.dtype)
    ld = x[:, 0] * 0

    def block(i, carry):
        # i is a PYTHON int (the loop is unrolled): W[i] is a STATIC slice.
        # Mosaic cannot lower dynamic_slice on the stacked weight arrays
        # inside a fori_loop, so the block loop must be unrolled — n_blocks
        # is small and static (reference default 10, `realnvp.jl:190-192`),
        # and the weights are VMEM-resident either way.
        x, ld = carry

        def at(pair):
            W, b = pair
            return W[i], b[i]

        even_s = [at(p) for p in groups["even"]["s"]]
        even_t = [at(p) for p in groups["even"]["t"]]
        odd_s = [at(p) for p in groups["odd"]["s"]]
        odd_t = [at(p) for p in groups["odd"]["t"]]
        if not inverse:
            x, ld = _apply_coupling(x, ld, sel_ae, sel_be, even_s, even_t,
                                    False, compute_dtype)
            x, ld = _apply_coupling(x, ld, sel_ao, sel_bo, odd_s, odd_t,
                                    False, compute_dtype)
        else:
            x, ld = _apply_coupling(x, ld, sel_ao, sel_bo, odd_s, odd_t,
                                    True, compute_dtype)
            x, ld = _apply_coupling(x, ld, sel_ae, sel_be, even_s, even_t,
                                    True, compute_dtype)
        return x, ld

    order = range(n_blocks - 1, -1, -1) if inverse else range(n_blocks)
    for i in order:
        x, ld = block(i, (x, ld))
    return x, ld


def _fwd_kernel(x_ref, *refs, tree_def, sels, n_blocks, depth, inverse,
                compute_dtype=None):
    *w_refs, y_ref, ld_ref = refs
    y, ld = _tile_flow(
        x_ref[:], [r[:] for r in w_refs],
        tree_def=tree_def, sels=sels, n_blocks=n_blocks, depth=depth,
        inverse=inverse, compute_dtype=compute_dtype,
    )
    y_ref[:] = y
    ld_ref[:, 0] = ld


def _mlp_fwd_cache(xb, weights, out_tanh, cd=None):
    """_mlp with residuals: (out, (layer_inputs, layer_outputs))."""
    h = xb
    depth = len(weights)
    inputs, outputs = [], []
    for li, (W, b) in enumerate(weights):
        inputs.append(h)
        z = _dot(h, W, cd) + b
        if li < depth - 1:
            h = _leaky_relu(z)
        elif out_tanh:
            h = jnp.tanh(z)
        else:
            h = z
        outputs.append(h)
    return h, (inputs, outputs)


def _mlp_bwd(weights, cache, gout, out_tanh, cd=None):
    """Manual reverse sweep of `_mlp`. Returns (g_input, [(gW, gb), ...]).

    Activation derivatives are reconstructed from the cached POST-
    activations: leaky-relu slope = 1 where h > 0 else 0.01 (h and z share
    sign); tanh' = 1 - h^2."""
    inputs, outputs = cache
    depth = len(weights)
    g = gout
    gws = [None] * depth
    for li in range(depth - 1, -1, -1):
        h = outputs[li]
        if li == depth - 1:
            if out_tanh:
                g = g * (1.0 - h * h)
        else:
            g = g * jnp.where(h >= 0, h * 0 + 1.0, h * 0 + 0.01)
        W, _ = weights[li]
        gW = _dot(inputs[li].T, g, cd)
        gb = jnp.sum(g, axis=0)
        gws[li] = (gW, gb)
        g = _dot(g, W.T, cd)
    return g, gws


def _coupling_fwd_cache(x, ld, sel_a, sel_b, s_w, t_w, inverse, cd=None):
    """`_apply_coupling` keeping the residuals the reverse sweep needs."""
    x_a = _dot(x, sel_a)
    x_b = _dot(x, sel_b)
    s, cs = _mlp_fwd_cache(x_b, s_w, out_tanh=True, cd=cd)
    t, ct = _mlp_fwd_cache(x_b, t_w, out_tanh=False, cd=cd)
    if inverse:
        y_a = (x_a - t) * jnp.exp(-s)
        ld = ld - jnp.sum(s, axis=-1)
    else:
        y_a = x_a * jnp.exp(s) + t
        ld = ld + jnp.sum(s, axis=-1)
    y = _dot(y_a, sel_a.T) + _dot(x_b, sel_b.T)
    return y, ld, (x_a, s, t, cs, ct)


def _coupling_bwd(g, gld, cache, sel_a, sel_b, s_w, t_w, inverse,
                  cd=None):
    """Reverse sweep of one coupling. `g` is the cotangent of y, `gld` the
    (TILE,) cotangent of the running log-det (which every coupling's s
    receives, since ld is a plain sum over couplings)."""
    x_a, s, t, cs, ct = cache
    g_ya = _dot(g, sel_a)
    g_xb = _dot(g, sel_b)
    gld_b = jnp.broadcast_to(gld[:, None], s.shape)
    if inverse:
        e = jnp.exp(-s)
        g_xa = g_ya * e
        g_t = -g_xa
        g_s = -g_ya * (x_a - t) * e - gld_b
    else:
        e = jnp.exp(s)
        g_xa = g_ya * e
        g_t = g_ya
        g_s = g_ya * x_a * e + gld_b
    gxb_s, gws_s = _mlp_bwd(s_w, cs, g_s, out_tanh=True, cd=cd)
    gxb_t, gws_t = _mlp_bwd(t_w, ct, g_t, out_tanh=False, cd=cd)
    g_xb = g_xb + gxb_s + gxb_t
    gx = _dot(g_xa, sel_a.T) + _dot(g_xb, sel_b.T)
    return gx, gws_s, gws_t


def _bwd_kernel(x_ref, *refs, tree_def, sels, n_blocks, depth, inverse,
                compute_dtype=None):
    n_w = tree_def.num_leaves
    w_refs = refs[:n_w]
    gy_ref, gld_ref = refs[n_w:n_w + 2]
    gx_ref = refs[n_w + 2]
    gw_refs = refs[n_w + 3:]

    groups = jax.tree_util.tree_unflatten(tree_def, [r[:] for r in w_refs])
    x = x_ref[:]
    d = x.shape[-1]
    idx_e, comp_e, idx_o, comp_o = sels
    sel_ae = _sel_matrix(d, idx_e, x.dtype)
    sel_be = _sel_matrix(d, comp_e, x.dtype)
    sel_ao = _sel_matrix(d, idx_o, x.dtype)
    sel_bo = _sel_matrix(d, comp_o, x.dtype)

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

    # recompute-forward, caching ONLY each coupling's (tile, d) input (the
    # order = exactly the order `_tile_flow` applies couplings for this
    # `inverse` flag). MLP activations are recomputed one coupling at a time
    # in the reverse sweep below, so peak VMEM is O(couplings · d) rows of
    # cache + ONE coupling's activations — not O(couplings · hidden), which
    # blows the 16 MiB scoped-vmem stack for wide flows (d≈128, h≈128).
    ld0 = x[:, 0] * 0
    inputs = []  # (block_idx, group, sel_a, sel_b, s_w, t_w, x_in)
    order = range(n_blocks - 1, -1, -1) if inverse else range(n_blocks)
    for i in order:
        es, et, osw, otw = block_weights(i)
        if not inverse:
            pairs = ((i, "even", sel_ae, sel_be, es, et),
                     (i, "odd", sel_ao, sel_bo, osw, otw))
        else:
            pairs = ((i, "odd", sel_ao, sel_bo, osw, otw),
                     (i, "even", sel_ae, sel_be, es, et))
        for (bi, grp, sa, sb, sw, tw) in pairs:
            inputs.append((bi, grp, sa, sb, sw, tw, x))
            x, _ = _apply_coupling(x, ld0, sa, sb, sw, tw, inverse,
                                   compute_dtype)

    # reverse sweep: per coupling, rebuild its MLP caches from the saved
    # input, run the manual backward, and write each weight-grad slice
    # STRAIGHT into its stacked output ref (block index is a static Python
    # int). No gmap/jnp.stack assembly — that would keep a second
    # weights-worth of temporaries live and blow scoped VMEM on wide flows.
    # `leaf_idx[grp][net][li]` = (iW, ib) positions in the flattened order.
    leaf_idx = jax.tree_util.tree_unflatten(
        tree_def, list(range(tree_def.num_leaves))
    )

    def write_grads(grp, net, bi, gws):
        for li, (gW, gb) in enumerate(gws):
            iW, ib = leaf_idx[grp][net][li]
            for ref, val in ((gw_refs[iW], gW), (gw_refs[ib], gb)):
                # accumulate over grid steps (batch tiles)
                @pl.when(pl.program_id(0) == 0)
                def _init(ref=ref, val=val, bi=bi):
                    ref[bi] = val

                @pl.when(pl.program_id(0) != 0)
                def _acc(ref=ref, val=val, bi=bi):
                    ref[bi] = ref[bi] + val

    g = gy_ref[:]
    gld = gld_ref[:, 0]
    for (bi, grp, sa, sb, sw, tw, x_in) in reversed(inputs):
        _, _, cache = _coupling_fwd_cache(x_in, ld0, sa, sb, sw, tw,
                                          inverse, compute_dtype)
        g, gws_s, gws_t = _coupling_bwd(g, gld, cache, sa, sb, sw, tw,
                                        inverse, compute_dtype)
        write_grads(grp, "s", bi, gws_s)
        write_grads(grp, "t", bi, gws_t)
    gx_ref[:] = g


def _pad_rows(a, n_pad):
    if n_pad == 0:
        return a
    return jnp.pad(a, [(0, n_pad)] + [(0, 0)] * (a.ndim - 1))


def _weight_spec(a):
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _call_fwd(x, flat_w, static, interpret):
    n, d = x.shape
    n_pad = (-n) % TILE
    xp = _pad_rows(x, n_pad)
    grid = (xp.shape[0] // TILE,)
    kern = functools.partial(_fwd_kernel, **static)
    y, ld = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((TILE, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [_weight_spec(a) for a in flat_w],
        out_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x.dtype),
            jax.ShapeDtypeStruct((xp.shape[0], 1), x.dtype),
        ],
        interpret=interpret,
    )(xp, *flat_w)
    return y[:n], ld[:n, 0]


def _bwd_tile(d, flat_w, tree_def, itemsize):
    """Largest batch tile whose backward residual cache fits scoped VMEM.

    The reverse kernel holds every coupling's (tile, d) INPUT plus one
    coupling's recomputed MLP activations live at once; the footprint is
    per-row-linear, so shrink the tile until it fits the ~16 MiB
    scoped-vmem stack (with headroom for weights/grads and Mosaic
    temporaries)."""
    groups = jax.tree_util.tree_unflatten(tree_def, flat_w)
    n_blocks = flat_w[0].shape[0]
    # x, gy, g, gx + saved per-coupling inputs + logdet columns / slack
    per_row = 4 * d + 8 + 2 * n_blocks * d
    weight_floats = 0
    max_cache = 0
    for grp in ("even", "odd"):
        c = groups[grp]["s"][-1][0].shape[2]  # n transformed
        floats = 3 * c  # x_a, s, t
        for net in ("s", "t"):
            for (W, b) in groups[grp][net]:
                floats += W.shape[1] + W.shape[2]  # cached in + out per layer
                weight_floats += W.shape[0] * W.shape[1] * W.shape[2]
                weight_floats += b.shape[0] * b.shape[1]
        max_cache = max(max_cache, floats)  # one coupling live at a time
    per_row += max_cache + 2 * d  # + double-buffered x/gy input blocks
    # Mosaic's stack allocator does NOT fully reuse slots across the
    # unrolled coupling sweep (measured on v5e: ~4× the ideal live-set
    # model at d=128, L=6, h=128), so scale the per-row model accordingly.
    per_row *= 4
    # weights in + grad refs out (grad slices write in place, no stack temp)
    fixed = 3 * weight_floats * itemsize
    budget = 14 * 1024 * 1024 - fixed  # headroom under the 16 MiB scoped cap
    tile = TILE
    while tile > 8 and tile * per_row * itemsize > budget:
        tile //= 2
    return max(tile, 8)


def _call_bwd(x, flat_w, gy, gld, static, interpret):
    n, d = x.shape
    tile = _bwd_tile(d, flat_w, static["tree_def"], x.dtype.itemsize)
    n_pad = (-n) % tile
    xp = _pad_rows(x, n_pad)
    gyp = _pad_rows(gy, n_pad)
    gldp = _pad_rows(gld[:, None], n_pad)
    grid = (xp.shape[0] // tile,)
    kern = functools.partial(_bwd_kernel, **static)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [_weight_spec(a) for a in flat_w]
        + [
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
        + [_weight_spec(a) for a in flat_w],
        out_shape=[jax.ShapeDtypeStruct(xp.shape, x.dtype)]
        + [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat_w],
        interpret=interpret,
    )(xp, *flat_w, gyp, gldp)
    gx, gws = out[0][:n], out[1:]
    return gx, list(gws)


def _make_static(tree_def, sels, n_blocks, depth, inverse,
                 compute_dtype=None):
    return dict(tree_def=tree_def, sels=sels, n_blocks=n_blocks,
                depth=depth, inverse=inverse, compute_dtype=compute_dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _fused(x, flat_w, tree_def, sels, n_blocks, depth, inverse, interpret,
           compute_dtype=None):
    static = _make_static(tree_def, sels, n_blocks, depth, inverse,
                          compute_dtype)
    return _call_fwd(x, flat_w, static, interpret)


def _fused_fwd(x, flat_w, tree_def, sels, n_blocks, depth, inverse,
               interpret, compute_dtype=None):
    out = _fused(x, flat_w, tree_def, sels, n_blocks, depth, inverse,
                 interpret, compute_dtype)
    return out, (x, flat_w)


def _fused_bwd(tree_def, sels, n_blocks, depth, inverse, interpret,
               compute_dtype, res, g):
    x, flat_w = res
    gy, gld = g
    static = _make_static(tree_def, sels, n_blocks, depth, inverse,
                          compute_dtype)
    gx, gw = _call_bwd(x, flat_w, gy, gld, static, interpret)
    return gx, gw


_fused.defvjp(_fused_fwd, _fused_bwd)


def coupling_stack_fused(
    x: jax.Array,
    groups: dict,
    idx_even: tuple,
    idx_odd: tuple,
    inverse: bool = False,
    interpret: bool = False,
    compute_dtype=None,
):
    """Fused RealNVP stack transform.

    ``x``: (..., d). ``groups``: {'even'|'odd': {'s'|'t': [(W,b),...]}}
    with stacked leading block axis. ``idx_even``/``idx_odd``: the
    transformed index sets of the two couplings in each block.
    Returns (y, log_det) with log_det shaped (...,).
    """
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    idx_even = tuple(int(i) for i in idx_even)
    idx_odd = tuple(int(i) for i in idx_odd)
    comp_even = tuple(i for i in range(d) if i not in set(idx_even))
    comp_odd = tuple(i for i in range(d) if i not in set(idx_odd))

    flat_w, tree_def = jax.tree_util.tree_flatten(groups)
    n_blocks = flat_w[0].shape[0]
    depths = {
        (grp, net): len(groups[grp][net])
        for grp in ("even", "odd")
        for net in ("s", "t")
    }
    if len(set(depths.values())) != 1:
        # the kernel assembles stacked weight grads with one shared depth;
        # asymmetric conditioners must fail loudly at the API boundary
        raise ValueError(
            "coupling_stack_fused requires all four conditioner stacks "
            f"(even/odd × s/t) to share the same depth; got {depths}"
        )
    depth = len(groups["even"]["s"])
    y, ld = _fused(
        x2, flat_w, tree_def, (idx_even, comp_even, idx_odd, comp_odd),
        n_blocks, depth, bool(inverse), bool(interpret), compute_dtype,
    )
    return y.reshape(x.shape), ld.reshape(batch_shape)
