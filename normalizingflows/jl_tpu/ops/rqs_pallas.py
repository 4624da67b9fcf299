"""Fused rational-quadratic-spline Pallas TPU kernel.

The TPU-native replacement for the reference's one perf-critical kernel
dependency, MonotonicSplines.jl (KernelAbstractions kernels consumed at
`src/flows/neuralspline.jl:65-140`). One `pallas_call` fuses, per element:

    raw conditioner outputs (3K−1)
      → softmax/cumsum knot normalization        (rqs_params_from_raw)
      → bin search (compare+sum over K lanes)
      → rational-quadratic forward/inverse + log-derivative

so the (N, K+1)×3 knot tables never touch HBM — the kernel reads 3K−1 raw
floats + 1 input and writes 2 outputs per element, the bandwidth floor.
Layout: elements on the sublane (row) axis, the K parameter lanes on the
lane axis; the cumsum is a (BLK,K)×(K,K) upper-triangular matmul (MXU),
bin-gathers are one-hot multiply-reductions (VPU) — no scalar loops, no
dynamic indexing.

The backward pass is a second Pallas kernel that RECOMPUTES the forward on
the tile and applies `jax.vjp` *inside* the kernel (flops traded for HBM
traffic; residuals never materialize). Exposed through `jax.custom_vjp`, so
`jax.grad` works in both directions — lifting the reference's Zygote-only
NSF restriction (`neuralspline.jl:207-212`).

Numerics are pinned against the pure-jnp oracle in `ops/rqs.py`
(tests/test_rqs_kernel.py) in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rqs as _oracle

__all__ = ["rqs_fused", "rqs_fused_forward", "rqs_fused_inverse"]

# Element rows per grid step. The backward kernel's in-kernel vjp holds
# O(30) live (BLK, K)-shaped intermediates on the VMEM stack; BLK=256 keeps
# that well under the 16MB scoped-vmem limit (1024 overflowed it on v5e).
BLK = 256


def _tile_transform(x, raw, B: float, K: int, inverse: bool):
    """Pure-jnp tile computation: (BLK,) x, (BLK, 3K−1) raw → y, ld.

    Written with Mosaic-friendly primitives only (matmul-cumsum, one-hot
    gathers); shared by the forward and backward kernels and — under
    standard jnp — identical in math to the `ops/rqs.py` oracle.
    """
    dtype = x.dtype
    mbw = _oracle.DEFAULT_MIN_BIN_WIDTH
    mbh = _oracle.DEFAULT_MIN_BIN_HEIGHT
    mder = _oracle.DEFAULT_MIN_DERIVATIVE

    w_raw = raw[:, :K]
    h_raw = raw[:, K:2 * K]
    d_raw = raw[:, 2 * K:]

    widths = jax.nn.softmax(w_raw, axis=-1)
    widths = mbw + (1.0 - mbw * K) * widths
    heights = jax.nn.softmax(h_raw, axis=-1)
    heights = mbh + (1.0 - mbh * K) * heights

    # knot grids via EXACT cumsum on the VPU. (A matmul with an upper-tri
    # ones matrix would use the MXU, whose f32 passes round like bf16 —
    # enough error to collapse the last bin against the pinned +B knot and
    # produce log(0) = −inf log-dets. K is tiny; an unrolled running sum is
    # exact and cheap.)
    two_B = jnp.asarray(2.0 * B, dtype)
    negB = jnp.asarray(-B, dtype)

    def _cumsum_lanes(a):
        cols = [a[:, :1]]
        for j in range(1, K):
            cols.append(cols[-1] + a[:, j:j + 1])
        return jnp.concatenate(cols, axis=-1)

    xs_hi = negB + two_B * _cumsum_lanes(widths)
    ys_hi = negB + two_B * _cumsum_lanes(heights)
    # knots k=0..K: xs[:,0] = −B, xs[:,k] = xs_hi[:,k−1]; pin last to +B
    # (we only need per-bin endpoints, so keep lo/hi views instead of
    # concatenating — avoids lane-shift ops)
    xs_lo = jnp.concatenate([jnp.full_like(xs_hi[:, :1], -B),
                             xs_hi[:, :-1]], axis=-1)
    ys_lo = jnp.concatenate([jnp.full_like(ys_hi[:, :1], -B),
                             ys_hi[:, :-1]], axis=-1)
    Bc = jnp.asarray(B, dtype)
    xs_hi = jnp.concatenate([xs_hi[:, :-1], jnp.full_like(xs_hi[:, :1], B)],
                            axis=-1)
    ys_hi = jnp.concatenate([ys_hi[:, :-1], jnp.full_like(ys_hi[:, :1], B)],
                            axis=-1)

    interior = mder + jax.nn.softplus(d_raw)
    one = jnp.ones_like(interior[:, :1])
    d_lo = jnp.concatenate([one, interior], axis=-1)        # d at knot k
    d_hi = jnp.concatenate([interior, one], axis=-1)        # d at knot k+1

    inside = (x >= -Bc) & (x <= Bc)
    v = jnp.clip(x, -Bc, Bc)

    # bin index: #{k : v >= lo_k} − 1, clipped — compare+sum over K lanes
    grid_lo = xs_lo if not inverse else ys_lo
    k = jnp.sum((v[:, None] >= grid_lo).astype(jnp.int32), axis=-1) - 1
    k = jnp.clip(k, 0, K - 1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], K), 1)
        == k[:, None]
    ).astype(dtype)

    def pick(t):
        return jnp.sum(t * onehot, axis=-1)

    x_k, x_k1 = pick(xs_lo), pick(xs_hi)
    y_k, y_k1 = pick(ys_lo), pick(ys_hi)
    d_k, d_k1 = pick(d_lo), pick(d_hi)

    # roundoff guard: normalization bounds w, h ≥ min_bin·2B mathematically;
    # clamp so a degenerate bin can never reach log(0)/0-div even at the
    # pinned ±B boundary
    tiny = jnp.asarray(1e-6 * 2.0 * B, dtype)
    w = jnp.maximum(x_k1 - x_k, tiny)
    h = jnp.maximum(y_k1 - y_k, tiny)
    s = h / w
    dsum = d_k1 + d_k - 2.0 * s

    if not inverse:
        xi = (v - x_k) / w
    else:
        dy = v - y_k
        a = h * (s - d_k) + dy * dsum
        b = h * d_k - dy * dsum
        c = -s * dy
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        xi = jnp.clip(2.0 * c / (-b - jnp.sqrt(disc)), 0.0, 1.0)

    xi1m = 1.0 - xi
    xi_prod = xi * xi1m
    denom = s + dsum * xi_prod
    deriv_num = (s * s) * (
        d_k1 * xi * xi + 2.0 * s * xi_prod + d_k * xi1m * xi1m
    )
    ld = jnp.log(deriv_num) - 2.0 * jnp.log(denom)

    if not inverse:
        out = y_k + h * (s * xi * xi + d_k * xi_prod) / denom
    else:
        out = x_k + xi * w
        ld = -ld

    out = jnp.where(inside, out, x)
    ld = jnp.where(inside, ld, jnp.zeros_like(ld))
    return out, ld


def _fwd_kernel(x_ref, raw_ref, y_ref, ld_ref, *, B, K, inverse):
    y, ld = _tile_transform(x_ref[:, 0], raw_ref[:], B, K, inverse)
    y_ref[:, 0] = y
    ld_ref[:, 0] = ld


def _bwd_kernel(x_ref, raw_ref, gy_ref, gld_ref, gx_ref, graw_ref,
                *, B, K, inverse):
    def fn(x, raw):
        return _tile_transform(x, raw, B, K, inverse)

    _, vjp = jax.vjp(fn, x_ref[:, 0], raw_ref[:])
    gx, graw = vjp((gy_ref[:, 0], gld_ref[:, 0]))
    gx_ref[:, 0] = gx
    graw_ref[:] = graw


def _pad_rows(a, n_pad):
    if n_pad == 0:
        return a
    pad = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def _call_fwd(x_flat, raw_flat, B, K, inverse, interpret):
    n = x_flat.shape[0]
    n_pad = (-n) % BLK
    xp = _pad_rows(x_flat[:, None], n_pad)
    rp = _pad_rows(raw_flat, n_pad)
    grid = (xp.shape[0] // BLK,)
    kern = functools.partial(_fwd_kernel, B=B, K=K, inverse=inverse)
    y, ld = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 3 * K - 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x_flat.dtype),
            jax.ShapeDtypeStruct(xp.shape, x_flat.dtype),
        ],
        interpret=interpret,
    )(xp, rp)
    return y[:n, 0], ld[:n, 0]


def _call_bwd(x_flat, raw_flat, gy, gld, B, K, inverse, interpret):
    n = x_flat.shape[0]
    n_pad = (-n) % BLK
    xp = _pad_rows(x_flat[:, None], n_pad)
    rp = _pad_rows(raw_flat, n_pad)
    gyp = _pad_rows(gy[:, None], n_pad)
    gldp = _pad_rows(gld[:, None], n_pad)
    grid = (xp.shape[0] // BLK,)
    kern = functools.partial(_bwd_kernel, B=B, K=K, inverse=inverse)
    gx, graw = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 3 * K - 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 3 * K - 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x_flat.dtype),
            jax.ShapeDtypeStruct(rp.shape, raw_flat.dtype),
        ],
        interpret=interpret,
    )(xp, rp, gyp, gldp)
    return gx[:n, 0], graw[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _rqs_fused(x_flat, raw_flat, B, inverse, interpret):
    K = (raw_flat.shape[-1] + 1) // 3
    return _call_fwd(x_flat, raw_flat, B, K, inverse, interpret)


def _rqs_fused_fwd(x_flat, raw_flat, B, inverse, interpret):
    out = _rqs_fused(x_flat, raw_flat, B, inverse, interpret)
    return out, (x_flat, raw_flat)


def _rqs_fused_bwd(B, inverse, interpret, res, g):
    x_flat, raw_flat = res
    gy, gld = g
    K = (raw_flat.shape[-1] + 1) // 3
    gx, graw = _call_bwd(x_flat, raw_flat, gy, gld, B, K, inverse, interpret)
    return gx, graw


_rqs_fused.defvjp(_rqs_fused_fwd, _rqs_fused_bwd)


def rqs_fused(
    x: jax.Array,
    raw: jax.Array,
    B: float,
    inverse: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused RQS transform of ``x`` (..., ) by per-element raw parameters
    ``raw`` (..., 3K−1). Returns (out, elementwise log|dy/dx|) — the fused
    equivalent of `rqs_params_from_raw` + `rqs_forward`/`rqs_inverse`."""
    batch_shape = x.shape
    x_flat = x.reshape(-1)
    raw_flat = raw.reshape(-1, raw.shape[-1])
    y, ld = _rqs_fused(x_flat, raw_flat, float(B), bool(inverse),
                       bool(interpret))
    return y.reshape(batch_shape), ld.reshape(batch_shape)


def rqs_fused_forward(x, raw, B, **kw):
    return rqs_fused(x, raw, B, inverse=False, **kw)


def rqs_fused_inverse(y, raw, B, **kw):
    return rqs_fused(y, raw, B, inverse=True, **kw)
