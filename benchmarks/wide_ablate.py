"""Where does the wide-RealNVP train step spend its time?

Ablation on the roofline config (d=128, [256,256]x10, batch 4096):
  1. pure matmul chain proxy at the step's exact shapes (MXU ceiling)
  2. flow forward only (sample + logdet)
  3. elbo forward (adds target logp + base logp)
  4. full train step (adds backward + Adam)

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/wide_ablate.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import optax

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.pytree import apply_mask, trainable_mask

DIM, HD, L, BATCH = 128, 256, 10, 4096


def slope(fn, n1=10, n2=30, reps=3):
    def timed(m):
        best = float("inf")
        for i in range(reps + 1):
            t0 = time.perf_counter()
            float(jnp.ravel(fn(m))[0])
            if i:
                best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = timed(n1), timed(n2)
    return max((t2 - t1) / (n2 - n1), 1e-12)


def report(name, per, flops):
    print(f"{name:24s} {per*1e3:8.3f} ms/step  "
          f"{flops/per/1e12:6.2f} TFLOP/s", flush=True)


def main(compute_dtype=jnp.bfloat16, remat=False):
    dt = "bf16" if compute_dtype == jnp.bfloat16 else "f32"
    print(f"=== compute_dtype={dt} remat={remat} ===", flush=True)
    flow = jax.jit(lambda k: nf.realnvp(
        k, DIM, (HD, HD), nlayers=L, compute_dtype=compute_dtype,
        remat=remat)
    )(jax.random.key(0))
    target = nf.Banana(DIM, 1.0, 100.0)

    half = DIM // 2
    mlp_flops = 2 * (half * HD + HD * HD + HD * half)
    fwd_flops = BATCH * mlp_flops * 2 * 2 * L

    # 1. pure-matmul proxy: the same 120 matmuls, chained
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    W1 = jax.random.normal(k1, (half, HD), compute_dtype) * 0.01
    W2 = jax.random.normal(k2, (HD, HD), compute_dtype) * 0.01
    W3 = jax.random.normal(k3, (HD, half), compute_dtype) * 0.01

    @functools.partial(jax.jit, static_argnums=1)
    def matmuls(x0, m):
        def body(c, _):
            x = c
            for _ in range(2 * 2 * L):
                h = jnp.tanh(x @ W1)
                h = jnp.tanh(h @ W2)
                x = (h @ W3).astype(compute_dtype)
            return x, None
        out, _ = jax.lax.scan(body, x0, None, length=m)
        return out

    x0 = jax.random.normal(jax.random.key(2), (BATCH, half), compute_dtype)
    per = slope(lambda m: matmuls(x0, m))
    report("matmul chain proxy", per, fwd_flops)

    # 2. flow forward only
    @functools.partial(jax.jit, static_argnums=1)
    def fwd(key, m):
        def body(c, k):
            y, lq = flow.sample_and_log_prob(k, (BATCH,))
            return c + y[0, 0] + lq[0], None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, m))
        return acc

    per = slope(lambda m: fwd(jax.random.key(3), m))
    report("flow fwd (sample+lq)", per, fwd_flops)

    # 3. elbo forward
    @functools.partial(jax.jit, static_argnums=1)
    def ef(key, m):
        def body(c, k):
            return c + nf.elbo_batch(k, flow, target.log_prob, BATCH), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, m))
        return acc

    per = slope(lambda m: ef(jax.random.key(4), m))
    report("elbo fwd", per, fwd_flops)

    # 4. value_and_grad WITHOUT the optimizer (fwd + backward only):
    # backward cost = this minus segment 3 (VERDICT r4 item 3 — name the
    # backward milliseconds)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def vg_only(carry, key):
        f, acc = carry
        loss, g = jax.value_and_grad(
            lambda f: -nf.elbo_batch(key, f, target.log_prob, BATCH))(f)
        # consume the grads so XLA cannot DCE them, but do NOT update
        gsum = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(
            apply_mask(g, mask)))
        return (f, acc + loss + gsum), None

    @functools.partial(jax.jit, static_argnums=1)
    def vg(key, m):
        (_, acc), _ = jax.lax.scan(
            vg_only, (flow, jnp.zeros(())), jax.random.split(key, m))
        return acc

    per = slope(lambda m: vg(jax.random.key(6), m))
    report("fwd+bwd (no Adam)", per, 3 * fwd_flops)

    # 5. Adam update alone at the step's exact pytree shapes: fixed grads,
    # scan over update+apply (elementwise over ~1.4M params)
    opt = optax.adam(1e-3)
    st0 = opt.init(flow)
    g_fixed = jax.tree_util.tree_map(lambda x: x * 0 + 1e-6, flow)
    g_fixed = apply_mask(g_fixed, mask)

    @functools.partial(jax.jit, static_argnums=1)
    def adam_only(_k, m):
        def body(carry, _):
            f, s = carry
            u, s = opt.update(g_fixed, s, f)
            return (optax.apply_updates(f, u), s), None
        (f, _), _ = jax.lax.scan(body, (flow, st0), None, length=m)
        return f.bijector.bijectors[0].stacked["s_even"].layers[0].W

    per = slope(lambda m: adam_only(None, m))
    report("Adam update alone", per, 0)

    # 6. full train step (segments 4+5 fused in one program)
    def step(carry, key):
        f, s = carry
        loss, g = jax.value_and_grad(
            lambda f: -nf.elbo_batch(key, f, target.log_prob, BATCH))(f)
        g = apply_mask(g, mask)
        u, s = opt.update(g, s, f)
        return (optax.apply_updates(f, u), s), loss

    st = opt.init(flow)

    @functools.partial(jax.jit, static_argnums=1)
    def train(key, m):
        (_, _), losses = jax.lax.scan(
            step, (flow, st), jax.random.split(key, m))
        return losses[-1]

    per = slope(lambda m: train(jax.random.key(5), m))
    report("full train step", per, 3 * fwd_flops)

    # 7. candidate optimizations, measured one at a time
    def train_variant(name, flow_v, presample=False, unroll=1,
                      flops=3 * fwd_flops):
        mask_v = trainable_mask(flow_v, frozen=lambda m: m is flow_v.base)

        def stepv(carry, inp):
            f, s = carry
            if presample:
                lossf = lambda f: -nf.elbo_from_samples(  # noqa: E731
                    inp, f, target.log_prob)
            else:
                lossf = lambda f: -nf.elbo_batch(  # noqa: E731
                    inp, f, target.log_prob, BATCH)
            loss, g = jax.value_and_grad(lossf)(f)
            g = apply_mask(g, mask_v)
            u, s = opt.update(g, s, f)
            return (optax.apply_updates(f, u), s), loss

        st_v = opt.init(flow_v)

        @functools.partial(jax.jit, static_argnums=1)
        def trainv(key, m):
            inp = (flow_v.base.sample(key, (m, BATCH)) if presample
                   else jax.random.split(key, m))
            (_, _), losses = jax.lax.scan(stepv, (flow_v, st_v), inp,
                                          unroll=unroll)
            return losses[-1]

        per = slope(lambda m: trainv(jax.random.key(7), m))
        report(name, per, flops)
        return per

    train_variant("  + presample", flow, presample=True)
    train_variant("  + unroll=2", flow, unroll=2)
    train_variant("  + presample+unroll2", flow, presample=True, unroll=2)


if __name__ == "__main__":
    main(jnp.bfloat16)
    main(jnp.bfloat16, remat=True)
    main(None, remat=True)
