"""Planar-flow capacity diagnosis on Banana(2, 1, 10) (VERDICT r3 item 5).

PARITY.md's planar row shows SW₂ 8.45 (floor 0.17) at ELBO −0.32 while the
reference's docs display a visually matching trained planar flow
(`/root/reference/docs/src/PlanarFlow.md:102,125`). This script replaces
the "mode-seeking, probably fine" explanation with measured bounds, in the
spirit of the NSF treatment (`benchmarks/nsf_diagnose.py`):

  * reverse-KL depth sweep — nlayers 10/32/64 × seeds, long training with
    a cosine schedule: what ELBO/SW₂ CAN n planar layers reach when the
    objective is the demo's own (mode-seeking) reverse KL?
  * forward-KL MLE — fit the same architectures to EXACT target samples
    (mass-covering; independent of mode-seeking): the capacity bound.
    KL(p‖q) = E_p[log p] − E_p[log q] with E_p[log p] computed from the
    target's exact density.

Writes benchmarks/PLANAR_DIAGNOSE.md.
Usage: python benchmarks/planar_diagnose.py [--iters N] [--quick]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.data import NumpyLoader

HERE = Path(__file__).resolve().parent
MD_PATH = HERE / "PLANAR_DIAGNOSE.md"

DIM, BANANA_B, BANANA_VAR = 2, 1.0, 10.0
EVAL_N = 1 << 16


def make_target():
    return nf.Banana(DIM, BANANA_B, BANANA_VAR)


def evaluate(flow, target, seed=100):
    """ELBO (large-sample), SW₂ vs exact sampler (+floor), forward-KL
    estimate E_p[log p − log q], and per-dim std."""
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 5)
    elbo = float(nf.elbo_batch(k1, flow, target.log_prob, EVAL_N))
    fs = jax.jit(lambda k: flow.sample(k, (EVAL_N,)))(k2)
    ts = target.sample(k3, (EVAL_N,))
    ts2 = target.sample(k4, (EVAL_N,))
    sw2 = float(nf.sliced_wasserstein2(k5, fs, ts))
    sw2_floor = float(nf.sliced_wasserstein2(k5, ts2, ts))
    # forward KL on exact samples (mass-covering quality; needs log_prob
    # = numerical planar inverse, ops/solvers.py)
    lq = jax.jit(flow.log_prob)(ts)
    fkl = float(jnp.mean(target.log_prob(ts) - lq))
    std = jnp.std(fs, axis=0)
    return {
        "elbo": round(elbo, 3),
        "sw2": round(sw2, 3),
        "sw2_floor": round(sw2_floor, 3),
        "forward_kl": round(fkl, 3),
        "std_flow": [round(float(v), 2) for v in std],
        "std_target": [round(float(v), 2)
                       for v in jnp.std(ts, axis=0)],
    }


def run_reverse(nlayers, iters, seed, lr=1e-2, schedule="cosine"):
    """Reference demo objective (reverse-KL elbo_batch, 32 samples/iter,
    Adam — `example/demo_planar_flow.jl:16-48`), longer + scheduled."""
    target = make_target()
    flow = jax.jit(
        lambda k: nf.planarflow(k, DIM, nlayers)
    )(jax.random.key(seed))
    if schedule == "cosine":
        opt = optax.adam(optax.cosine_decay_schedule(lr, iters, 1e-3))
    else:
        opt = optax.adam(lr)
    t0 = time.perf_counter()
    res = nf.train_flow(jax.random.key(seed + 50), nf.elbo_batch, flow,
                        target.log_prob, 32, max_iters=iters, optimizer=opt,
                        check_every=max(iters // 10, 1))
    out = {
        "experiment": f"reverse_kl_L{nlayers}_seed{seed}",
        "nlayers": nlayers, "seed": seed, "iters": iters,
        **evaluate(res.flow, target),
        "iters_per_s": round(iters / (time.perf_counter() - t0), 1),
    }
    print(json.dumps(out), flush=True)
    return out


def run_mle(nlayers, iters, seed, n_data=1 << 16, batch=512, lr=1e-2):
    """Forward-KL MLE on exact target samples: the mass-covering capacity
    bound for the same architecture (uses the numerical planar inverse
    through `train_flow_mle`)."""
    target = make_target()
    data = target.sample(jax.random.key(seed + 10), (n_data,))
    flow = jax.jit(
        lambda k: nf.planarflow(k, DIM, nlayers)
    )(jax.random.key(seed))
    opt = optax.adam(optax.cosine_decay_schedule(lr, iters, 1e-3))
    loader = NumpyLoader(jnp.asarray(data), batch, seed=seed)
    t0 = time.perf_counter()
    res = nf.train_flow_mle(flow, loader, max_iters=iters, optimizer=opt,
                            check_every=max(iters // 10, 1))
    out = {
        "experiment": f"forward_mle_L{nlayers}_seed{seed}",
        "nlayers": nlayers, "seed": seed, "iters": iters,
        **evaluate(res.flow, target),
        "iters_per_s": round(iters / (time.perf_counter() - t0), 1),
    }
    print(json.dumps(out), flush=True)
    return out


def write_md(rows, iters):
    lines = [
        "# PLANAR_DIAGNOSE — what can N planar layers do on "
        "Banana(2, 1, 10)?",
        "",
        "Replaces PARITY.md's qualitative 'mode-seeking' note with "
        "measured bounds",
        "(VERDICT r3 item 5). Reverse-KL rows use the reference demo's own "
        "objective",
        "(`demo_planar_flow.jl:16-48`) with longer, cosine-scheduled "
        "training; the",
        "forward-KL MLE rows fit the same architecture to exact target "
        "samples —",
        "mass-covering by construction, so they bound capacity "
        "independently of",
        "reverse-KL mode-seeking. Eval: ELBO and forward-KL at "
        f"{EVAL_N} samples;",
        "SW₂ vs an exact sampler draw (floor = two independent exact "
        "draws).",
        "",
        "| experiment | L | ELBO | fwd-KL | SW₂ (floor) | std flow / "
        "target |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['experiment']} | {r['nlayers']} | {r['elbo']} | "
            f"{r['forward_kl']} | {r['sw2']} ({r['sw2_floor']}) | "
            f"{r['std_flow']} / {r['std_target']} |"
        )
    # conclusions computed from the data
    rev10 = [r for r in rows if r["experiment"].startswith("reverse_kl_L10")]
    mle10 = [r for r in rows if r["experiment"].startswith("forward_mle_L10")]
    deep = [r for r in rows if r["nlayers"] >= 32]
    lines += ["", "## Reading", ""]
    if rev10:
        best = max(rev10, key=lambda r: r["elbo"])
        lines.append(
            f"- Best reverse-KL ELBO with the demo's 10 layers: "
            f"**{best['elbo']}** at SW₂ {best['sw2']} "
            f"(floor {best['sw2_floor']}), over {len(rev10)} seeds × "
            f"{iters} iters.")
    if mle10:
        best = min(mle10, key=lambda r: r["forward_kl"])
        lines.append(
            f"- Mass-covering bound, same 10 layers (forward-KL MLE on "
            f"exact samples): forward-KL **{best['forward_kl']}** nats, "
            f"SW₂ **{best['sw2']}** — what the architecture CAN cover "
            f"when the objective does not mode-seek.")
    if deep:
        best = max(deep, key=lambda r: r["elbo"])
        lines.append(
            f"- Depth sweep: best deeper run (L={best['nlayers']}) reaches "
            f"ELBO {best['elbo']} / SW₂ {best['sw2']}.")
    lines += [
        "",
        "Interpretation: if the MLE rows reach near-floor SW₂, the "
        "PARITY.md planar",
        "gap is an objective/optimization property (reverse-KL "
        "mode-seeking), not an",
        "implementation defect; if even MLE plateaus far from the floor, "
        "the gap is",
        "architectural capacity. Either way the measured number replaces "
        "the guess.",
        "",
        f"Reference evidence: `/root/reference/docs/src/PlanarFlow.md:"
        f"102,125` (plots only, no numbers).",
    ]
    MD_PATH.write_text("\n".join(lines) + "\n")
    print(f"wrote {MD_PATH}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30_000)
    p.add_argument("--quick", action="store_true",
                   help="tiny smoke run (CI)")
    a = p.parse_args()
    iters = 200 if a.quick else a.iters
    mle_iters = 100 if a.quick else max(iters // 2, 1)
    rows = []
    seeds = [0] if a.quick else [0, 1, 2]
    depths = [10] if a.quick else [10, 32, 64]
    for L in depths:
        for s in seeds if L == 10 else seeds[:1]:
            rows.append(run_reverse(L, iters, s))
    for L in depths[:2]:
        rows.append(run_mle(L, mle_iters, 0))
    write_md(rows, iters)


if __name__ == "__main__":
    main()
