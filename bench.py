#!/usr/bin/env python
"""Headline benchmark: GBP sweeps/s/chip on a large single-chip BA problem.

Driver metric (BASELINE.json): GBP sweeps/s/chip.  The reference publishes no
numbers (BASELINE.md), so the baseline is our faithful serial-NumPy
re-implementation of the reference algorithm (gbp_tpu/bench/numpy_gbp.py),
measured per-factor on a subsample and scaled to this problem size (the
serial loop is linear in factor count).  The baseline measurement is cached
in bench_baseline.json so vs_baseline is stable across rounds.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "sweeps/s", "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np

# Problem size: config[3]-scale single-host BA (~470k observations).
N_CAMS = int(os.environ.get("BENCH_N_CAMS", 64))
N_LMKS = int(os.environ.get("BENCH_N_LMKS", 8000))
SWEEPS = 200
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_tpu(sim):
    import jax

    from gbp_tpu.core import sweep_cm
    from gbp_tpu.core.sweep import GBPConfig
    from gbp_tpu.models import ba

    graph, means = ba.build(sim)  # f32, normalized coords
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    # Persistent component-major sweep: the single-chip speed path (state
    # stays in kernel layout across sweeps — core/sweep_cm.py).
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None, "bench graph must be CM-eligible"
    state = sweep_cm.init_state(cmg, means)
    m = graph.fblocks[0].count
    log(f"[bench] graph: {N_CAMS} cams, {sim['lmk_init'].shape[0]} lmks, {m} factors "
        f"on {jax.devices()[0]}")

    # Warm up with the SAME static n_iters as the timed call: n_iters is a
    # static argument, so a different value would recompile inside the timed
    # region and pollute the measurement with ~10s of XLA compile time.
    runj = jax.jit(sweep_cm.run, static_argnums=3)
    t0 = time.time()
    state = runj(cmg, state, cfg, SWEEPS)
    state.v[0].mean.block_until_ready()
    log(f"[bench] warmup/compile+{SWEEPS} sweeps: {time.time()-t0:.1f}s")

    t0 = time.time()
    state = runj(cmg, state, cfg, SWEEPS)
    state.v[0].mean.block_until_ready()
    dt = time.time() - t0
    sweeps_per_s = SWEEPS / dt
    are = float(ba.avg_reprojection_error(
        graph, sweep_cm.to_gbp_state(cmg, state), k=sim["k"]))
    log(f"[bench] {SWEEPS} sweeps in {dt:.3f}s -> {sweeps_per_s:.1f} sweeps/s; "
        f"ARE {are:.3f}px (sanity: finite and decreasing)")
    if not np.isfinite(are):
        raise RuntimeError("benchmark produced non-finite ARE")
    return sweeps_per_s, m


def measure_numpy_baseline(m_total):
    """Serial reference-style implementation, per-factor cost x m_total."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        log(f"[bench] using cached numpy baseline: {cached['per_factor_us']:.1f} us/factor")
        per_factor = cached["per_factor_us"] * 1e-6
        return 1.0 / (per_factor * m_total)

    from gbp_tpu.bench.numpy_gbp import build_ba_numpy
    from gbp_tpu.models import ba as ba_model

    sub = ba_model.simulate(n_cams=16, n_lmks=400, seed=7)
    g = build_ba_numpy(sub)
    n_sweeps = 3
    t0 = time.time()
    for _ in range(n_sweeps):
        g.synchronous_iteration()
    per_factor = (time.time() - t0) / n_sweeps / len(g.factors)
    log(f"[bench] numpy baseline: {per_factor*1e6:.1f} us/factor "
        f"({len(g.factors)} factors, {n_sweeps} sweeps)")
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"per_factor_us": per_factor * 1e6}, f)
    return 1.0 / (per_factor * m_total)


def main():
    from gbp_tpu.models import ba

    sim = ba.simulate(n_cams=N_CAMS, n_lmks=N_LMKS, pix_sigma=1.0, seed=0)
    sweeps_per_s, m = measure_tpu(sim)
    baseline_sweeps_per_s = measure_numpy_baseline(m)
    log(f"[bench] baseline (serial numpy reference impl): "
        f"{baseline_sweeps_per_s:.3f} sweeps/s on the same problem")
    print(json.dumps({
        "metric": "ba_gbp_sweeps_per_s_per_chip",
        "value": round(sweeps_per_s, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_s / baseline_sweeps_per_s, 2),
    }))


if __name__ == "__main__":
    main()
