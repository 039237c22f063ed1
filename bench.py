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


def _device_backend_alive(timeout_s=240):
    """Probe the default jax backend in a SUBPROCESS with a timeout.

    The axon TPU tunnel, when down, HANGS `jax.devices()` indefinitely (a
    measured multi-hour outage in round 3) — probing in-process would hang
    the whole bench.  The child exits before this process initializes its
    own backend, so the tunnel's single-client constraint is respected."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


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
    # Real (valid) factor count — the ELL layout pads rows with inert
    # clones, and the serial baseline builds only the real factors.
    fb0 = graph.fblocks[0]
    m = fb0.count if fb0.n_valid is None else fb0.n_valid
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

    # Wall-clock-to-convergence (BASELINE.json names both metrics).
    # VERDICT r2 item 9: the target is tied to the MAP solution, not to the
    # run's own plateau — converged means ARE <= 1.05 x ARE(MAP), where the
    # MAP estimate comes from the distributed-Schur Gauss-Newton solver
    # (gbp_tpu/parallel/schur.py, implicit-S CG) on the SAME graph on chip;
    # resolution is 5-sweep chunks.
    from gbp_tpu.parallel import schur

    t0 = time.time()
    mu = means
    for _ in range(6):
        mu = schur.gauss_newton_step(graph, mu, cg_iters=60)
    are_map = float(ba.avg_reprojection_error(
        graph, ba.with_means(sweep_cm.to_gbp_state(cmg, state), mu),
        k=sim["k"]))
    log(f"[bench] MAP target via Schur-GN: ARE {are_map:.4f} px "
        f"({time.time()-t0:.1f}s, not counted)")
    target = 1.05 * are_map

    chunk = 5
    state = sweep_cm.init_state(cmg, means)
    runj(cmg, state, cfg, chunk).v[0].mean.block_until_ready()  # warm compile
    state = sweep_cm.init_state(cmg, means)
    ares, times = [], []
    t0 = time.time()
    t_conv = None
    for i in range(40):
        state = runj(cmg, state, cfg, chunk)
        state.v[0].mean.block_until_ready()
        times.append(time.time() - t0)
        ares.append(float(ba.avg_reprojection_error(
            graph, sweep_cm.to_gbp_state(cmg, state), k=sim["k"])))
        if t_conv is None and ares[-1] <= target:
            t_conv = times[-1]
            conv_i = i
    if t_conv is not None:
        log(f"[bench] convergence to <=1.05x MAP ARE at sweep "
            f"{(conv_i + 1) * chunk} ({t_conv:.3f}s wall); ARE/5-sweep "
            "chunk = " + " ".join(f"{a:.3f}" for a in ares[:conv_i + 3]))
    else:
        log(f"[bench] NOT converged to 1.05x MAP ARE ({target:.4f}) within "
            f"{chunk * 40} sweeps; trajectory "
            + " ".join(f"{a:.3f}" for a in ares))
    return sweeps_per_s, m, t_conv


def measure_numpy_baseline(m_total, sim):
    """Serial reference-style implementation at the FULL bench size.

    The measurement is cached in bench_baseline.json.  Round 1 measured
    per-factor cost on a 16-cam subsample and extrapolated linearly; round 2
    replaces that with one honest same-size measurement (1 sweep at 512k
    factors, ~1 minute) — the two agree to ~3%, but the full-size number is
    what vs_baseline now uses."""
    # Multi-slot cache keyed by factor count, so off-size runs (reduced
    # CPU fallback, BENCH_N_CAMS experiments) never clobber the headline
    # full-size measurement.  Migrates the legacy single-slot format.
    entries = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        entries = {int(k): v for k, v in cached.get("by_factors", {}).items()}
        if "full_size_factors" in cached:
            entries[int(cached["full_size_factors"])] = (
                cached["full_size_s_per_sweep"])
    if m_total in entries:
        log(f"[bench] cached FULL-SIZE numpy baseline: "
            f"{entries[m_total]:.1f} s/sweep at {m_total} factors")
        return 1.0 / entries[m_total]

    from gbp_tpu.bench.numpy_gbp import build_ba_numpy

    log(f"[bench] measuring serial numpy baseline at FULL size ({m_total} "
        "factors, 1 sweep)...")
    g = build_ba_numpy(sim)
    assert len(g.factors) == m_total, (len(g.factors), m_total)
    t0 = time.time()
    g.synchronous_iteration()
    s_per_sweep = time.time() - t0
    log(f"[bench] full-size numpy baseline: {s_per_sweep:.1f} s/sweep "
        f"({s_per_sweep/m_total*1e6:.1f} us/factor)")
    entries[m_total] = s_per_sweep
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"by_factors": {str(k): v for k, v in entries.items()}}, f)
    return 1.0 / s_per_sweep


def main():
    global N_CAMS, N_LMKS
    fallback = not _device_backend_alive()
    if fallback:
        # Device backend unreachable (tunnel outage): report an honest
        # CPU-fallback number on a reduced problem instead of hanging.
        log("[bench] WARNING: default jax backend unreachable (probe timed "
            "out) — falling back to CPU on a reduced problem; this number "
            "is NOT the TPU headline")
        import jax

        jax.config.update("jax_platforms", "cpu")
        if "BENCH_N_CAMS" not in os.environ:
            N_CAMS, N_LMKS = 16, 600

    from gbp_tpu.models import ba

    sim = ba.simulate(n_cams=N_CAMS, n_lmks=N_LMKS, pix_sigma=1.0, seed=0)
    sweeps_per_s, m, t_conv = measure_tpu(sim)
    baseline_sweeps_per_s = measure_numpy_baseline(m, sim)
    log(f"[bench] baseline (serial numpy reference impl): "
        f"{baseline_sweeps_per_s:.3f} sweeps/s on the same problem")
    result = {
        "metric": "ba_gbp_sweeps_per_s_per_chip",
        "value": round(sweeps_per_s, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_s / baseline_sweeps_per_s, 2),
        "wall_clock_to_convergence_s": None if t_conv is None else round(t_conv, 3),
        "n_factors": m,
    }
    if fallback:
        result["platform"] = "cpu_fallback_tpu_unreachable"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
