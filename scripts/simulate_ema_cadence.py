"""Long-horizon gap-aware disc-LR dynamics: all-3 vs sampled-only EMA cadence.

Round-3 verdict item 8. The reference computes ALL THREE MRD disc losses
every step, so each helper's last_loss EMA (losses.py:287,
`last*0.95 + loss*0.05`) advances every step; this repo's default
sampled-MRD fast path (config training.sampled_mrd_only) advances each
MRD's EMA only on the ~1/3 of steps its MRD is sampled. This script
simulates 50k steps of the gap-aware LR control loop
(reference losses.py:238-249) under both cadences and reports whether
the disc LR multiplier stays in the same envelope.

Two regimes:
  * open-loop: both cadences driven by the SAME raw-loss trajectory
    (mean-reverting around the ideal 0.5/sub-loss with GAN-scale noise
    and slow regime drift). Isolates pure EMA-lag effects.
  * closed-loop: the raw loss responds to the multiplier (higher disc LR
    pulls the disc loss down toward winning; generator pressure pushes
    it back up). Tests whether the 1/3-cadence EMA destabilizes the
    controller.

Run: python scripts/simulate_ema_cadence.py  (numpy only, a few seconds)
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import numpy as np

F_MAX, H_MIN = 4.0, 0.01
SUB_COUNT = 3.0  # an MRD has 3 score heads (DISC_SUB_COUNT["mrd*"])
IDEAL = 0.5 * SUB_COUNT
X_BAND = 0.05 * SUB_COUNT
STEPS = 50_000
EMA_A = 0.95


def lr_multiplier(last_loss: float) -> float:
    x = abs(last_loss - IDEAL)
    if last_loss > IDEAL + X_BAND:
        return F_MAX
    if last_loss < IDEAL - X_BAND:
        return H_MIN
    if last_loss > IDEAL:
        return min(F_MAX ** (x / X_BAND), F_MAX)
    return max(H_MIN ** (x / X_BAND), H_MIN)


def simulate_open_loop(rng: np.random.Generator):
    """Same raw-loss process feeds both cadences; sampled updates 1/3."""
    # mean-reverting raw loss with slow drift: theta pulls to a slowly
    # wandering target; sigma is per-step GAN noise (raw disc losses in
    # the r2/r3 runs fluctuate with std ~0.3 around their mean)
    target = IDEAL
    loss = IDEAL
    ema_all = ema_smp = IDEAL
    mults_all, mults_smp = [], []
    for t in range(STEPS):
        target += rng.normal(0.0, 0.002)  # slow regime drift
        target = float(np.clip(target, IDEAL - 0.6, IDEAL + 0.6))
        loss += 0.05 * (target - loss) + rng.normal(0.0, 0.3)
        ema_all = EMA_A * ema_all + (1 - EMA_A) * loss
        if rng.integers(0, 3) == 0:  # this MRD sampled
            ema_smp = EMA_A * ema_smp + (1 - EMA_A) * loss
        mults_all.append(lr_multiplier(ema_all))
        mults_smp.append(lr_multiplier(ema_smp))
    return np.asarray(mults_all), np.asarray(mults_smp)


def simulate_closed_loop(rng: np.random.Generator, cadence: str):
    """Raw loss responds to the multiplier: mult>1 trains the disc harder
    (loss decreases toward winning), generator pressure pushes it up."""
    loss = IDEAL + 0.3  # disc starts losing (fresh training)
    ema = loss
    mults, losses = [], []
    mult = 1.0
    for t in range(STEPS):
        # multiplier recomputed every step from the (stale or fresh) EMA
        mult = lr_multiplier(ema)
        # disc improves proportionally to its LR; generator pressure is a
        # constant adversarial push upward; noise is GAN-scale
        loss += -0.004 * mult * (loss - (IDEAL - 0.5)) + 0.006 * (
            IDEAL + 0.5 - loss
        ) + rng.normal(0.0, 0.3)
        update = cadence == "all" or rng.integers(0, 3) == 0
        if update:
            ema = EMA_A * ema + (1 - EMA_A) * loss
        mults.append(mult)
        losses.append(loss)
    return np.asarray(mults), np.asarray(losses)


def stats(m: np.ndarray) -> dict:
    logm = np.log(m)
    return {
        "geomean": float(np.exp(logm.mean())),
        "p5": float(np.percentile(m, 5)),
        "p50": float(np.percentile(m, 50)),
        "p95": float(np.percentile(m, 95)),
        "frac_at_fmax": float((m >= F_MAX - 1e-9).mean()),
        "frac_at_hmin": float((m <= H_MIN + 1e-9).mean()),
    }


def main():
    rng = np.random.default_rng(0)
    a, s = simulate_open_loop(rng)
    sa, ss = stats(a), stats(s)
    # per-step multiplier ratio between cadences on the shared trajectory
    ratio = np.exp(np.abs(np.log(a) - np.log(s)))

    rng2 = np.random.default_rng(1)
    cm_all, cl_all = simulate_closed_loop(rng2, "all")
    rng2 = np.random.default_rng(1)
    cm_smp, cl_smp = simulate_closed_loop(rng2, "sampled")

    print(f"open-loop (shared raw-loss trajectory, {STEPS} steps):")
    print("| cadence | geomean mult | p5 | p50 | p95 | %@f_max | %@h_min |")
    print("|---|---|---|---|---|---|---|")
    for name, st in (("all-3 (reference)", sa), ("sampled-only", ss)):
        print(
            f"| {name} | {st['geomean']:.3f} | {st['p5']:.3f} | "
            f"{st['p50']:.3f} | {st['p95']:.3f} | "
            f"{100*st['frac_at_fmax']:.1f}% | {100*st['frac_at_hmin']:.1f}% |"
        )
    print(
        f"per-step |log-ratio| between cadences: median "
        f"{np.percentile(ratio,50):.3f}x, p95 {np.percentile(ratio,95):.3f}x, "
        f"max {ratio.max():.3f}x"
    )
    print()
    print(f"closed-loop (multiplier feeds back into the loss, {STEPS} steps):")
    print("| cadence | geomean mult | p95 mult | loss mean | loss std |")
    print("|---|---|---|---|---|")
    for name, m, l in (
        ("all-3 (reference)", cm_all, cl_all),
        ("sampled-only", cm_smp, cl_smp),
    ):
        st = stats(m)
        print(
            f"| {name} | {st['geomean']:.3f} | {st['p95']:.3f} | "
            f"{l.mean():.3f} | {l.std():.3f} |"
        )


if __name__ == "__main__":
    main()
