#!/usr/bin/env python
"""Static roofline / utilization model for the packed PDHG kernels.

Counts the vector-register operations (vreg-ops: one VPU instruction on
an (8, 128) f32 tile) issued per PDHG iteration per 128-lane problem
tile, per bench mode, by walking the same arithmetic the kernel bodies
in kmpc_tpu/ops/mpc_pallas.py emit. Combined with a measured solves/s
the script reports cycles/iteration and the implied sustained issue
rate in vreg-ops/cycle — the number that says whether a mode is bound
by VPU instruction issue, by the MXU, or by HBM (round-2 VERDICT
missing #2).

Cost model (per op on an [H, NP, TB=128] array; F = H * NP/8 vregs):
    elementwise (add/sub/mul/min/max/cmp/select/abs)  1 F
    sign                                              1.5 F (cmp+sel)
    divide / rsqrt                                    1 F issue (longer
                                                      latency, pipelined)
    concat-shift (apply_D/Dt row shift)               1 F (vreg copies)
    sublane reduction over NP rows                    (NP/8 - 1) adds
                                                      + 3 intra-vreg
                                                      shuffle-adds, per H
    [H, 1, TB] arithmetic                             H/8-ceil vregs
MXU reductions (_sum_assets at NP >= 64) replace the sublane chain with
an [8, NP] x [NP, TB] matmul: counted as MXU issues, not vreg-ops.

v5e parameters: 940 MHz TensorCore clock; the VPU has 4 independent
8x128 ALUs (theoretical 4 vreg-ops/cycle if every port issues every
cycle; dependence chains and special-function ops make ~2 a practical
ceiling); MXU 197 bf16 TFLOP/s; HBM ~819 GB/s.

Usage: python scripts/roofline.py --measured headline=183900 ...
(defaults carry the round-3 measured medians).
"""
from __future__ import annotations

import argparse
import json

CLOCK_HZ = 940e6
TB = 128


def ceil8(x):
    return -(-x // 8)


class Count:
    def __init__(self, H, NP, tb=128):
        self.H, self.NP = H, NP
        self.F = H * NP // 8 * (tb // 128)   # vregs per full-width op
        self.vreg = 0.0               # vreg-op issues
        self.mxu = 0                  # MXU matmul issues
        self.mxu_flops = 0.0

    def full(self, n=1.0):
        self.vreg += n * self.F

    def narrow(self, n=1.0):
        # [H, 1, TB] arithmetic: one vreg per horizon row.
        self.vreg += n * self.H

    def reduce(self, n=1.0):
        """Sublane reduction [H, NP, TB] -> [H, 1, TB] (VPU path) or an
        MXU ones-matmul (NP >= 64, the _sum_assets gate)."""
        if self.NP >= 64:
            self.mxu += int(n)
            self.mxu_flops += n * 2 * 8 * self.NP * TB
            self.vreg += n * self.H   # staging/copy per H slice
        else:
            per_h = (self.NP // 8 - 1) + 3
            self.vreg += n * per_h * self.H


def michelot_sweep(c: Count, sweeps=1.0):
    """One warm Michelot/Newton sweep: cmp + astype + select full-width,
    a stacked count/sum reduction pair, and narrow threshold arithmetic."""
    c.full(3 * sweeps)
    c.reduce(2 * sweeps)
    c.narrow(3 * sweeps)


def body_fixed(H, NP, S=None, use_ball=True, refresh=16, warm_iters=3):
    """make_body_cond (refresh > 1) / make_body: one PDHG iteration."""
    c = Count(H, NP)
    S_ = S or 1

    # primal_pre: w*r (S_ wide muls), port reduce per scenario,
    # narrow max+div, g = r * recip (S_ muls; + mean over S), Dt shift +
    # sub, tau_p mul, sub, add w.
    c.full(S_)                 # w * r   (broadcast over S)
    for _ in range(S_):
        c.reduce(1)
    c.narrow(2 * S_)           # max(port, eps), tau_p/port
    c.full(S_)                 # r * recip
    if S:
        c.full(S_ - 1)         # mean over scenarios: S-1 full-width adds
    c.full(2)                  # apply_Dt shift + sub
    c.full(2)                  # tau_p * Dtp ; g - (...)
    c.full(1)                  # + w  (ridge = 0 on the bench)
    c.full(1)                  # + nm (mask add)

    # primal threshold: 1 warm sweep per iteration + amortized refresh.
    extra = (warm_iters - 1) / max(refresh, 1) if refresh > 1 else 0
    michelot_sweep(c, 1 + extra)
    c.full(2)                  # w_new = max(vm - th, 0)
    c.full(2)                  # w_bar = 2*w_new - w
    c.full(2)                  # apply_D shift + sub
    c.full(2)                  # q = p + sigma * D
    # dual prox, clip form: aq (abs+sub+max), l1 reduce, threshold
    # sweep (+nm), narrow bound, clip (2 ops vs broadcast bound).
    c.full(3)                  # aq
    if use_ball:
        c.reduce(1)            # l1
        c.full(1)              # aq + nm
        michelot_sweep(c, 1 + extra)
        c.narrow(3)            # max(th,0), where, +c
        c.full(2)              # clip lo/hi
    else:
        c.full(2)
    return c


def body_adaptive(H, NP, use_ball=True, warm_iters=3):
    c = Count(H, NP)
    c.full(1); c.reduce(1); c.narrow(2); c.full(1)      # smooth grad
    c.full(2)                  # apply_Dt shift+sub
    c.full(2)                  # w - tau*(grad + Dtp)  (tau_c narrow mul)
    c.full(1)                  # + nm
    michelot_sweep(c, warm_iters)
    c.full(2)                  # w_new
    c.full(2)                  # w_bar
    c.full(2)                  # apply_D
    c.full(2)                  # q
    c.narrow(1)                # inv_s
    c.full(1)                  # v = q * inv_s
    c.full(3)                  # a
    if use_ball:
        c.reduce(1)
        c.full(1)
        michelot_sweep(c, warm_iters)
        c.narrow(3)
    c.full(3)                  # inner = v - clip(v)
    c.full(2)                  # p_new = q - sig*inner
    # residual reductions: dw, dp, two residual expressions + 2 norms
    c.full(2)                  # dw, dp
    c.full(4)                  # residual exprs (div/mul + Dt/D + sub) x2
    c.reduce(2)                # sum-of-squares reductions (as reduces)
    c.narrow(6)                # balance_steps narrow arithmetic
    return c


def body_mv(H, NP, shared_sigma=False, warm_iters=3, refresh=16, tb=128):
    c = Count(H, NP, tb)
    # grad: Sigma @ w per horizon step.
    if shared_sigma:
        c.mxu += H
        c.mxu_flops += H * 2 * NP * NP * TB
        c.vreg += H            # staging
    else:
        # sublane-broadcast multiply + n-axis reduction: NP/8 vreg muls
        # per output row block -> NP * F /8-ish; count NP/8 full ops.
        c.full(NP / 8)
        c.reduce(NP / 8)
    c.full(2)                  # 2*gamma*quad - mu
    c.full(2)                  # apply_Dt
    c.full(2)                  # w - tau*(...)
    c.full(1)                  # + nm
    extra = (warm_iters - 1) / max(refresh, 1) if refresh > 1 else 0
    michelot_sweep(c, 1 + extra)
    c.full(2)                  # w_new
    c.full(2)                  # w_bar
    c.full(2)                  # apply_D
    c.full(2)                  # q
    c.full(2)                  # clip
    return c


MODES = {
    # name: (H, N, batch, iters, body builder)
    "headline": dict(H=5, N=30, batch=8192, iters=1000,
                     body=lambda: body_fixed(5, 32)),
    "H20": dict(H=20, N=30, batch=4096, iters=1000,
                body=lambda: body_fixed(20, 32)),
    "N500": dict(H=5, N=500, batch=1024, iters=1000,
                 body=lambda: body_fixed(5, 504)),
    "scenario": dict(H=5, N=30, batch=4096, iters=1000,
                     body=lambda: body_fixed(5, 32, S=16)),
    "adaptive": dict(H=5, N=30, batch=8192, iters=1000,
                     body=lambda: body_adaptive(5, 32)),
    "markowitz_H1": dict(H=1, N=30, batch=4096, iters=1000, tb=256,
                         body=lambda: body_mv(1, 32, tb=256)),
    "mv_shared_N500_H1": dict(H=1, N=500, batch=1024, iters=1000,
                              body=lambda: body_mv(1, 504,
                                                   shared_sigma=True)),
}


def analyze(name, spec, solves_per_s):
    c = spec["body"]()
    tiles = -(-spec["batch"] // spec.get("tb", TB))
    it = spec["iters"]
    t_batch = spec["batch"] / solves_per_s
    cyc_iter_tile = t_batch * CLOCK_HZ / (it * tiles)
    issue = c.vreg / cyc_iter_tile
    mxu_util = (c.mxu_flops / cyc_iter_tile) / (197e12 / CLOCK_HZ)
    # HBM: inputs (r: B*H*N*4 for S=1) loaded once per solve.
    S = 16 if name == "scenario" else 1
    hbm_bytes = spec["batch"] * (S * spec["H"] * spec["N"] + spec["N"]) * 4 \
        + spec["batch"] * spec["H"] * spec["N"] * 4
    hbm_frac = (hbm_bytes / t_batch) / 819e9
    return {
        "mode": name,
        "vreg_ops_per_iter_tile": round(c.vreg, 1),
        "mxu_issues_per_iter_tile": c.mxu,
        "cycles_per_iter_tile": round(cyc_iter_tile, 1),
        "sustained_vreg_ops_per_cycle": round(issue, 2),
        "pct_of_2_per_cycle_ceiling": round(100 * issue / 2.0, 1),
        "mxu_pct_of_peak": round(100 * mxu_util, 2),
        "hbm_pct_of_peak": round(100 * hbm_frac, 2),
        "solves_per_s": solves_per_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", nargs="*", default=[],
                    help="mode=solves_per_s overrides")
    args = ap.parse_args()
    measured = {}
    for kv in args.measured:
        k, v = kv.split("=")
        measured[k] = float(v)
    rows = []
    for name, spec in MODES.items():
        if name in measured:
            rows.append(analyze(name, spec, measured[name]))
        else:
            c = spec["body"]()
            rows.append({
                "mode": name,
                "vreg_ops_per_iter_tile": round(c.vreg, 1),
                "mxu_issues_per_iter_tile": c.mxu,
                "note": "pass --measured %s=<solves/s> for utilization"
                        % name,
            })
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
