#!/usr/bin/env python
"""Fit ChipModel constants from per-segment profiles of REAL plans and
validate the model against the recorded knob sweeps.

The round-3 constants came from fused microbenchmarks (in-program
ceilings) and mispredicted the direction of all three recorded knob
sweeps (VERDICT r4 weak #6) — the reference's model exists to PICK LBC
parameters (performanceModel.h:26-151), so ranking power is the bar.
Here the observations are ``profile_segments`` wall times of every
segment of the benchmark plan (each segment is repeated in-program, so
host dispatch is amortized), the features are the structural quantities
of ``perfmodel.segment_features``, and the fit is non-negative least
squares.  Validation: the fitted model must rank the default config
above each recorded sweep variant (measured on-chip, RESULTS_r04:
default 134.0-134.3 GFLOP/s vs alpha=1.1 130.1, q=(48,136) 129.2,
slack=on 118.9).

    python scripts/calibrate_model.py [grid] [out.json]
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

FEATS = [  # feature -> ChipModel field (cost = feature * coef)
    ("steps", "step_s"),
    ("wbytes", "stream_bytes"),        # inverse rate
    ("upd_buckets", "upd_bucket_s"),
    ("upd_lanes", "lane_s"),
    ("upd_flops", "mxu_flops"),        # inverse rate
    ("grows", "gather_rows"),          # inverse rate
    ("srows", "scatter_rows"),         # inverse rate
    ("fin_buckets", "fin_bucket_s"),
    ("fin_flops", None),               # shares mxu_flops
    ("fin_bytes", None),               # shares stream_bytes
    ("fin_lanes", None),               # shares lane_s
    ("chain_cols", "chain_op_s"),
]
INVERSE = {"stream_bytes", "mxu_flops", "gather_rows", "scatter_rows"}


def collect(grid: int):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    from parsy_bench_tpu.utils.perfmodel import segment_features

    a = generate.laplace_3d(grid)
    s = CholeskySolver(a, SolverConfig(ordering="nd", dtype="float32",
                                       tier="supernodal"))
    prof = s.executor.profile_segments(np.asarray(s.ap.data, np.float32))
    rows = []
    for seg, p in zip(s.plan.segments, prof):
        f = segment_features(seg, s.plan.classes)
        f["median_s"] = p["median_s"]
        rows.append(f)
    return rows, s


def fit(rows):
    from scipy.optimize import nnls
    # columns: step_s, 1/stream, upd_bucket_s, lane_s, 1/mxu, 1/gather,
    # 1/scatter, fin_bucket_s, chain_op_s  (shared columns folded)
    cols = ["step_s", "stream_bytes", "upd_bucket_s", "lane_s",
            "mxu_flops", "gather_rows", "scatter_rows", "fin_bucket_s",
            "chain_op_s"]
    A = np.zeros((len(rows), len(cols)))
    y = np.array([r["median_s"] for r in rows])
    for i, r in enumerate(rows):
        A[i, 0] = r["steps"]
        A[i, 1] = r["wbytes"] + r["fin_bytes"]
        A[i, 2] = r["upd_buckets"]
        A[i, 3] = r["upd_lanes"] + r["fin_lanes"]
        A[i, 4] = r["upd_flops"] + r["fin_flops"]
        A[i, 5] = r["grows"]
        A[i, 6] = r["srows"]
        A[i, 7] = r["fin_buckets"]
        A[i, 8] = r["chain_cols"]
    # scale columns for conditioning
    scale = np.maximum(A.max(axis=0), 1e-30)
    x, res = nnls(A / scale, y)
    coef = x / scale
    fitted = {}
    for c, v in zip(cols, coef):
        fitted[c] = (1.0 / v if c in INVERSE and v > 0
                     else (np.inf if c in INVERSE else v))
    pred = A @ coef
    fitted["_fit_r2"] = float(1 - np.sum((pred - y) ** 2)
                              / max(np.sum((y - y.mean()) ** 2), 1e-30))
    fitted["_residual_s"] = float(np.sqrt(np.mean((pred - y) ** 2)))
    return fitted


def validate(s, chip):
    """Model-vs-measured sign check on the three recorded sweeps."""
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    from parsy_bench_tpu.utils.perfmodel import factorize_cost
    base_cfg = SolverConfig(ordering="nd", dtype="float32",
                            tier="supernodal")
    variants = {
        "segment_alpha=1.1": base_cfg.replace(segment_alpha=1.1),
        "q_classes=(48,136)": base_cfg.replace(q_classes=(48, 136)),
        "slack_placement=on": base_cfg.replace(slack_placement=True),
    }
    measured_slower = {  # GFLOP/s measured on-chip, RESULTS_r04
        "segment_alpha=1.1": 130.1,
        "q_classes=(48,136)": 129.2,
        "slack_placement=on": 118.9,
    }
    t_base = factorize_cost(s.plan, chip).model_s
    out = {"base_model_s": round(t_base, 4), "signs": {}}
    a = s.a
    for name, cfg in variants.items():
        sv = CholeskySolver(a, cfg)
        tv = factorize_cost(sv.plan, chip).model_s
        # measured: default (134.0+) beats every variant -> model must
        # assign the variant MORE time
        ok = tv > t_base
        out["signs"][name] = {
            "model_s": round(tv, 4),
            "measured_gflops": measured_slower[name],
            "model_ranks_default_faster": bool(ok),
        }
    out["all_signs_correct"] = all(
        v["model_ranks_default_faster"] for v in out["signs"].values())
    return out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CALIBRATION_r05.json"
    from parsy_bench_tpu.utils.perfmodel import ChipModel
    t0 = time.time()
    rows, s = collect(grid)
    fitted = fit(rows)
    chip = ChipModel(
        name="tpu-v5e-xla-r5-fit",
        mxu_flops=fitted["mxu_flops"],
        gather_rows=fitted["gather_rows"],
        scatter_rows=fitted["scatter_rows"],
        stream_bytes=fitted["stream_bytes"],
        lane_s=fitted["lane_s"],
        chain_op_s=fitted["chain_op_s"],
        step_s=fitted["step_s"],
        upd_bucket_s=fitted["upd_bucket_s"],
        fin_bucket_s=fitted["fin_bucket_s"])
    val = validate(s, chip)
    art = {"grid": grid, "n": int(s.a.n), "segments": len(rows),
           "fitted": {k: (None if np.isinf(v) else float(v))
                      for k, v in fitted.items()},
           "validation": val,
           "wall_s": round(time.time() - t0, 1)}
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1))


if __name__ == "__main__":
    main()
