"""Throughput A/B of the perf flags at the flagship shape (VERDICT r2
task 5): f32 default vs bfloat16 compute vs the round-2 Pallas LSTM
backward (in-kernel gate recompute), all in ONE process/TPU client so
each variant pays its own compile but shares the tunnel session.

    python scripts/bench_variants.py --out results/bench_variants_r3.jsonl

Each row: {"variant": ..., "env_steps_per_s": N, "compile_s": N}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

VARIANTS = {
    "f32": {},
    "bf16": {"compute_dtype": "bfloat16"},
    "f32_pallas": {"use_pallas": True},
    "bf16_pallas": {"compute_dtype": "bfloat16", "use_pallas": True},
    # 100-agent scaling shapes (10x10 grid, B=128 to hold global batch):
    # dense [N,N] comm blocks vs K-packed sparse_comm at the N where the
    # N^2 cost should finally dominate
    "n100_bf16": {"compute_dtype": "bfloat16", "grid_size": 10,
                  "num_envs": 128},
    "n100_bf16_sparse": {"compute_dtype": "bfloat16", "grid_size": 10,
                         "num_envs": 128, "sparse_comm": True},
    # round-4 roofline chase (VERDICT r3 task 5): the B knee and the
    # scan-unroll factor were both fixed from f32-era measurements —
    # re-measure them at bf16, where the per-iteration overhead and HBM
    # residual mix is different
    "bf16_b256": {"compute_dtype": "bfloat16", "num_envs": 256},
    "bf16_b768": {"compute_dtype": "bfloat16", "num_envs": 768},
    "bf16_b1024": {"compute_dtype": "bfloat16", "num_envs": 1024},
    "bf16_b2048": {"compute_dtype": "bfloat16", "num_envs": 2048},
    "bf16_unroll2": {"compute_dtype": "bfloat16", "scan_unroll": 2},
    "bf16_unroll4": {"compute_dtype": "bfloat16", "scan_unroll": 4},
    "bf16_b1024_unroll2": {"compute_dtype": "bfloat16", "num_envs": 1024,
                           "scan_unroll": 2},
    # HBM-traffic levers at the flagship shape: sparse_comm shrinks
    # w_msg 5x (less per-iteration weight re-read traffic, measured
    # neutral at f32); remat trades the ~9 GB/update BPTT residual
    # traffic for ~1.3x recompute FLOPs — a win iff the update is
    # HBM-bound (docs/ROOFLINE.md bytes ledger)
    "bf16_sparse": {"compute_dtype": "bfloat16", "sparse_comm": True},
    "bf16_remat": {"compute_dtype": "bfloat16", "remat": True},
    # combos: remat (+6%), sparse (+4%) and B=768 (+5%) each won alone
    # at bf16 — do the gains stack?
    "bf16_b768_remat": {"compute_dtype": "bfloat16", "num_envs": 768,
                        "remat": True},
    "bf16_b768_sparse_remat": {"compute_dtype": "bfloat16",
                               "num_envs": 768, "sparse_comm": True,
                               "remat": True},
    "bf16_sparse_remat": {"compute_dtype": "bfloat16",
                          "sparse_comm": True, "remat": True},
    "bf16_b2048_remat": {"compute_dtype": "bfloat16", "num_envs": 2048,
                         "remat": True},
    "bf16_b1024_sparse_remat": {"compute_dtype": "bfloat16",
                                "num_envs": 1024, "sparse_comm": True,
                                "remat": True},
    # round-5 N-scaling at the FLAGSHIP lever set (VERDICT r4 Weak #6:
    # the 4.5x sparse_comm claim predated bf16-era remat/B levers).
    # B chosen to hold global agent-steps per update ~constant
    # (N*B ~ 19.2k): 25*768 = 49*384 = 100*192.
    "n25_flag_dense": {"compute_dtype": "bfloat16", "num_envs": 768,
                       "remat": True},
    "n25_flag_sparse": {"compute_dtype": "bfloat16", "num_envs": 768,
                        "sparse_comm": True, "remat": True},
    "n49_flag_dense": {"compute_dtype": "bfloat16", "grid_size": 7,
                       "num_envs": 384, "remat": True},
    "n49_flag_sparse": {"compute_dtype": "bfloat16", "grid_size": 7,
                        "num_envs": 384, "sparse_comm": True,
                        "remat": True},
    "n100_flag_dense": {"compute_dtype": "bfloat16", "grid_size": 10,
                        "num_envs": 192, "remat": True},
    "n100_flag_sparse": {"compute_dtype": "bfloat16", "grid_size": 10,
                         "num_envs": 192, "sparse_comm": True,
                         "remat": True},
    # larger-B sparse rows: at N=100 the per-agent state is small enough
    # that the knee may sit higher once sparse packing removes the N^2
    # blocks
    "n100_flag_sparse_b384": {"compute_dtype": "bfloat16",
                              "grid_size": 10, "num_envs": 384,
                              "sparse_comm": True, "remat": True},
    "n100_flag_sparse_b768": {"compute_dtype": "bfloat16",
                              "grid_size": 10, "num_envs": 768,
                              "sparse_comm": True, "remat": True},
    # round-5: CACC throughput of record (VERDICT r4 Missing #4 — the
    # BASELINE.json north-star names CACC env-steps/s/chip but the only
    # number was an r3 B=64 side measurement with none of the r4
    # levers). The env is 8 agents / 4 obs dims, so the chip is
    # dispatch/underfill-bound until B is large: sweep the knee.
    "cacc_f32_b64": {"scenario": "cacc_catchup", "num_envs": 64},
    "cacc_bf16_b256": {"scenario": "cacc_catchup", "num_envs": 256,
                       "compute_dtype": "bfloat16"},
    "cacc_bf16_b1024": {"scenario": "cacc_catchup", "num_envs": 1024,
                        "compute_dtype": "bfloat16"},
    "cacc_bf16_b4096": {"scenario": "cacc_catchup", "num_envs": 4096,
                        "compute_dtype": "bfloat16"},
    "cacc_bf16_b8192": {"scenario": "cacc_catchup", "num_envs": 8192,
                        "compute_dtype": "bfloat16"},
    "cacc_bf16_b4096_remat": {"scenario": "cacc_catchup",
                              "num_envs": 4096,
                              "compute_dtype": "bfloat16", "remat": True},
    "cacc_bf16_b8192_remat": {"scenario": "cacc_catchup",
                              "num_envs": 8192,
                              "compute_dtype": "bfloat16", "remat": True},
    "cacc_bf16_b16384": {"scenario": "cacc_catchup", "num_envs": 16384,
                         "compute_dtype": "bfloat16"},
    "cacc_f32_b4096": {"scenario": "cacc_catchup", "num_envs": 4096},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=45.0,
                   help="measure window per variant; 45 s matches "
                        "bench.py — 20 s windows carry the +-5% "
                        "session lottery (CLAUDE.md r5 bench "
                        "discipline)")
    p.add_argument("--num-envs", type=int, default=512)
    p.add_argument("--variants",
                   default="f32,bf16,f32_pallas,bf16_pallas,"
                           "n100_bf16,n100_bf16_sparse")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    sink = open(args.out, "a") if args.out else sys.stdout

    def emit(row):
        print(json.dumps(row), file=sink, flush=True)
        if sink is not sys.stdout:
            print(json.dumps(row), file=sys.stderr, flush=True)

    import jax  # for the runtime-error classes in the except below

    from bench import measure_tpu

    emit({"run": vars(args)})
    for name in args.variants.split(","):
        over = dict(VARIANTS[name.strip()])
        kw = dict(seconds_budget=args.seconds,
                  num_envs=over.pop("num_envs", args.num_envs),
                  grid_size=over.pop("grid_size", 5),
                  scenario=over.pop("scenario", "grid"))
        t0 = time.time()
        try:
            sps, loss = measure_tpu(**kw, **over)
        except ValueError as e:
            # the only remaining unsupported combo is bf16 with
            # fused_grad=False (bf16+pallas is supported since r3); any
            # other ValueError is a genuine config error — re-raise it
            if "fused-gradient path only" not in str(e):
                raise
            emit({"variant": name, "unsupported": str(e)})
            continue
        except (RuntimeError, MemoryError, jax.errors.JaxRuntimeError) as e:
            # device/runtime failures (e.g. OOM at the largest B): record
            # and keep the rest of the sweep alive. Programming errors
            # (TypeError/AttributeError from a typo'd kwarg) propagate —
            # a broad catch silently dropped broken variants (ADVICE r4)
            emit({"variant": name, "error": f"{type(e).__name__}: {e}"[:400]})
            continue
        emit({"variant": name, "env_steps_per_s": round(sps, 1),
              "loss": round(loss, 3),
              "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
