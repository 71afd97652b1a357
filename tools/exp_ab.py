"""Multi-seed x multi-budget native-training quality A/B (VERDICT r4 item 3).

Round 4's single-seed A/B measured our trainer 0.34 dB behind the reference
(17.21 vs 17.55 dB, 400 iters, one seed) inside a 0.75 dB test tolerance —
"not noise until a multi-seed run says it is". This sweep runs the SAME
matched-stream A/B (tests/test_checkpoint_parity.run_training_ab) at
several init seeds and two budgets and reports per-cell results + the
cross-seed spread, so the gap can be attributed to seed variance or pinned
as systematic.

CPU-only (both stacks), safe to run alongside chip work:
    JAX_PLATFORMS=cpu python -u tools/exp_ab.py --seeds 3 --out logs/ab
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> None:
    p = argparse.ArgumentParser("exp_ab")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--budgets", type=int, nargs="+", default=[400, 2000])
    p.add_argument("--style", choices=["surreal", "h36m"], default="surreal",
                   help="surreal = MSE/no-bg/no-popt; h36m = L1 + background "
                        "+ framecodes + pose-opt (run_training_ab_h36m)")
    p.add_argument("--out", type=str, default="logs/ab")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from test_checkpoint_parity import run_training_ab, run_training_ab_h36m

    if args.style == "h36m":
        run_training_ab = run_training_ab_h36m  # noqa: F811

    os.makedirs(args.out, exist_ok=True)
    name = "summary.json" if args.style == "surreal" else f"summary_{args.style}.json"
    path = os.path.join(args.out, name)
    results = {"cells": []}
    if os.path.exists(path):  # resume a partial sweep
        results = json.load(open(path))
    done = {(c["budget"], c["seed"]) for c in results["cells"]}

    for budget in args.budgets:
        for s in range(args.seeds):
            if (budget, s) in done:
                continue
            t0 = time.time()
            with tempfile.TemporaryDirectory() as td:
                r = run_training_ab(
                    td, n_iters=budget,
                    ref_seed=3 + s, our_seed=21 + s,
                    stream_seed=11 + s, torch_seed=s, step_key_seed=s,
                )
            cell = {
                "budget": budget, "seed": s,
                "psnr_ref": round(r["psnr_ref"], 3),
                "psnr_ours": round(r["psnr_ours"], 3),
                "gap": round(r["psnr_ours"] - r["psnr_ref"], 3),
                "wall_s": round(time.time() - t0, 1),
            }
            results["cells"].append(cell)
            print(f"[exp_ab] {cell}", flush=True)
            with open(path, "w") as f:
                json.dump(results, f, indent=1)

    import numpy as np

    for budget in args.budgets:
        gaps = [c["gap"] for c in results["cells"] if c["budget"] == budget]
        refs = [c["psnr_ref"] for c in results["cells"] if c["budget"] == budget]
        ours = [c["psnr_ours"] for c in results["cells"] if c["budget"] == budget]
        if gaps:
            print(
                f"[exp_ab] budget {budget}: ref {np.mean(refs):.2f}±{np.std(refs):.2f} "
                f"ours {np.mean(ours):.2f}±{np.std(ours):.2f} "
                f"gap {np.mean(gaps):+.2f}±{np.std(gaps):.2f} dB "
                f"(per-seed: {[f'{g:+.2f}' for g in gaps]})",
                flush=True,
            )
    results["summary"] = {
        str(b): {
            "gap_mean": float(np.mean([c["gap"] for c in results["cells"] if c["budget"] == b])),
            "gap_std": float(np.std([c["gap"] for c in results["cells"] if c["budget"] == b])),
        }
        for b in args.budgets
        if any(c["budget"] == b for c in results["cells"])
    }
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
