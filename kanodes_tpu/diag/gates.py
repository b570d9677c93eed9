"""Pass/fail acceptance gates for the strain-limiting KAN-PINN.

Rebuild of `PDE examples/eval_pass_fail.py`: five thresholds asserted on
a trained model's cross-verification diagnostics (:33-38, :82-90);
`evaluate` returns a structured report and an exit-code-style bool.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class GateThresholds:
    """eval_pass_fail.py:33-38."""
    min_tip_ratio: float = 1.10
    max_best_val: float = 32.0
    max_sym_mean: float = 0.15
    max_pde_mean_abs: float = 4.0e2
    max_nonfinite: int = 0


def evaluate(diag: dict, thresholds: GateThresholds | None = None) -> dict:
    """diag: output of `pinn.train.cross_verification`."""
    t = thresholds or GateThresholds()
    checks = {
        "tip_ratio": (diag["tip_near_far_ratio"] >= t.min_tip_ratio,
                      diag["tip_near_far_ratio"], f">= {t.min_tip_ratio}"),
        "best_val": (diag["best_val"] <= t.max_best_val,
                     diag["best_val"], f"<= {t.max_best_val}"),
        "symmetry": (diag["symmetry_mean_abs"] <= t.max_sym_mean,
                     diag["symmetry_mean_abs"], f"<= {t.max_sym_mean}"),
        "pde_residual": (diag["pde_residual_mean_abs"] <= t.max_pde_mean_abs,
                         diag["pde_residual_mean_abs"],
                         f"<= {t.max_pde_mean_abs}"),
        "finite_grid": (diag["nonfinite_grid_points"] <= t.max_nonfinite,
                        diag["nonfinite_grid_points"],
                        f"<= {t.max_nonfinite}"),
    }
    passed = all(ok for ok, _, _ in checks.values())
    return {"passed": passed,
            "checks": {k: {"ok": ok, "value": v, "threshold": thr}
                       for k, (ok, v, thr) in checks.items()}}


def report(result: dict) -> str:
    lines = ["PASS" if result["passed"] else "FAIL"]
    for name, c in result["checks"].items():
        mark = "ok " if c["ok"] else "BAD"
        lines.append(f"  [{mark}] {name}: {c['value']:.6g} "
                     f"(need {c['threshold']})")
    return "\n".join(lines)


def main(argv=None) -> int:
    """CLI parity with `eval_pass_fail.py:113-115`: read a diagnostics
    JSON (as written by pinn.train.cross_verification via json.dump),
    print the report, exit 0 on PASS / 1 on FAIL."""
    import json
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: python -m kanodes_tpu.diag.gates <diagnostics.json>")
        return 2
    with open(argv[0]) as f:
        diag = json.load(f)
    res = evaluate(diag)
    print(report(res))
    return 0 if res["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
