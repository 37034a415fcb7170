"""Pod-parallel certified robustness sweep.

Real equivalent of the reference's gitignored
``parallel_certified_robustness_eval.py`` + ``scripts/parallel_certified_
robust_eval.sh`` (one host process per (GPU, input-id, σ)): here the
noise-draw axis of each utterance is already sharded over every chip by the
``certify/`` kernel, so "parallel" reduces to sweeping σ values in one
process — each (utterance, σ) saturates the whole mesh.
"""

from __future__ import annotations

import argparse

from .certified_robustness_eval import main as _certify_main


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__, add_help=False)
    p.add_argument("--sigmas", type=str, default="0.25,0.5,1.0")
    ns, rest = p.parse_known_args(argv)
    results = {}
    for sigma in [float(s) for s in ns.sigmas.split(",")]:
        print(f"\n===== certifying at sigma={sigma} =====")
        results[sigma] = _certify_main(rest + ["--sigma", str(sigma)])
    return results


if __name__ == "__main__":
    main()
