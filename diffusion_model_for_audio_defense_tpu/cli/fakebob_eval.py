"""FAKEBOB black-box evaluation.

Real equivalent of the reference's gitignored ``fakebob_eval.py`` (invoked
by ``scripts/fakebob_eval.sh``): the adaptive harness pinned to the FAKEBOB
attack with its reference hyperparameters (ε=0.002, conf 0.5, 200 iters,
200 samples/draw — ``adaptive_attack_eval.py:209-218``).
"""

from __future__ import annotations

import sys

from .adaptive_attack_eval import build_parser, main as _main  # noqa: F401 (build_parser re-exported)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--attack" not in " ".join(argv):
        argv = ["--attack", "FAKEBOB"] + argv
    return _main(argv)


if __name__ == "__main__":
    main()
