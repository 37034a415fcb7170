"""Rebuild artifacts/certify_protocol/summary.json from the on-disk JSONLs.

The protocol runner (scripts/certify_protocol.py) flushes per-utterance
records as it goes but writes the per-sigma summary only when a sigma
completes — a queue timeout mid-sigma leaves valid JSONLs with no table.
This post-processor regenerates the table from whatever records exist.

Usage: python scripts/summarize_certify.py [dir]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out = argv[0] if argv else os.path.join(REPO, "artifacts", "certify_protocol")
    spath = os.path.join(out, "summary.json")
    summary = {}
    if os.path.isfile(spath):
        with open(spath) as f:
            summary = json.load(f)
    summary.setdefault("per_sigma", {})

    for jsonl in sorted(glob.glob(os.path.join(out, "certified_sigma*.jsonl"))):
        m = re.match(r"certified_sigma([\d.]+)_N(\d+)\.jsonl", os.path.basename(jsonl))
        if not m:
            continue
        sigma, n_sampling = m.group(1), int(m.group(2))
        recs = []
        with open(jsonl) as f:
            for line in f:
                if line.strip():
                    try:
                        recs.append(json.loads(line))
                    except json.JSONDecodeError:
                        break  # truncated tail from a mid-write kill
        if not recs:
            continue
        radii = [r["certified_radius"] for r in recs
                 if r["y_pred"] == r["y_true"] and r["certified_radius"] > 0]
        summary["per_sigma"][sigma] = {
            "n_utterances": len(recs),
            "certified_correct": len(radii),
            "certified_acc": len(radii) / len(recs),
            "abstain": sum(1 for r in recs if r["y_pred"] == -1),
            "mean_certified_radius": float(np.mean(radii)) if radii else 0.0,
            "max_certified_radius": float(np.max(radii)) if radii else 0.0,
            "jsonl": os.path.relpath(jsonl, REPO),
            "N": n_sampling,
        }
    with open(spath, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
