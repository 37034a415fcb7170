#!/bin/bash
# Commit whatever artifact files exist right now (called by the TPU chain
# after every stage attempt, success or failure). Round-5 lesson: a VM
# reset wiped 17k iters of un-committed DiffWave training — trained
# checkpoints must land in git the moment they exist.
cd /root/repo
git add -A artifacts/ 2>/dev/null
git diff --cached --quiet && exit 0
git commit -q -m "${1:-r5 artifacts: TPU chain auto-commit}"
echo "[commit] $(git log --oneline -1)"
