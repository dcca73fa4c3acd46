"""Summarize a TVR-scale run's metric trajectory (eval.log.txt + train.log.txt).

Usage: python scripts/summarize_scale_run.py [results_scale/tvr-tvrscale]
Prints a markdown table of key metrics per epoch (subsampled) + wall stats.
"""
import json
import os
import re
import sys

d = sys.argv[1] if len(sys.argv) > 1 else "results_scale/tvr-tvrscale"
rows = []
with open(os.path.join(d, "eval.log.txt")) as f:
    for line in f:
        m = re.match(r"\[epoch (-?\d+)\] (.*)", line.strip())
        if not m:
            continue
        ep = int(m.group(1))
        metrics = json.loads(m.group(2))
        rows.append((ep, metrics))

def g(mm, task, key):
    return mm.get(task, {}).get(key, float("nan"))

print("| epoch | VCMR 0.5-r1 | VCMR 0.7-r1 | SVMR 0.5-r1 | VR r1 | VR r10 |")
print("|---|---|---|---|---|---|")
keep = {r[0] for i, r in enumerate(rows)
        if i < 3 or i == len(rows) - 1 or r[0] % 5 == 0}
best = None
for ep, mm in rows:
    if best is None or g(mm, "VCMR", "0.7-r1") >= g(best[1], "VCMR", "0.7-r1"):
        best = (ep, mm)
    if ep in keep:
        print(f"| {ep} | {g(mm,'VCMR','0.5-r1')} | {g(mm,'VCMR','0.7-r1')} | "
              f"{g(mm,'SVMR','0.5-r1')} | {g(mm,'VR','r1')} | {g(mm,'VR','r10')} |")
if best:
    ep, mm = best
    print(f"\nbest VCMR 0.7-r1 at epoch {ep}: "
          f"{json.dumps({t: mm[t] for t in ('VCMR', 'SVMR', 'VR') if t in mm})}")
tl = os.path.join(d, "train.log.txt")
if os.path.exists(tl):
    epochs = open(tl).read().strip().splitlines()
    if epochs:
        print(f"\ntrain epochs logged: {len(epochs)}; last: {epochs[-1][:200]}")
