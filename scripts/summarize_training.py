#!/usr/bin/env python
"""Summarize a training run: per-epoch loss (metrics.jsonl) + the per-epoch
graf eval lines from the training log, as a markdown table for the README."""

import json
import re
import sys


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "runs/train_r3.log"
    jsonl = sys.argv[2] if len(sys.argv) > 2 else (
        "runs/r3_AffNetFast_6Brown_TFeat_0.005_500000_HardNegC/metrics.jsonl")

    loss_by_epoch = {}
    try:
        for line in open(jsonl):
            r = json.loads(line)
            if r["loss"] == r["loss"]:   # drop NaN rows from crashed runs
                loss_by_epoch.setdefault(r["epoch"], []).append(r["loss"])
    except FileNotFoundError:
        pass

    evals = []
    epoch = None
    for line in open(log):
        m = re.match(r"\[graf eval epoch (\d+)\]", line)
        if m:
            epoch = int(m.group(1))
        m = re.match(r"Test on graf1-(\d+), (\d+) tentatives (\d+) true "
                     r"matches ([\d.]+) inl.ratio", line)
        if m and epoch is not None:
            evals.append((epoch, int(m.group(2)), int(m.group(3)),
                          float(m.group(4))))
            epoch = None

    print("| epoch | mean loss | graf1-3 tentatives | true | inl.ratio |")
    print("|---|---|---|---|---|")
    seen = set()
    for e, tent, true, ratio in evals:
        if e in seen:
            continue
        seen.add(e)
        losses = loss_by_epoch.get(e, [])
        ml = f"{sum(losses)/len(losses):.4f}" if losses else "-"
        print(f"| {e} | {ml} | {tent} | {true} | {ratio:.4f} |")


if __name__ == "__main__":
    main()
