"""Device-op attribution of the bench pipeline from an xprof trace.

Builds the EXACT bench.py configuration (1080p, 2000 feats, fast mode,
shipped AffNet+HardTFeat), traces one fetched execution, then parses the
axon runtime's vm.trace.json.gz (trace-event JSON: pid "/device:TPU:0",
tid "XLA Ops") and prints device time grouped by op, descending.

Run: python scripts/trace_pipeline.py [--top 40] [--raw]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def build_and_trace(log_dir):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from affnet_tpu.detector import (DetectorConfig,
                                     ScaleSpaceAffinePatchExtractor)
    from affnet_tpu.models import AffNetFast, HardTFeatNet
    from affnet_tpu.models.convert import load_pretrained
    from affnet_tpu.utils import profiler_trace

    im = Image.open("/root/reference/test-graf/img1.png").convert(
        "RGB").resize((1920, 1080), Image.BILINEAR)
    x = jnp.asarray(np.mean(np.asarray(im), axis=2).astype(np.float32))

    cfg = DetectorConfig(num_features=2000, border=5, mr_size=5.192,
                         num_baum_iters=1, th=None, patch_size=32, fast=True)
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         desc_net=HardTFeatNet)
    params = {"aff": load_pretrained("AffNetFast"),
              "desc": load_pretrained("HardTFeatNet")}
    fn, _ = det.get_jitted(1080, 1920, do_ori=False, describe=True)

    for _ in range(2):
        out = fn(params, x)
        jax.device_get((out["descs"], out["lafs"]))

    with profiler_trace(log_dir):
        out = fn(params, x)
        jax.device_get((out["descs"], out["lafs"]))


def find_trace(log_dir):
    cands = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {log_dir}")
    return max(cands, key=os.path.getmtime)


GROUPS = [
    ("conv", re.compile(r"conv|Conv")),
    ("pallas_sampler", re.compile(r"sampler|window_matmul|extract")),
    ("pallas_blur", re.compile(r"blur")),
    ("pallas_detect", re.compile(r"detect_octave|hessian")),
    ("pallas_topk", re.compile(r"topm|top_k|topk|sort|partial_reduce",
                               re.I)),
    ("dma/copy", re.compile(r"copy|Copy|transpose|Transpose")),
    ("fusion", re.compile(r"^(loop_)?fusion")),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true",
                    help="print every event name (no op-name collapsing)")
    ap.add_argument("--trace-dir", default="/tmp/xprof_bench")
    ap.add_argument("--reuse", action="store_true",
                    help="parse an existing trace instead of re-running")
    args = ap.parse_args()

    if not args.reuse:
        build_and_trace(args.trace_dir)

    path = find_trace(args.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    pid_dev = {p["pid"] for p in data.get("traceEvents", [])
               if p.get("ph") == "M" and p.get("name") == "process_name"
               and "TPU" in str(p.get("args", {}).get("name", ""))}
    tid_ops = {(p["pid"], p["tid"]) for p in data["traceEvents"]
               if p.get("ph") == "M" and p.get("name") == "thread_name"
               and "XLA Ops" in str(p.get("args", {}).get("name", ""))}

    tot = collections.Counter()
    cnt = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in pid_dev:
            continue
        if tid_ops and (e["pid"], e.get("tid")) not in tid_ops:
            continue
        name = e.get("name", "?")
        if not args.raw:
            name = re.sub(r"[.\d]+$", "", name)
        tot[name] += e.get("dur", 0)
        cnt[name] += 1

    total_us = sum(tot.values())
    print(f"# trace {os.path.basename(path)}: device total "
          f"{total_us/1e3:.2f} ms, {sum(cnt.values())} events")
    for name, us in tot.most_common(args.top):
        print(f"{us/1e3:9.3f} ms  x{cnt[name]:<5d} {name}")

    grouped = collections.Counter()
    for name, us in tot.items():
        for g, pat in GROUPS:
            if pat.search(name):
                grouped[g] += us
                break
        else:
            grouped["other"] += us
    print("\n# grouped")
    for g, us in grouped.most_common():
        print(f"{us/1e3:9.3f} ms  {g}")


if __name__ == "__main__":
    main()
