"""Parse a jax.profiler .xplane.pb trace into an op-level device-time table
(VERDICT r3 #1: account for >=95% of the SVGP step).

Reads the TPU device plane's "XLA Ops" line, aggregates event durations by
(de-duplicated) HLO instruction, buckets them into human categories, and
prints per-step cost assuming the trace wraps one `lax.scan` dispatch of
``--steps`` steps (profile_svgp.py traces 50).

Usage: python tools/parse_xplane.py <trace_dir> [--steps 50] [--top 40]
"""
import argparse
import collections
import glob
import re
import sys


def load_space(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # TSL proto, no TF runtime needed

    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


# category -> regex over the full HLO instruction text (name + shapes)
CATEGORIES = [
    ("scan(while) wrapper", re.compile(r"^%while")),
    ("pallas covariance (Kuf/Kuu fwd)", re.compile(r"^%jvp__|pallas|stationary")),
    ("cholesky", re.compile(r"^%custom-call.*cholesky|^%custom-call\.\d+ = f32\[\d+,128,128\]")),
    ("wide [M,B] matmul", re.compile(r"=\s*(bf16|f32)\[2048,8192\].*fusion")),
    ("[M,M] matmul", re.compile(r"=\s*(bf16|f32)\[2048,2048\].*fusion\((bf16|f32)\[2048,")),
    ("triangular-inverse panels", re.compile(r"=\s*f32\[128,2048\]")),
    ("[B]/[M] reduction fusions", re.compile(r"multiply_reduce_fusion|reduce_fusion")),
    ("elementwise [M,M] (mask/KL/tril)", re.compile(r"multiply_add_fusion|=\s*\(f32\[1,2048,2048\]")),
    ("optimizer update (flat)", re.compile(r"=\s*f32\[4194304\]|=\s*f32\[16777216\]")),
    ("copies / layout", re.compile(r"^%copy|copy-done|copy-start|bitcast")),
]


def categorize(instr: str) -> str:
    for cat, pat in CATEGORIES:
        if pat.search(instr):
            return cat
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--device", default="/device:TPU:0")
    args = ap.parse_args()

    space = load_space(args.trace_dir)
    plane = next((p for p in space.planes if p.name == args.device), None)
    if plane is None:
        raise SystemExit(f"plane {args.device} not found: {[p.name for p in space.planes]}")
    line = next((l for l in plane.lines if l.name == "XLA Ops"), None)
    if line is None:
        raise SystemExit(f"no 'XLA Ops' line: {[l.name for l in plane.lines]}")

    md = plane.event_metadata
    agg: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in line.events:
        name = md[e.metadata_id].name
        base = re.sub(r"\.\d+$", "", name.split(" = ")[0]) + " = " + name.split(" = ", 1)[-1][:110]
        agg[base] += e.duration_ps
        cnt[base] += 1

    # The %while event is the whole scan body: its duration IS the step time;
    # every other event is nested inside it, so exclude it from the sum.
    wall_ps = sum(ps for name, ps in agg.items() if name.startswith("%while"))
    inner = {n: ps for n, ps in agg.items() if not n.startswith("%while")}
    inner_ps = sum(inner.values())

    by_cat: collections.Counter = collections.Counter()
    for name, ps in inner.items():
        by_cat[categorize(name)] += ps

    S = args.steps
    print(f"scan wall-clock: {wall_ps/1e9:.2f} ms for {S} steps = {wall_ps/1e9/S:.3f} ms/step")
    print(f"sum of inner XLA ops: {inner_ps/1e9:.2f} ms = {inner_ps/1e9/S:.3f} ms/step "
          f"({100*inner_ps/max(wall_ps,1):.1f}% of wall; <100% = scheduling gaps, "
          f">100% = async overlap)")
    print()
    print(f"{'category':38s} {'ms/step':>8s} {'% wall':>7s}")
    for cat, ps in by_cat.most_common():
        print(f"{cat:38s} {ps/1e9/S:8.3f} {100*ps/max(wall_ps,1):6.1f}%")
    print()
    print(f"top {args.top} instructions (ms/step):")
    for name, ps in collections.Counter(inner).most_common(args.top):
        print(f"{ps/1e9/S:7.4f}  x{cnt[name]:<4} [{categorize(name)[:24]:24s}] {name[:120]}")


if __name__ == "__main__":
    main()
