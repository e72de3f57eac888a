"""Aggregate a jax xplane trace: per-line totals and per-op-category
self-time breakdown for the TPU device plane."""
import glob, re, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob(sys.argv[1] + "/**/*.xplane.pb", recursive=True))[-1]
space = xplane_pb2.XSpace()
with open(path, "rb") as f:
    space.ParseFromString(f.read())

def category(name):
    m = re.match(r"%?([a-zA-Z][\w-]*?)[\.\d]*\s*=", name)
    op = m.group(1) if m else name.split("(")[0]
    # strip trailing digits
    op = re.sub(r"[\.\d]+$", "", op)
    if "convolution" in op or "conv" in name[:200] and "convolution(" in name:
        return "convolution"
    return op

for plane in space.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        by_cat = defaultdict(float)
        cnt = defaultdict(int)
        examples = {}
        tot = 0.0
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            c = category(name)
            d = ev.duration_ps / 1e12  # s
            by_cat[c] += d
            cnt[c] += 1
            tot += d
            if c not in examples or d > examples[c][0]:
                examples[c] = (d, name[:130])
        print(f"\n--- line '{line.name}' (id {line.id}): total {tot*1e3:.1f} ms, {len(line.events)} events")
        for c, s in sorted(by_cat.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {s*1e3:9.2f} ms x{cnt[c]:5d}  {c}")
            print(f"              biggest: {examples[c][0]*1e3:.2f} ms  {examples[c][1]}")
