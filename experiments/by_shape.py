import glob, re, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2
path = sorted(glob.glob(sys.argv[1] + "/**/*.xplane.pb", recursive=True))[-1]
space = xplane_pb2.XSpace()
space.ParseFromString(open(path, "rb").read())
RUNS = 3
for plane in space.planes:
    if "TPU" not in plane.name: continue
    for line in plane.lines:
        if line.name != "XLA Ops": continue
        agg = defaultdict(float); cnt = defaultdict(int)
        tot = 0.0
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            m = re.match(r"%([a-z_-]+)[\.\d]* = \(?(\w+\[[\d,]*\])", name)
            key = f"{m.group(2)} {m.group(1)}" if m else name[:40]
            d = ev.duration_ps / 1e9 / RUNS
            agg[key] += d; cnt[key] += 1
            tot += d
        print(f"total/run: {tot:.1f} ms")
        for k, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:28]:
            print(f"  {ms:7.2f} ms x{cnt[k]//RUNS:4d}  {k}")
