import glob, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2
path = sorted(glob.glob(sys.argv[1] + "/**/*.xplane.pb", recursive=True))[-1]
space = xplane_pb2.XSpace()
space.ParseFromString(open(path, "rb").read())
for plane in space.planes:
    if "TPU" not in plane.name: continue
    for line in plane.lines:
        if line.name != "XLA Ops": continue
        agg = defaultdict(float); cnt = defaultdict(int)
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            agg[name] += ev.duration_ps / 1e9  # ms
            cnt[name] += 1
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
            print(f"{ms:8.2f} ms x{cnt[name]:3d}  {name[:150]}")
