"""Capture a jax.profiler device trace of the W48 forward and print the
top HLO ops by self-time (parsed from the xplane proto directly)."""
import glob, os, shutil, sys, time
from collections import defaultdict
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtpe_tpu.models import PoseHigherHRNet, w48_config

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
OUT = "/tmp/rtpe_prof"
shutil.rmtree(OUT, ignore_errors=True)

model = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.bfloat16)
v = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False))()
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
x = jax.random.normal(jax.random.PRNGKey(1), (BS, 640, 640, 3), jnp.float32)
jax.block_until_ready(fwd(v, x))  # compile
print("compiled", flush=True)

jax.profiler.start_trace(OUT)
for t in range(3):
    x2 = jax.random.normal(jax.random.PRNGKey(50 + t), (BS, 640, 640, 3),
                           jnp.float32)
    jax.block_until_ready(fwd(v, x2))
jax.profiler.stop_trace()

files = glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True)
print("xplane files:", files, flush=True)
from tensorflow.tsl.profiler.protobuf import xplane_pb2
space = xplane_pb2.XSpace()
with open(files[0], "rb") as f:
    space.ParseFromString(f.read())
for plane in space.planes:
    total_by_name = defaultdict(float)
    count_by_name = defaultdict(int)
    nlines = 0
    for line in plane.lines:
        nlines += 1
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            total_by_name[name] += ev.duration_ps / 1e6  # -> us
            count_by_name[name] += 1
    tot = sum(total_by_name.values())
    print(f"\n=== plane: {plane.name}  lines={nlines} total={tot/1e3:.2f} ms")
    for name, us in sorted(total_by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {us/1e3:9.3f} ms  x{count_by_name[name]:4d}  {name[:110]}")
