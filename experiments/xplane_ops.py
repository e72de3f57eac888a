"""Parse a jax.profiler xplane.pb directly and rank TPU op self-times.

The installed tensorboard_plugin_profile's C++ converter is
version-skewed with tensorflow, so this reads the raw XSpace proto
(tensorflow.tsl.profiler.protobuf.xplane_pb2) and aggregates event
durations on the TPU device plane's op lines.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python experiments/xplane_ops.py /tmp/prof_train [--top 40]
"""

import argparse
import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load(logdir):
    pbs = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        sys.exit(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--list", action="store_true",
                    help="just list planes/lines")
    args = ap.parse_args()
    xs = load(args.logdir)

    if args.list:
        for p in xs.planes:
            print(f"plane: {p.name!r}  lines={len(p.lines)}")
            for ln in p.lines:
                dur = sum(e.duration_ps for e in ln.events) / 1e12
                print(f"  line: {ln.name!r} events={len(ln.events)} "
                      f"busy={dur * 1e3:.2f} ms")
        return

    for p in xs.planes:
        if "TPU" not in p.name and "tpu" not in p.name.lower():
            continue
        emeta = {m.id: m.name for m in p.event_metadata.values()}
        for ln in p.lines:
            if not ln.events or "Ops" not in ln.name:
                continue
            agg = collections.Counter()
            cnt = collections.Counter()
            t0 = min(e.offset_ps for e in ln.events)
            t1 = max(e.offset_ps + e.duration_ps for e in ln.events)
            for e in ln.events:
                name = emeta.get(e.metadata_id, str(e.metadata_id))
                agg[name] += e.duration_ps
                cnt[name] += 1
            tot = sum(agg.values())
            print(f"\n=== {p.name!r} / {ln.name!r}: "
                  f"sum {tot / 1e12 * 1e3:.2f} ms, "
                  f"span {(t1 - t0) / 1e12 * 1e3:.2f} ms ===")
            for name, ps in agg.most_common(args.top):
                print(f"  {ps / 1e12 * 1e3:9.3f} ms "
                      f"({100 * ps / tot:4.1f}%, "
                      f"n={cnt[name]:4d})  {name[:100]}")


if __name__ == "__main__":
    main()
