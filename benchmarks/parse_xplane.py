"""Aggregate per-op self-times from an xplane.pb trace."""
import sys, glob, collections
from tensorflow.tsl.profiler.protobuf import xplane_pb2

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace_rebuild"
path = sorted(glob.glob(root + "/**/*.xplane.pb", recursive=True))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Ops" not in line.name:
            continue
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            agg[name] += ev.duration_ps / 1e9   # -> ms
            cnt[name] += 1
    if agg:
        print(f"== plane: {plane.name}  lines: {[l.name for l in plane.lines]}")
        tot = sum(agg.values())
        print(f"total op time: {tot:.1f} ms")
        for name, ms in agg.most_common(int(sys.argv[2]) if len(sys.argv) > 2 else 45):
            print(f"{ms:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")
