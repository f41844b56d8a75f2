"""Parse a captured .xplane.pb into top HLO ops by device self-time.

Companion to profile_xla.py: the tensorboard-plugin-profile converter
is broken in this image (protobuf/pywrap drift), so this reads the
XSpace proto directly via tensorflow's bundled xplane_pb2 and
aggregates the TPU "XLA Ops" line by op name.

    python tools/parse_xplane.py /tmp/jaxtrace [--top 30]
"""

import argparse
import collections
import glob
import os
import re

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                      "python")


def load(tracedir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xp = glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True)
    if not xp:
        raise SystemExit("no xplane captured")
    xs = xplane_pb2.XSpace()
    with open(xp[0], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tracedir", nargs="?", default="/tmp/jaxtrace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group", action="store_true",
                    help="group ops by name prefix (fusion family)")
    args = ap.parse_args()

    xs = load(args.tracedir)
    for p in xs.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        md = p.event_metadata
        for ln in p.lines:
            if ln.name == "XLA Modules":
                runs = collections.Counter()
                tot = collections.Counter()
                for e in ln.events:
                    name = md[e.metadata_id].name
                    runs[name] += 1
                    tot[name] += e.duration_ps / 1e9
                print("== modules ==")
                for name, t in tot.most_common():
                    n = runs[name]
                    print(f"{t:9.2f} ms total  {n:3d} runs  "
                          f"{t / n:8.2f} ms/run  {name[:80]}")
        for ln in p.lines:
            if ln.name != "XLA Ops":
                continue
            agg = collections.Counter()
            cnt = collections.Counter()
            for e in ln.events:
                name = md[e.metadata_id].name
                if args.group:
                    name = re.sub(r"[.\d]+$", "", name)
                agg[name] += e.duration_ps / 1e9
                cnt[name] += 1
            tot = sum(agg.values())
            print(f"== XLA ops: total device time {tot:.2f} ms, "
                  f"{len(agg)} op names ==")
            for name, t in agg.most_common(args.top):
                print(f"{t:9.3f} ms  {cnt[name]:7d}x  {name[:95]}")


if __name__ == "__main__":
    main()
