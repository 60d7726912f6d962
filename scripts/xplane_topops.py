#!/usr/bin/env python3
"""Minimal XSpace (.xplane.pb) parser: top device ops by total self time.

The tensorboard_plugin_profile converter in this image is incompatible
with its TensorFlow (pywrap signature drift), so this decodes the
protobuf wire format directly — XSpace/XPlane/XLine/XEvent carry only
scalar fields and nested messages, no extensions.

Usage: python scripts/xplane_topops.py <trace.xplane.pb|profile_dir> [N]
"""

import glob
import os
import sys
from collections import defaultdict


def varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over one message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = varint(buf, i)
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_event(buf):
    """XEvent: metadata_id=1, offset_ps=2, duration_ps=3, stats=4,
    num_occurrences=5 (aggregated lines)."""
    mid = dur = occ = 0
    for fn, _, v in fields(buf):
        if fn == 1:
            mid = v
        elif fn == 3:
            dur = v
        elif fn == 5:
            occ = v
    return mid, dur, max(occ, 1)


def parse_line(buf):
    """XLine: name=2, events=4 (XEvent)."""
    name = ""
    events = []
    for fn, _, v in fields(buf):
        if fn == 2:
            name = v.decode(errors="replace")
        elif fn == 4:
            events.append(parse_event(v))
    return name, events


def parse_event_metadata(buf):
    """XEventMetadata: id=1, name=2, display_name=3."""
    mid = 0
    name = disp = ""
    for fn, _, v in fields(buf):
        if fn == 1:
            mid = v
        elif fn == 2:
            name = v.decode(errors="replace")
        elif fn == 3:
            disp = v.decode(errors="replace")
    return mid, disp or name


def parse_plane(buf):
    """XPlane: name=2, lines=3, event_metadata=4 (map entry)."""
    name = ""
    lines = []
    meta = {}
    for fn, _, v in fields(buf):
        if fn == 2:
            name = v.decode(errors="replace")
        elif fn == 3:
            lines.append(parse_line(v))
        elif fn == 4:  # map<int64, XEventMetadata>: key=1, value=2
            k = None
            for mfn, _, mv in fields(v):
                if mfn == 2:
                    k, nm = parse_event_metadata(mv)
                    meta[k] = nm
    return name, lines, meta


def main():
    path = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                          recursive=True)
        path = sorted(cands)[-1]
    buf = open(path, "rb").read()

    for fn, _, v in fields(buf):  # XSpace.planes = 1
        if fn != 1:
            continue
        name, lines, meta = parse_plane(v)
        if "TPU" not in name:  # skip host/python-thread planes
            continue
        totals = defaultdict(int)
        counts = defaultdict(int)
        total_ps = 0
        for lname, events in lines:
            if lname.lower() in ("steps", "step"):
                continue
            for mid, dur, occ in events:
                nm = meta.get(mid, f"op#{mid}")
                totals[nm] += dur
                counts[nm] += occ
                total_ps += dur
        if not totals:
            continue
        print(f"\n=== plane: {name}  (summed event time "
              f"{total_ps / 1e9:.3f} ms) ===")
        rank = sorted(totals.items(), key=lambda kv: -kv[1])[:topn]
        for nm, ps in rank:
            print(f"{ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f} %  "
                  f"x{counts[nm]:<6d} {nm[:90]}")


if __name__ == "__main__":
    main()
