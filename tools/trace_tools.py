"""Parse jax.profiler xplane protobufs without TensorFlow.

The profiler writes ``plugins/profile/<ts>/*.xplane.pb`` — an ``XSpace``
proto (tensorflow/tsl profiler). We only need plane/line names and event
names + durations, so a generic protobuf wire-format walk over the few
field numbers involved is enough:

XSpace:        planes = 1 (repeated XPlane)
XPlane:        id=1, name=2, lines=3 (XLine), event_metadata=4 (map),
               stat_metadata=5 (map)
XLine:         id=1, name=2, events=4 (XEvent)
XEvent:        metadata_id=1, offset_ps=2, duration_ps=3, stats=4
XEventMetadata id=1, name=2, display_name=4
map entry:     key=1, value=2

Field numbers verified against tsl/profiler/protobuf/xplane.proto.
"""

import collections
import glob
import os
import re


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value_bytes_or_int) over a message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, i = _varint(buf, i)
        elif wire == 1:
            val = buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:
            val = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f'wire type {wire}')
        yield field, wire, val


Event = collections.namedtuple('Event', 'name duration_ps offset_ps')


def parse_xplane(path):
    """-> {plane_name: {line_name: [Event...]}}"""
    with open(path, 'rb') as f:
        space = f.read()
    planes = {}
    for fno, _, val in fields(space):
        if fno != 1:
            continue
        name = ''
        lines_raw = []
        metadata = {}
        for pf, _, pv in fields(val):
            if pf == 2:
                name = pv.decode('utf-8', 'replace')
            elif pf == 3:
                lines_raw.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                key = None
                meta_name = ''
                for mf, _, mv in fields(pv):
                    if mf == 1:
                        key = mv
                    elif mf == 2:
                        for ef, _, ev in fields(mv):
                            if ef == 2:
                                meta_name = ev.decode('utf-8', 'replace')
                metadata[key] = meta_name
        lines = {}
        for lv in lines_raw:
            line_name = ''
            events = []
            for lf, _, lval in fields(lv):
                if lf == 2:
                    line_name = lval.decode('utf-8', 'replace')
                elif lf == 4:
                    mid = dur = off = 0
                    for ef, _, ev in fields(lval):
                        if ef == 1:
                            mid = ev
                        elif ef == 2:
                            off = ev
                        elif ef == 3:
                            dur = ev
                    events.append(Event(metadata.get(mid, str(mid)),
                                        dur, off))
            lines.setdefault(line_name, []).extend(events)
        planes[name] = lines
    return planes


def newest_xplane(logdir):
    paths = glob.glob(os.path.join(logdir, 'plugins', 'profile',
                                   '*', '*.xplane.pb'))
    if not paths:
        raise FileNotFoundError(f'no xplane.pb under {logdir}')
    return max(paths, key=os.path.getmtime)


CATEGORIES = (
    ('copy', re.compile(r'^(copy|.*transpose.*|copy-start|copy-done)')),
    ('conv', re.compile(r'.*(convolution|conv)\b.*|^%?(convolution|conv)')),
    ('dot', re.compile(r'.*dot.*')),
    ('fusion', re.compile(r'^(loop_|input_|output_)?fusion')),
    ('reduce', re.compile(r'.*reduce.*')),
    ('dma', re.compile(r'.*(dynamic-update-slice|dynamic-slice).*')),
)


def op_summary(events, top=30):
    """Aggregate device events by op-name prefix; returns (summary, total).

    summary: list of (key, total_ms, count) sorted by time desc.
    """
    agg = collections.Counter()
    counts = collections.Counter()
    for ev in events:
        # strip trailing .N dedup suffixes and %-prefixes
        key = ev.name.split('.')[0].lstrip('%')
        agg[key] += ev.duration_ps
        counts[key] += 1
    total = sum(agg.values())
    rows = [(k, v / 1e9, counts[k]) for k, v in agg.most_common(top)]
    return rows, total / 1e9


def device_events(planes, line='XLA Ops'):
    """Events of every device plane's sync XLA-op line, flattened.

    The 'Async XLA Ops' line holds copy-start spans that overlap compute;
    including them double-counts, so only the sync line is aggregated by
    default.
    """
    out = []
    for pname, lines in planes.items():
        if 'TPU' not in pname and 'Device' not in pname \
                and '/device:' not in pname:
            continue
        for lname, events in lines.items():
            if lname == line:
                out.extend(events)
        if not any(ln == line for ln in lines):
            busiest = max(lines.values(), key=lambda evs: sum(
                e.duration_ps for e in evs), default=[])
            out.extend(busiest)
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('logdir')
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--line-list', action='store_true')
    args = ap.parse_args()
    path = newest_xplane(args.logdir)
    print(f'# {path}')
    planes = parse_xplane(path)
    if args.line_list:
        for pname, lines in planes.items():
            print(pname)
            for lname, evs in lines.items():
                print(f'  {lname}: {len(evs)} events, '
                      f'{sum(e.duration_ps for e in evs)/1e9:.3f} ms')
        return
    evs = device_events(planes)
    rows, total = op_summary(evs, args.top)
    print(f'total device time: {total:.3f} ms over {len(evs)} events')
    for key, ms, count in rows:
        print(f'{ms:9.3f} ms {count:5d}x  {key}')


if __name__ == '__main__':
    main()
