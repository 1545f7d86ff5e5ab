#!/usr/bin/env python
"""Print scalar tags from a tensorboard event file, fast.

`event_accumulator` decodes every record — including multi-MB image panels —
and takes minutes on a live LaRa training log. This reads the TFRecord
framing directly (8-byte little-endian length, 4-byte crc, payload, 4-byte
crc) and only proto-parses records small enough to be scalar events.

Usage: python tools/tb_scalars.py <logdir> [tag1,tag2,...] [--last N]
With no tags, lists every scalar tag seen with its point count.
"""

import argparse
import glob
import os
import struct

from tensorboardX.proto.event_pb2 import Event

MAX_SCALAR_RECORD = 200_000  # records larger than this are image panels


def read_scalars(logdir: str, tags=None):
    files = sorted(glob.glob(os.path.join(logdir, "events.out.tfevents.*")))
    if not files:
        raise FileNotFoundError(f"no event files under {logdir}")
    out = {}
    for path in files:
        with open(path, "rb") as f:
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                (ln,) = struct.unpack("<Q", hdr)
                f.read(4)
                data = f.read(ln)
                f.read(4)
                if len(data) < ln or ln > MAX_SCALAR_RECORD:
                    continue
                ev = Event()
                try:
                    ev.ParseFromString(data)
                except Exception:
                    continue
                for v in ev.summary.value:
                    if v.HasField("simple_value") and (
                            tags is None or v.tag in tags):
                        out.setdefault(v.tag, []).append(
                            (ev.step, v.simple_value))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("tags", nargs="?", default=None,
                    help="comma-separated tag list (default: list all)")
    ap.add_argument("--last", type=int, default=5)
    args = ap.parse_args()

    tags = set(args.tags.split(",")) if args.tags else None
    data = read_scalars(args.logdir, tags)
    for tag in sorted(data):
        pts = [(s, round(v, 3)) for s, v in data[tag]]
        print(f"{tag}: {pts[-args.last:]} (n={len(pts)})")


if __name__ == "__main__":
    main()
