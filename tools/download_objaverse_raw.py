#!/usr/bin/env python
"""Raw gobjaverse tar downloader from the Alibaba OSS mirror (counterpart
of /root/reference/tools/download_objaverse.py:6-51) — fetches the per-scene
render tars that tools/prepare_gobjaverse.py packs into HDF5 shards, so the
shard pipeline is reproducible end-to-end from the public source.

Usage:
    # index first (same URL the reference documents):
    #   curl -LO {OSS_BASE}/gobjaverse_280k.json
    python tools/download_objaverse_raw.py --out_dir ./data \\
        --index gobjaverse_280k.json --workers 10 [--limit 100]

Scene ids in the index look like "0/10010"; each maps to
{OSS_BASE}/objaverse_tar/0/10010.tar and lands in <out_dir>/0/10010.tar.
Already-downloaded scenes (an existing tar or an unpacked folder) are
skipped, mirroring the reference's resume behavior. Requires network
access — run on a connected host, not in the build container.
"""

from __future__ import annotations

import argparse
import json
import os
import urllib.request
from concurrent.futures import ThreadPoolExecutor

OSS_BASE = ("https://virutalbuy-public.oss-cn-hangzhou.aliyuncs.com"
            "/share/aigc3d")


def existing_scenes(root: str) -> set:
    """Scene ids already present under root, as either '<cat>/<id>.tar'
    files or unpacked '<cat>/<id>/' folders."""
    done = set()
    if not os.path.isdir(root):
        return done
    for cat in os.listdir(root):
        cat_dir = os.path.join(root, cat)
        if not os.path.isdir(cat_dir):
            continue
        for entry in os.listdir(cat_dir):
            sid = entry[:-4] if entry.endswith(".tar") else entry
            done.add(f"{cat}/{sid}")
    return done


def fetch_scene(scene: str, out_dir: str, retries: int = 3) -> str | None:
    url = f"{OSS_BASE}/objaverse_tar/{scene}.tar"
    dst = os.path.join(out_dir, scene + ".tar")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".part"
    for attempt in range(retries):
        try:
            urllib.request.urlretrieve(url, tmp)
            os.replace(tmp, dst)
            return dst
        except Exception as e:  # noqa: BLE001 — per-scene failures are logged
            if attempt == retries - 1:
                print(f"FAILED {scene}: {e!r}")
                if os.path.exists(tmp):
                    os.remove(tmp)
                return None
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--index", required=True,
                    help="gobjaverse_280k.json scene-id list")
    ap.add_argument("--workers", type=int, default=10)
    ap.add_argument("--limit", type=int, default=0,
                    help="download only the first N scenes (0 = all)")
    a = ap.parse_args(argv)

    with open(a.index) as f:
        scenes = json.load(f)
    if a.limit:
        scenes = scenes[: a.limit]
    done = existing_scenes(a.out_dir)
    todo = [s for s in scenes if s not in done]
    print(f"{len(scenes)} scenes in index, {len(done)} present, "
          f"{len(todo)} to download")

    with ThreadPoolExecutor(a.workers) as ex:
        for i, path in enumerate(
                ex.map(lambda s: fetch_scene(s, a.out_dir), todo)):
            if path and (i + 1) % 100 == 0:
                print(f"[{i + 1}/{len(todo)}] {path}")


if __name__ == "__main__":
    main()
