#!/usr/bin/env python
"""Dataset downloader (counterpart of tools/download_dataset.py, C27):
threaded HuggingFace Hub fetch of GSO.zip, the Co3D h5 files and the 32
gobjaverse shards. Requires network access (not available in the build
container — run on a connected host)."""

import argparse
from concurrent.futures import ThreadPoolExecutor

REPO = "apchen/LaRa"
FILES = (
    ["dataset/GSO.zip", "dataset/co3d_teddybear.h5", "dataset/co3d_hydrant.h5"]
    + [f"dataset/gobjaverse/gobjaverse_part_{i}.h5" for i in range(32)]
)


def fetch(args):
    fname, out_dir = args
    from huggingface_hub import hf_hub_download

    return hf_hub_download(repo_id=REPO, filename=fname, repo_type="dataset",
                           local_dir=out_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default=".")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--subset", choices=["all", "gso", "co3d", "gobjaverse"],
                    default="all")
    a = ap.parse_args()
    files = [f for f in FILES if a.subset == "all"
             or a.subset in f.lower()]
    with ThreadPoolExecutor(a.workers) as ex:
        for p in ex.map(fetch, [(f, a.out_dir) for f in files]):
            print("->", p)


if __name__ == "__main__":
    main()
