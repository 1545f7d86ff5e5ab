#!/usr/bin/env python
"""HDF5 shard split/merge (counterpart of tools/hdf5_split_merge.py, C26)."""

import argparse
from concurrent.futures import ThreadPoolExecutor


def split_hdf5_file(src_path: str, n_parts: int, out_prefix: str):
    import h5py

    with h5py.File(src_path, "r") as src:
        keys = sorted(src.keys())
        outs = []
        for p in range(n_parts):
            out = f"{out_prefix}_part_{p}.h5"
            with h5py.File(out, "w") as dst:
                for k in keys[p::n_parts]:
                    src.copy(k, dst)
            outs.append(out)
    return outs


def merge_hdf5_files(part_paths, out_path: str, workers: int = 4):
    import h5py

    with h5py.File(out_path, "w") as dst:
        def copy_part(p):
            with h5py.File(p, "r") as src:
                return [(k, p) for k in src.keys()]

        with ThreadPoolExecutor(workers) as ex:
            listings = list(ex.map(copy_part, part_paths))
        # actual copies are serialized (hdf5 writes aren't thread-safe)
        for listing in listings:
            for k, p in listing:
                with h5py.File(p, "r") as src:
                    src.copy(k, dst)
    return out_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("split")
    sp.add_argument("src")
    sp.add_argument("--parts", type=int, default=8)
    sp.add_argument("--prefix", default="shard")
    mp = sub.add_parser("merge")
    mp.add_argument("parts", nargs="+")
    mp.add_argument("--out", required=True)
    a = ap.parse_args()
    if a.cmd == "split":
        print(split_hdf5_file(a.src, a.parts, a.prefix))
    else:
        print(merge_hdf5_files(a.parts, a.out))
