"""Native C++ data kernels vs numpy reference (skips if lib not built)."""

import numpy as np
import pytest

from lara_tpu.data import native as nv


requires_native = pytest.mark.skipif(not nv.have_native(),
                                     reason="liblara_native.so not built")


@requires_native
def test_composite_rgba_matches_numpy():
    rng = np.random.default_rng(0)
    rgba = (rng.uniform(size=(33, 17, 4)) * 255).astype(np.uint8)
    bg = np.array([0.25, 0.5, 1.0], np.float32)
    rgb, mask = nv.composite_rgba(rgba, bg)
    img = rgba.astype(np.float32) / 255.0
    ref = img[..., :3] * img[..., 3:] + bg * (1 - img[..., 3:])
    np.testing.assert_allclose(rgb, ref, atol=1e-6)
    np.testing.assert_array_equal(mask, (rgba[..., 3] > 0).astype(np.uint8))


@requires_native
def test_decode_normal_matches_numpy():
    rng = np.random.default_rng(1)
    nrm = (rng.uniform(size=(9, 11, 3)) * 255).astype(np.uint8)
    rot = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    out = nv.decode_normal(nrm, rot)
    ref = (nrm.astype(np.float32) / 255 * 2 - 1) @ rot.T
    np.testing.assert_allclose(out, ref, atol=1e-5)


@requires_native
def test_build_rays_matches_numpy():
    from lara_tpu.utils.camera import build_rays_np, fov_to_ixt

    ixt = fov_to_ixt(np.array([0.7, 0.9]), np.array([24, 16]))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.2, -0.1, -2.0]
    got = nv.build_rays_single(c2w, ixt, 16, 24)
    ref = build_rays_np(c2w[None], ixt[None], 16, 24, 1.0)[0]
    np.testing.assert_allclose(got, ref, atol=1e-5)


@requires_native
def test_h5_read_matches_h5py(tmp_path):
    """libdeflate direct-chunk reads must be byte-identical to h5py across
    whole-shape chunks, auto chunks (partial edge chunks), and must fall
    back cleanly on layouts it does not handle (shuffle, uncompressed)."""
    import h5py

    rng = np.random.default_rng(2)
    a = (rng.uniform(size=(37, 23, 4)) * 255).astype(np.uint8)
    b = rng.normal(size=(50, 17)).astype(np.float32)
    path = tmp_path / "t.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("whole", data=a, compression="gzip", chunks=a.shape)
        f.create_dataset("auto", data=a, compression="gzip", chunks=(13, 9, 3))
        f.create_dataset("f32", data=b, compression="gzip", chunks=(16, 16))
        f.create_dataset("shuffled", data=a, compression="gzip", shuffle=True)
        f.create_dataset("plain", data=a)
    with h5py.File(path, "r") as f:
        for k in ("whole", "auto", "f32", "shuffled", "plain"):
            np.testing.assert_array_equal(nv.h5_read(f[k]), np.asarray(f[k]),
                                          err_msg=k)


def test_h5_read_threaded_shared_handle(tmp_path):
    """Concurrent h5_read through ONE shared File handle must neither crash
    nor corrupt: raw read_direct_chunk calls raced on a shared handle in
    the threaded loader (round-5 quality run died with 'Unspecified error
    in H5Dread_chunk') — h5_read now serializes the raw chunk read and
    falls back to the stock read on any failure."""
    import threading

    import h5py
    import numpy as np

    from lara_tpu.data import native

    path = tmp_path / "t.h5"
    rng = np.random.default_rng(0)
    arrays = {}
    with h5py.File(path, "w") as f:
        for i in range(12):
            a = rng.integers(0, 255, (33, 47, 3), np.uint8)
            f.create_dataset(f"d{i}", data=a, compression="gzip",
                             chunks=(33, 47, 3))
            arrays[f"d{i}"] = a
    f = h5py.File(path, "r")
    errors, mismatches = [], []

    def worker(tid):
        try:
            for rep in range(30):
                k = f"d{(tid + rep) % 12}"
                got = native.h5_read(f[k])
                if not np.array_equal(got, arrays[k]):
                    mismatches.append(k)
        except Exception as e:  # pragma: no cover - the regression itself
            errors.append(repr(e))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    f.close()
    assert not errors, errors[:3]
    assert not mismatches, mismatches[:3]
