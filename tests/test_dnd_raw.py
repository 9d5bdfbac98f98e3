"""DND harness parity: our crop loops vs the reference's official kit,
executed bit-for-bit on a synthetic DND fixture.

Builds a fake DND data folder (info.mat in the MATLAB-v7.3/h5py layout the
official kit reads, plus images_raw/ and images_srgb/), runs BOTH our
eval/dnd.py loops and the reference's dnd_submission_py/dnd_denoise.py on
it with the same deterministic denoiser, and requires identical outputs —
including the raw-Bayer phase interleave and the σ(phase) indexing.
"""

import sys
from pathlib import Path

import h5py
import numpy as np
import pytest
import scipy.io as sio

from virnet_tpu.eval.dnd import (bundle_submissions_raw,
                                 bundle_submissions_srgb, denoise_raw,
                                 denoise_srgb)

REF = "/root/reference"

N_IMG = 50      # the official loops hardcode 50 images x 20 boxes
N_BOX = 20
IMG = 16        # tiny synthetic images
CROP = 8


@pytest.fixture(scope="module")
def dnd_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("dnd")
    (root / "images_raw").mkdir()
    (root / "images_srgb").mkdir()
    rng = np.random.default_rng(0)

    with h5py.File(root / "info.mat", "w") as f:
        info = f.create_group("info")
        ref_dtype = h5py.special_dtype(ref=h5py.Reference)
        bb_refs = np.empty((1, N_IMG), dtype=object)
        nlf_refs = np.empty((1, N_IMG), dtype=object)
        sr_refs = np.empty((1, N_IMG), dtype=object)
        for i in range(N_IMG):
            # MATLAB 1-based [y1, x1, y2, x2], even-aligned starts; stored
            # transposed (4, 20) so np.array(...).T gives (20, 4)
            boxes = np.zeros((N_BOX, 4))
            for k in range(N_BOX):
                y0 = 2 * int(rng.integers(0, (IMG - CROP) // 2 + 1))
                x0 = 2 * int(rng.integers(0, (IMG - CROP) // 2 + 1))
                boxes[k] = [y0 + 1, x0 + 1, y0 + CROP, x0 + CROP]
            d = info.create_dataset(f"bb{i}", data=boxes.T)
            bb_refs[0, i] = d.ref
            g = info.create_group(f"nlf{i}")
            g.create_dataset("a", data=np.full((1, 1), 0.01 * (i + 1)))
            g.create_dataset("b", data=np.full((1, 1), 1e-4))
            nlf_refs[0, i] = g.ref
            s = info.create_dataset(
                f"sr{i}", data=rng.uniform(0.001, 0.05, (2, 2, N_BOX)))
            sr_refs[0, i] = s.ref
        info.create_dataset("boundingboxes", data=bb_refs, dtype=ref_dtype)
        info.create_dataset("nlf", data=nlf_refs, dtype=ref_dtype)
        info.create_dataset("sigma_raw", data=sr_refs, dtype=ref_dtype)

    for i in range(N_IMG):
        raw = rng.random((IMG, IMG)).astype(np.float32)
        with h5py.File(root / "images_raw" / f"{i + 1:04d}.mat", "w") as f:
            f.create_dataset("Inoisy", data=raw.T)   # stored transposed
        srgb = rng.random((IMG, IMG, 3)).astype(np.float32)
        with h5py.File(root / "images_srgb" / f"{i + 1:04d}.mat", "w") as f:
            f.create_dataset("InoisySRGB", data=srgb.T)
    return root


def _ref_module():
    sys.path.insert(0, str(Path(REF) / "dnd_submission_py"))
    try:
        import dnd_denoise
        import bundle_submissions
    finally:
        sys.path.pop(0)
    return dnd_denoise, bundle_submissions


def _raw_denoiser(x, nlf):
    # uses the per-phase sigma so the (xx, yy, k) indexing is exercised
    return (x * 0.5 + np.float32(nlf["sigma"])).astype(np.float32)


def _srgb_denoiser(x, nlf):
    # uses the per-image NLF 'a' so load_nlf parity is exercised
    return (x * 0.5 + np.float32(nlf["a"])).astype(np.float32)


def _compare_mats(dir_a, dir_b, key="Idenoised_crop"):
    mats = sorted(Path(dir_a).glob("*.mat"))
    assert len(mats) == N_IMG * N_BOX
    for m in mats:
        a = sio.loadmat(str(m))[key]
        b = sio.loadmat(str(Path(dir_b) / m.name))[key]
        np.testing.assert_array_equal(a, b)


def test_denoise_raw_matches_reference(dnd_folder, tmp_path):
    dnd_denoise, _ = _ref_module()
    ours, theirs = tmp_path / "ours", tmp_path / "theirs"
    denoise_raw(_raw_denoiser, dnd_folder, ours, log_fn=lambda *a: None)
    import contextlib, io
    with contextlib.redirect_stdout(io.StringIO()):
        dnd_denoise.denoise_raw(_raw_denoiser, str(dnd_folder), str(theirs))
    _compare_mats(ours, theirs)

    one = sio.loadmat(str(ours / "0001_01.mat"))["Idenoised_crop"]
    assert one.shape == (CROP, CROP)


def test_denoise_srgb_matches_reference(dnd_folder, tmp_path):
    dnd_denoise, _ = _ref_module()
    ours, theirs = tmp_path / "ours", tmp_path / "theirs"
    denoise_srgb(_srgb_denoiser, dnd_folder, ours, log_fn=lambda *a: None)
    import contextlib, io
    with contextlib.redirect_stdout(io.StringIO()):
        dnd_denoise.denoise_srgb(_srgb_denoiser, str(dnd_folder),
                                 str(theirs))
    _compare_mats(ours, theirs)


def test_bundle_raw_matches_reference(dnd_folder, tmp_path):
    dnd_denoise, bundle = _ref_module()
    out = tmp_path / "crops"
    denoise_raw(_raw_denoiser, dnd_folder, out, log_fn=lambda *a: None)
    bundle_submissions_raw(out)
    ours = out / "bundled"

    theirs = tmp_path / "theirs"
    theirs.mkdir()
    for m in out.glob("*.mat"):
        (theirs / m.name).write_bytes(m.read_bytes())
    import contextlib, io
    with contextlib.redirect_stdout(io.StringIO()):
        bundle.bundle_submissions_raw(str(theirs) + "/")

    for i in range(N_IMG):
        a = sio.loadmat(str(ours / f"{i + 1:04d}.mat"))
        b = sio.loadmat(str(Path(theirs) / "bundled" / f"{i + 1:04d}.mat"))
        assert bool(a["israw"]) == bool(b["israw"]) is True
        assert a["eval_version"].item() == b["eval_version"].item()
        for k in range(N_BOX):
            np.testing.assert_array_equal(a["Idenoised"][0, k],
                                          b["Idenoised"][0, k])
