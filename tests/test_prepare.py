import numpy as np

from virnet_tpu.data import prepare as P


def _write_img(path, shape, seed):
    import cv2

    rng = np.random.default_rng(seed)
    cv2.imwrite(str(path), rng.integers(0, 255, shape, dtype=np.uint8))


def test_crop_hr_patches(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        _write_img(src / f"im{i}.png", (70, 90, 3), i)
    out = tmp_path / "patches"
    n = P.crop_hr_patches([str(p) for p in sorted(src.glob("*.png"))],
                          out, pch_size=48, stride=32)
    files = list(out.glob("*.png"))
    assert len(files) == n and n == 2 * 2 * 3  # ind_h={0,22}, ind_w={0,32,42}
    import cv2
    im = cv2.imread(str(files[0]))
    assert im.shape == (48, 48, 3)


def test_crop_sidd_patches(tmp_path):
    src = tmp_path / "scenes"
    src.mkdir()
    pairs = []
    for i in range(2):
        _write_img(src / f"n{i}.png", (80, 80, 3), 10 + i)
        _write_img(src / f"g{i}.png", (80, 80, 3), 20 + i)
        pairs.append((str(src / f"n{i}.png"), str(src / f"g{i}.png")))
    out = tmp_path / "patches"
    n = P.crop_sidd_patches(pairs, out, pch_size=32, num_patch_per_img=5)
    assert n == 10
    assert len(list((out / "noisy").glob("*.png"))) == 10
    assert len(list((out / "gt").glob("*.png"))) == 10
    # names pair up
    names_n = {p.name for p in (out / "noisy").glob("*.png")}
    names_g = {p.name for p in (out / "gt").glob("*.png")}
    assert names_n == names_g


def test_make_kernel_bank(tmp_path):
    import scipy.io as sio

    out = tmp_path / "kernels.mat"
    bank = P.make_kernel_bank(out, sfs=(2, 4), k_size=15)
    assert bank["kernels_sf2"].shape == (7, 15, 15)
    loaded = sio.loadmat(str(out))
    np.testing.assert_allclose(loaded["kernels_sf4"], bank["kernels_sf4"])
    sums = bank["kernels_sf2"].sum(axis=(1, 2))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_write_noise_benchmark_h5(tmp_path):
    import h5py

    src = tmp_path / "ims"
    src.mkdir()
    _write_img(src / "a.png", (40, 50, 3), 0)
    files = P.write_noise_benchmark_h5(src, tmp_path / "h5")
    assert len(files) == 6
    with h5py.File(files[0], "r") as f:
        g = f["a"]
        assert g["gt"].shape == (40, 50, 3)
        assert g["sigma"].shape == (40, 50)
        noise = g["noisy"][()] - g["gt"][()]
        assert noise.std() > 0.01


def test_sidd_download_list():
    parts = P.sidd_download_list(cameras=["GP", "S6"])
    assert parts == ["SIDD_Medium_Srgb_Parts_GP.zip",
                     "SIDD_Medium_Srgb_Parts_S6.zip"]


def test_sidd_download_list_matches_reference_filter(tmp_path):
    """Execute the reference's own downloader (download_sidd_all.py:11-23)
    on a synthetic SIDD_URLs.txt with os.system captured, and require our
    urls_file mode to select the same (camera-dir, filename, url) triples."""
    import os
    from pathlib import Path

    base = "http://sidd.example/data"
    urls = [
        f"{base}/0001_GP_SRGB/0001_GP_SRGB.zip",
        f"{base}/0002_GP_RAW/0002_GP_RAW.zip",
        f"{base}/0003_S6_SRGB/0003_S6_SRGB.zip",
        f"{base}/0004_IP_SRGB/0004_IP_SRGB.zip",
        f"{base}/0005_G4_SRGB/0005_G4_SRGB.zip",
        f"{base}/0006_S6_RAW/0006_S6_RAW.zip",
    ]
    root = tmp_path / "Full"
    root.mkdir()
    (root / "SIDD_URLs.txt").write_text("".join(u + "\n" for u in urls))

    src = Path("/root/reference/datasets/prepare_data/Denoising/SIDD/"
               "download_sidd_all.py").read_text()
    src = src.replace("G:/Dataset/SIDD/Full/", str(root) + "/")
    captured = []
    real_system = os.system
    os.system = lambda cmd: captured.append(cmd) or 0
    try:
        exec(compile(src, "download_sidd_all.py", "exec"),
             {"__name__": "__ref_dl__"})
    finally:
        os.system = real_system

    # reference cmd format: axel -n 32 -a -o <camera_dir><file> <url>
    ref_triples = set()
    for cmd in captured:
        out, url = cmd.split(" -o ")[1].split(" ")
        cam = Path(out).parent.name
        ref_triples.add((cam, Path(out).name, url))

    ours = P.sidd_download_list(cameras=["S6", "GP", "G4"],
                                urls_file=str(root / "SIDD_URLs.txt"))
    our_triples = {(line.split("/")[0], line.split("/")[1].split(" ")[0],
                    line.split(" ")[1]) for line in ours}
    assert our_triples == ref_triples
    assert len(ref_triples) == 3     # SRGB-only, three cameras


def test_h5_benchmark_roundtrip(tmp_path):
    from virnet_tpu.data.h5_bench import H5BenchmarkReader

    src = tmp_path / "ims2"
    src.mkdir()
    _write_img(src / "b.png", (32, 40, 3), 9)
    files = P.write_noise_benchmark_h5(src, tmp_path / "h5out")
    with H5BenchmarkReader(files[0]) as r:
        assert len(r) == 1
        name, noisy, gt, sigma = r[0]
        assert name == "b"
        assert noisy.shape == gt.shape == (32, 40, 3)
        assert sigma.shape == (32, 40)
        np.testing.assert_allclose(noisy - gt,
                                   noisy - gt)  # finite
        assert np.isfinite(noisy).all()


def test_corpus_download_list_and_verify(tmp_path):
    """Training-corpora work-list protocol (reference corpora:
    configs/denoising_syn.json:27-31) — same line format as the SIDD
    list, plus an inventory check for unpacked folders."""
    from virnet_tpu.data.prepare import (TRAIN_CORPORA,
                                         corpus_download_list,
                                         verify_corpus)

    lines = corpus_download_list()
    assert len(lines) == 4
    for line in lines:
        dest, url = line.split(" ", 1)
        assert url.startswith("https://")
        assert dest.split("/")[0] in TRAIN_CORPORA

    sub = corpus_download_list(["DIV2K_train_HR"])
    assert len(sub) == 1 and "DIV2K_train_HR.zip" in sub[0]

    d = tmp_path / "div2k"
    (d / "nested").mkdir(parents=True)
    for i in range(800):
        (d / "nested" / f"{i:04d}.png").touch()
    rep = verify_corpus(d, "DIV2K_train_HR")
    assert rep["ok"] and rep["found"] == 800
    (d / "nested" / "extra.png").touch()
    assert not verify_corpus(d, "DIV2K_train_HR")["ok"]


def test_synth_camera_pairs(tmp_path):
    src = tmp_path / "clean"
    src.mkdir()
    # smooth gradient images so the signal-dependent variance is visible
    for i in range(6):
        import cv2
        g = np.linspace(0, 255, 64 * 64, dtype=np.float32)
        img = (g.reshape(64, 64)[..., None].repeat(3, axis=2)
               + 10 * i).clip(0, 255).astype(np.uint8)
        cv2.imwrite(str(src / f"im{i}.png"), img)
    out = tmp_path / "sidd_like"
    res = P.synth_camera_pairs(sorted(src.glob("*.png")), out,
                               pch_size=32, patches_per_img=3,
                               n_val_imgs=2, n_val_blocks=2, seed=7)
    # layout matches configs/denoising_real.json expectations
    assert res["n_train"] == len(list((out / "patches256" / "noisy")
                                      .glob("*.png")))
    assert res["n_train"] == len(list((out / "patches256" / "gt")
                                      .glob("*.png")))
    assert res["n_train"] > 0 and res["val_shape"] == (2, 2, 32, 32, 3)
    from scipy.io import loadmat

    vn = loadmat(out / "ValidationNoisyBlocksSrgb.mat")[
        "ValidationNoisyBlocksSrgb"]
    vg = loadmat(out / "ValidationGtBlocksSrgb.mat")[
        "ValidationGtBlocksSrgb"]
    assert vn.shape == vg.shape == (2, 2, 32, 32, 3)
    assert vn.dtype == np.uint8
    # noise is signal-dependent: bright-half residual var > dark-half
    resid = vn.astype(np.float32) - vg.astype(np.float32)
    bright = vg.astype(np.float32) > 128
    assert resid[bright].std() > resid[~bright].std()
    assert abs(resid.mean()) < 3.0  # roughly unbiased
    # deterministic re-run
    out2 = tmp_path / "again"
    res2 = P.synth_camera_pairs(sorted(src.glob("*.png")), out2,
                                pch_size=32, patches_per_img=3,
                                n_val_imgs=2, n_val_blocks=2, seed=7)
    vn2 = loadmat(out2 / "ValidationNoisyBlocksSrgb.mat")[
        "ValidationNoisyBlocksSrgb"]
    assert np.array_equal(vn, vn2) and res2["n_train"] == res["n_train"]


def test_synth_camera_pairs_gray_and_alpha_sources(tmp_path):
    import cv2

    src = tmp_path / "mixed"
    src.mkdir()
    gray = np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8)
    cv2.imwrite(str(src / "gray.png"), gray)
    rgba = np.dstack([gray] * 3 + [np.full_like(gray, 255)])
    cv2.imwrite(str(src / "rgba.png"), rgba)
    res = P.synth_camera_pairs(sorted(src.glob("*.png")), tmp_path / "out",
                               pch_size=32, patches_per_img=2,
                               n_val_imgs=1, n_val_blocks=1, seed=1)
    assert res["val_shape"][2:] == (32, 32, 3)
    from scipy.io import loadmat

    vn = loadmat(tmp_path / "out" / "ValidationNoisyBlocksSrgb.mat")[
        "ValidationNoisyBlocksSrgb"]
    assert vn.shape[-1] == 3 and vn.dtype == np.uint8
