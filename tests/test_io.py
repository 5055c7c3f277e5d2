"""IO layer tests: native prefetcher, dataset loaders, settings parser."""

import os

import numpy as np
import pytest

from gf_orb_slam_tpu.io_utils import datasets, prefetch, settings


class TestNativePrefetch:
    def test_decode_and_order(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        paths = []
        imgs = []
        for i in range(8):
            img = rng.integers(0, 256, (60, 80), dtype=np.uint8)
            p = str(tmp_path / f"f{i}.png")
            cv2.imwrite(p, img)
            paths.append(p)
            imgs.append(img)
        with prefetch.FramePrefetcher(paths, 80, 60, queue_depth=3, n_threads=2) as pf:
            got = list(pf)
        assert [i for i, _ in got] == list(range(8))
        for (i, a), b in zip(got, imgs):
            np.testing.assert_allclose(a, b.astype(np.float32))

    def test_one_shot_decode(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        if not prefetch.native_available():
            pytest.skip("native lib unavailable")
        img = rng.integers(0, 256, (30, 40), dtype=np.uint8)
        p = str(tmp_path / "x.png")
        cv2.imwrite(p, img)
        out = prefetch.decode_gray(p)
        np.testing.assert_allclose(out, img.astype(np.float32))


class TestDatasets:
    def test_euroc_layout(self, tmp_path):
        base = tmp_path / "seq" / "mav0" / "cam0"
        (base / "data").mkdir(parents=True)
        with open(base / "data.csv", "w") as f:
            f.write("#timestamp,filename\n")
            f.write("1403636579763555584,1403636579763555584.png\n")
            f.write("1403636579813555456,1403636579813555456.png\n")
        seq = datasets.load_euroc(str(tmp_path / "seq"))
        assert len(seq) == 2
        assert abs(seq.timestamps[0] - 1403636579.763555584) < 1e-6
        assert seq.image_paths[0].endswith("1403636579763555584.png")

    def test_tum_layout(self, tmp_path):
        d = tmp_path / "fr1"
        d.mkdir()
        with open(d / "rgb.txt", "w") as f:
            f.write("# comment\n1305031102.175304 rgb/1305031102.175304.png\n")
        with open(d / "groundtruth.txt", "w") as f:
            f.write("1305031102.1758 1.3 0.6 1.5 0.6 0.6 -0.3 -0.2\n")
        seq = datasets.load_tum_rgbd(str(d))
        assert len(seq) == 1
        assert seq.gt_positions.shape == (1, 3)
        # quaternion reordered to wxyz
        np.testing.assert_allclose(seq.gt_quaternions[0], [-0.2, 0.6, 0.6, -0.3])

    def test_associate_gt(self, tmp_path):
        seq = datasets.Sequence(
            name="x", timestamps=[], image_paths=[],
            gt_timestamps=np.asarray([0.0, 0.1, 0.2, 0.3]),
            gt_positions=np.arange(12.0).reshape(4, 3),
        )
        pos, ok = datasets.associate_ground_truth(seq, np.asarray([0.11, 0.29, 5.0]))
        assert ok.tolist() == [True, True, False]
        np.testing.assert_allclose(pos[0], [3, 4, 5])
        np.testing.assert_allclose(pos[1], [9, 10, 11])


class TestSettings:
    def test_parse_opencv_yaml(self, tmp_path):
        p = tmp_path / "EuRoC.yaml"
        p.write_text(
            "%YAML:1.0\n"
            "Camera.fx: 458.654\nCamera.fy: 457.296\n"
            "Camera.cx: 367.215\nCamera.cy: 248.375\n"
            "Camera.k1: -0.28340811\nCamera.k2: 0.07395907\n"
            "Camera.p1: 0.00019359\nCamera.p2: 1.76187114e-05\n"
            "Camera.fps: 20.0\nCamera2.nRows: 480\nCamera2.nCols: 752\n"
            "ORBextractor.nFeatures: 800\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\nORBextractor.fastTh: 20\n"
            "UseMotionModel: 1\n"
        )
        cam, cfg = settings.load_settings(str(p))
        assert abs(cam.fx - 458.654) < 1e-6
        assert cam.width == 752 and cam.height == 480
        assert cfg.n_features == 800
        assert cfg.use_motion_model
        assert cfg.max_frames_between_kf == 12  # 18*20/30
