"""Dataset loaders: TUM / EuRoC / ETH3D / 7-Scenes / MP4 / image folders.

Host-side IO mirroring /root/reference/mast3r_slam/dataloader.py behaviour
(same calibration constants, same undistortion-rectify pipeline, same
dataset-type sniffing) with numpy/cv2 only — frames are handed to the engine
as float arrays in [0, 1]; device transfer happens in the SLAM loop.
"""

from __future__ import annotations

import pathlib
import re
from typing import List, Optional, Sequence

import numpy as np

from ..utils.image import resize_img

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def natsorted(paths: Sequence) -> List:
    """Natural sort (drop-in for the natsort dep the reference uses)."""

    def key(p):
        s = str(p)
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    return sorted(paths, key=key)


class MonocularDataset:
    """Base: indexable (timestamp, rgb float HxWx3 in [0,1]) source."""

    def __init__(self):
        self.rgb_files: List = []
        self.timestamps: List = []
        self.img_size = 512
        self.camera_intrinsics: Optional[Intrinsics] = None
        self.use_calibration = False
        self.save_results = True
        self.dataset_path: Optional[pathlib.Path] = None

    def __len__(self):
        return len(self.rgb_files)

    def __getitem__(self, idx):
        img = self.get_image(idx)
        return self.get_timestamp(idx), img

    def get_timestamp(self, idx):
        return self.timestamps[idx]

    def read_img(self, idx):
        img = cv2.imread(str(self.rgb_files[idx]))
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def get_image(self, idx):
        img = self.read_img(idx)
        if self.use_calibration and self.camera_intrinsics is not None:
            img = self.camera_intrinsics.remap(img)
        return img.astype(np.float32) / 255.0

    def get_img_shape(self):
        img = self.read_img(0)
        raw_shape = img.shape[:2]
        resized = resize_img(img.astype(np.float32) / 255.0, self.img_size)
        h, w = resized["true_shape"][0]
        return (int(h), int(w)), raw_shape

    def subsample(self, stride: int):
        self.rgb_files = self.rgb_files[::stride]
        self.timestamps = self.timestamps[::stride]

    def has_calib(self):
        return self.camera_intrinsics is not None


class TUMDataset(MonocularDataset):
    """TUM-RGBD freiburg sequences (dataloader.py:67-89, same calibs)."""

    def __init__(self, dataset_path, use_calib=False, center_pp=True):
        super().__init__()
        self.use_calibration = use_calib
        self.dataset_path = pathlib.Path(dataset_path)
        rows = np.loadtxt(self.dataset_path / "rgb.txt", dtype=str, comments="#")
        self.rgb_files = [self.dataset_path / f for f in rows[:, 1]]
        self.timestamps = rows[:, 0].tolist()

        m = re.search(r"freiburg(\d+)", str(dataset_path))
        calib = None
        if m is not None:
            idx = int(m.group(1))
            calib = {
                1: [517.3, 516.5, 318.6, 255.3, 0.2624, -0.9531, -0.0054, 0.0026, 1.1633],
                2: [520.9, 521.0, 325.1, 249.7, 0.2312, -0.7849, -0.0033, -0.0001, 0.9172],
                3: [535.4, 539.2, 320.1, 247.6],
            }.get(idx)
        if calib is not None and use_calib:
            self.camera_intrinsics = Intrinsics.from_calib(
                self.img_size, 640, 480, np.asarray(calib), center_pp=center_pp
            )


class EurocDataset(MonocularDataset):
    """EuRoC MAV cam0; ALWAYS undistorts (too much distortion for the
    pointmap prior, dataloader.py:92-117)."""

    def __init__(self, dataset_path, use_calib=False, center_pp=True):
        super().__init__()
        import yaml

        self.use_calibration = True  # always remap
        self.calib_for_opt = use_calib
        self.dataset_path = pathlib.Path(dataset_path)
        rows = np.loadtxt(
            self.dataset_path / "mav0/cam0/data.csv", delimiter=",", dtype=str,
            comments="#",
        )
        self.rgb_files = [
            self.dataset_path / "mav0/cam0/data" / f for f in rows[:, 1]
        ]
        # EuRoC groundtruth files carry raw nanosecond stamps; keep them
        # verbatim so trajectory association lines up (dataloader.py:103)
        self.timestamps = rows[:, 0].tolist()
        with open(self.dataset_path / "mav0/cam0/sensor.yaml") as f:
            cam0 = yaml.safe_load(f)
        W, H = cam0["resolution"]
        calib = [*cam0["intrinsics"], *cam0["distortion_coefficients"]]
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, W, H, np.asarray(calib), center_pp=center_pp
        )

    def read_img(self, idx):
        img = cv2.imread(str(self.rgb_files[idx]), cv2.IMREAD_GRAYSCALE)
        return cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)

    def has_calib(self):
        return self.calib_for_opt


class ETH3DDataset(MonocularDataset):
    def __init__(self, dataset_path, use_calib=False, center_pp=True):
        super().__init__()
        self.use_calibration = use_calib
        self.dataset_path = pathlib.Path(dataset_path)
        rows = np.loadtxt(self.dataset_path / "rgb.txt", dtype=str, comments="#")
        self.rgb_files = [self.dataset_path / f for f in rows[:, 1]]
        self.timestamps = rows[:, 0].tolist()
        calib = np.loadtxt(self.dataset_path / "calibration.txt", dtype=np.float32)
        _, (H, W) = self.get_img_shape()
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, W, H, calib, center_pp=center_pp
        )


class SevenScenesDataset(MonocularDataset):
    def __init__(self, dataset_path, use_calib=False, center_pp=True):
        super().__init__()
        self.use_calibration = use_calib
        self.dataset_path = pathlib.Path(dataset_path)
        self.rgb_files = natsorted(
            (self.dataset_path / "seq-01").glob("*.color.png")
        )
        self.timestamps = [str(i) for i in range(len(self.rgb_files))]
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, 640, 480, np.asarray([585.0, 585.0, 320.0, 240.0]),
            center_pp=center_pp,
        )


class Webcam(MonocularDataset):
    """Live webcam stream via cv2 (dataloader.py:206-229)."""

    def __init__(self, device_index: int = -1):
        super().__init__()
        self.cap = cv2.VideoCapture(device_index)
        self.save_results = False
        self.timestamps = []

    def __len__(self):
        return 999_999

    def get_timestamp(self, idx):
        return self.timestamps[idx]

    def read_img(self, idx):
        ok, img = self.cap.read()
        if not ok:
            raise ValueError("failed to read webcam frame")
        self.timestamps.append(str(idx / 30.0))
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def subsample(self, stride):
        pass


class RealsenseDataset(MonocularDataset):
    """Intel RealSense live stream (dataloader.py:150-202); requires
    pyrealsense2 at runtime."""

    def __init__(self, use_calib=False, center_pp=True, hw=(480, 640)):
        super().__init__()
        import pyrealsense2 as rs  # optional dependency

        self.rs = rs
        self.h, self.w = hw
        self.pipeline = rs.pipeline()
        cfgr = rs.config()
        cfgr.enable_stream(rs.stream.color, self.w, self.h, rs.format.bgr8, 30)
        self.profile = self.pipeline.start(cfgr)
        self.save_results = False
        self.timestamps = []
        self.use_calibration = use_calib
        if use_calib:
            intr = (
                rs.video_stream_profile(self.profile.get_stream(rs.stream.color))
                .get_intrinsics()
            )
            self.camera_intrinsics = Intrinsics.from_calib(
                self.img_size, self.w, self.h,
                np.asarray([intr.fx, intr.fy, intr.ppx, intr.ppy]),
                center_pp=center_pp,
            )

    def __len__(self):
        return 999_999

    def get_timestamp(self, idx):
        return self.timestamps[idx]

    def read_img(self, idx):
        frames = self.pipeline.wait_for_frames()
        self.timestamps.append(str(frames.get_timestamp() / 1000.0))
        img = np.asanyarray(frames.get_color_frame().get_data())
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def subsample(self, stride):
        pass


class MP4Dataset(MonocularDataset):
    """Long-video ingest via cv2 (dataloader.py:231-265)."""

    def __init__(self, dataset_path, stride: int = 1):
        super().__init__()
        self.dataset_path = pathlib.Path(dataset_path)
        self.cap = cv2.VideoCapture(str(self.dataset_path))
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.total_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.stride = stride
        self._next_decode = 0
        self.timestamps = [
            str(i * stride / self.fps) for i in range(len(self))
        ]

    def __len__(self):
        return self.total_frames // self.stride

    def subsample(self, stride: int):
        self.stride *= stride
        self.timestamps = [str(i * self.stride / self.fps) for i in range(len(self))]

    def read_img(self, idx):
        target = idx * self.stride
        if target != self._next_decode:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, target)
        ret, img = self.cap.read()
        self._next_decode = target + 1
        if not ret:
            raise ValueError(f"failed to decode frame {target}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class RGBFiles(MonocularDataset):
    def __init__(self, dataset_path):
        super().__init__()
        self.dataset_path = pathlib.Path(dataset_path)
        files = list(self.dataset_path.glob("*.png")) + list(
            self.dataset_path.glob("*.jpg")
        )
        self.rgb_files = natsorted(files)
        self.timestamps = [str(i / 30.0) for i in range(len(self.rgb_files))]


class Intrinsics:
    """Pinhole + distortion -> rectified-and-resized camera model.

    Mirrors dataloader.py:282-322: builds the optimal new camera matrix and
    an undistort rectify map at the raw resolution, then rescales K to the
    resized/cropped frame the network sees (``K_frame``).
    """

    def __init__(self, img_size, W, H, K_orig, K, distortion, mapx, mapy):
        self.img_size = img_size
        self.W, self.H = W, H
        self.K_orig = K_orig
        self.K = K
        self.distortion = distortion
        self.mapx, self.mapy = mapx, mapy
        _, (scale_w, scale_h, half_crop_w, half_crop_h) = resize_img_transform(
            H, W, img_size
        )
        self.K_frame = K.copy()
        self.K_frame[0, 0] = K[0, 0] / scale_w
        self.K_frame[1, 1] = K[1, 1] / scale_h
        self.K_frame[0, 2] = K[0, 2] / scale_w - half_crop_w
        self.K_frame[1, 2] = K[1, 2] / scale_h - half_crop_h

    def remap(self, img):
        return cv2.remap(img, self.mapx, self.mapy, cv2.INTER_LINEAR)

    @staticmethod
    def from_calib(img_size, W, H, calib, center_pp=True):
        fx, fy, cx, cy = calib[:4]
        distortion = np.zeros(4)
        if len(calib) > 4:
            distortion = np.asarray(calib[4:])
        K = np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
        K_opt, _ = cv2.getOptimalNewCameraMatrix(
            K, distortion, (W, H), 0, (W, H), centerPrincipalPoint=center_pp
        )
        mapx, mapy = cv2.initUndistortRectifyMap(
            K, distortion, None, K_opt, (W, H), cv2.CV_32FC1
        )
        return Intrinsics(img_size, W, H, K, K_opt, distortion, mapx, mapy)


def resize_img_transform(H, W, img_size):
    """Recompute the resize+crop transform without decoding an image."""
    res = resize_img(np.zeros((H, W, 3), dtype=np.float32), img_size)
    h, w = res["true_shape"][0]
    long_edge = max(W, H)
    if img_size == 224:
        # the 224 square-crop path scales the SHORT side (utils/image.py);
        # unused in SLAM (reference always runs 512, mast3r_utils.py:247)
        raise NotImplementedError("224 path unused in SLAM")
    scale = img_size / long_edge
    W2, H2 = int(round(W * scale)), int(round(H * scale))
    scale_w = W / W2
    scale_h = H / H2
    half_crop_w = (W2 - w) / 2
    half_crop_h = (H2 - h) / 2
    return (int(h), int(w)), (scale_w, scale_h, half_crop_w, half_crop_h)


def load_dataset(dataset_path: str, use_calib=False, center_pp=True):
    """Sniff the dataset type from the path (dataloader.py:325-343)."""
    parts = str(dataset_path).split("/")
    kw = dict(use_calib=use_calib, center_pp=center_pp)
    if "tum" in parts:
        return TUMDataset(dataset_path, **kw)
    if "euroc" in parts:
        return EurocDataset(dataset_path, **kw)
    if "eth3d" in parts:
        return ETH3DDataset(dataset_path, **kw)
    if "7-scenes" in parts:
        return SevenScenesDataset(dataset_path, **kw)
    if "webcam" in parts:
        return Webcam()
    if "realsense" in parts:
        return RealsenseDataset(**kw)
    ext = parts[-1].split(".")[-1].lower()
    if ext in ("mp4", "avi", "mov"):
        return MP4Dataset(dataset_path)
    p = pathlib.Path(dataset_path)
    if (p / "rgb.txt").exists():
        return TUMDataset(dataset_path, **kw)
    return RGBFiles(dataset_path)
