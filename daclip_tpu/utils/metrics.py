"""Restoration quality metrics — MATLAB-compatible PSNR/SSIM (+Y variants).

Reference: universal-image-restoration/utils/img_utils.py:136-234 and the eval
usage in config/daclip-sde/test.py:146-232.  All functions take [0,255] HWC numpy
arrays (any channel order — PSNR/SSIM are channel-symmetric; for *_Y pass BGR as
the reference does, or use rgb variants).
"""
from __future__ import annotations

import math

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from daclip_tpu.data.util import bgr2ycbcr, rgb2ycbcr


def array2img(arr: np.ndarray, min_max=(0.0, 1.0)) -> np.ndarray:
    """Our NHWC/HWC RGB float → [0,255] uint8 BGR HWC, matching tensor2img
    rounding (img_utils.py:136-163) so PSNR comparisons are bit-identical."""
    x = np.asarray(arr, np.float32)
    x = np.clip(x, *min_max)
    x = (x - min_max[0]) / (min_max[1] - min_max[0])
    if x.ndim == 4:
        x = x[0]
    if x.ndim == 3 and x.shape[2] == 3:
        x = x[:, :, ::-1]  # RGB → BGR (cv2 convention, like the reference)
    return (x * 255.0).round().astype(np.uint8)


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-equivalent SSIM (img_utils.py:185-234; note the reference averages
    the FULL-image SSIM 3x for color inputs — we keep that exact behaviour)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return _ssim_single(img1, img2)
    if img1.ndim == 3 and img1.shape[2] == 3:
        return _ssim_single(img1, img2)  # = mean of 3 identical full-image SSIMs
    if img1.ndim == 3 and img1.shape[2] == 1:
        return _ssim_single(img1[:, :, 0], img2[:, :, 0])
    raise ValueError("Wrong input image dimensions.")


def psnr_y(img1_bgr: np.ndarray, img2_bgr: np.ndarray) -> float:
    """PSNR on the Y channel of [0,255] BGR uint8 inputs (test.py:183-198)."""
    y1 = bgr2ycbcr(img1_bgr.astype(np.float64) / 255.0, only_y=True) * 255.0
    y2 = bgr2ycbcr(img2_bgr.astype(np.float64) / 255.0, only_y=True) * 255.0
    return calculate_psnr(y1, y2)


def ssim_y(img1_bgr: np.ndarray, img2_bgr: np.ndarray) -> float:
    y1 = bgr2ycbcr(img1_bgr.astype(np.float64) / 255.0, only_y=True) * 255.0
    y2 = bgr2ycbcr(img2_bgr.astype(np.float64) / 255.0, only_y=True) * 255.0
    return calculate_ssim(y1, y2)
