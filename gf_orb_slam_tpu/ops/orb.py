"""ORB keypoint orientation + rBRIEF-256 descriptors, and the full extractor.

Reference: ORBextractor (src/ORBextractor.cc:769-920 operator(), :131 IC_Angle,
:204-462 pattern + computeDescriptors). TPU redesign:

* IC_Angle becomes a dense 2-channel 31×31 convolution producing the (m10, m01)
  intensity-centroid moment maps for the whole image, sampled at keypoints —
  MXU-friendly dense compute instead of per-keypoint scalar loops.
* rBRIEF uses the classic 30-bin rotation quantization (2π/30 like the
  original ORB), with all 30 rotated copies of the 256-pair sampling pattern
  precomputed host-side; descriptor sampling is then a single batched gather
  from the blurred level image followed by vectorized bit packing to
  [N, 8] uint32.
* The sampling pattern itself is generated from a seeded Gaussian distribution
  per the original BRIEF/ORB recipe (σ = patch/5, pairs deduplicated) — a
  from-scratch pattern, not the OpenCV learned table; matching quality is
  validated statistically in tests (descriptor invariance under rotation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam_tpu.ops import fast as fast_ops
from gf_orb_slam_tpu.ops import pyramid as pyr

HALF_PATCH = 15
EDGE_MARGIN = 19  # ref EDGE_THRESHOLD (ORBextractor.cc:58)
N_ROT_BINS = 30
N_BITS = 256
N_WORDS = 8  # 256 bits as 8 × uint32


# ---------------------------------------------------------------------------
# Sampling pattern
# ---------------------------------------------------------------------------


def make_brief_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 2, 2) int32 — 256 point pairs (p, q) in patch coords.

    Gaussian-II sampling from the BRIEF paper: p ~ N(0, (S/5)²),
    q ~ N(p, (S/25)²)·? — we use the simpler isotropic variant with both points
    ~ N(0, (S/5)²) clipped to the 31×31 patch, deduplicated, which empirically
    gives near-ORB matching quality once rotation-steered.
    """
    rng = np.random.default_rng(seed)
    sigma = (2 * HALF_PATCH + 1) / 5.0
    pairs = []
    seen = set()
    while len(pairs) < N_BITS:
        p = np.clip(np.round(rng.normal(0, sigma, 2)), -13, 13).astype(np.int32)
        q = np.clip(np.round(rng.normal(0, sigma, 2)), -13, 13).astype(np.int32)
        key = (p[0], p[1], q[0], q[1])
        if (p == q).all() or key in seen:
            continue
        seen.add(key)
        pairs.append((p, q))
    return np.asarray(pairs, dtype=np.int32)  # (256, 2 points, 2=[x,y])


def rotated_patterns(pattern: np.ndarray) -> np.ndarray:
    """(30, 256, 2, 2) int32 — pattern pre-rotated at 12° steps (ORB's
    quantized steering; original paper section 4.1)."""
    out = np.zeros((N_ROT_BINS, N_BITS, 2, 2), dtype=np.int32)
    for b in range(N_ROT_BINS):
        th = 2.0 * np.pi * b / N_ROT_BINS
        c, s = np.cos(th), np.sin(th)
        x, y = pattern[..., 0], pattern[..., 1]
        out[b, ..., 0] = np.round(c * x - s * y)
        out[b, ..., 1] = np.round(s * x + c * y)
    return out


_PATTERN = make_brief_pattern()
_ROT_PATTERNS = rotated_patterns(_PATTERN)  # host-side numpy; closed over jit


# ---------------------------------------------------------------------------
# Orientation (IC_Angle)
# ---------------------------------------------------------------------------


def _moment_masks() -> np.ndarray:
    """(2, 31, 31) x- and y-weighted circular-disc masks."""
    r = HALF_PATCH
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    disc = (xs * xs + ys * ys) <= r * r
    return np.stack([xs * disc, ys * disc]).astype(np.float32)


def moment_maps_circular(img: jnp.ndarray) -> jnp.ndarray:
    """Exact circular-disc (m10, m01) maps via one dense 31×31 conv — the
    reference-faithful version (slow: ~0.7 GMAC/frame)."""
    masks = jnp.asarray(_moment_masks())  # (2, 31, 31)
    x = img[None, None, :, :].astype(jnp.float32)
    k = masks[:, None, :, :]  # OIHW
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0]  # (2, H, W)


def moment_maps(img: jnp.ndarray) -> jnp.ndarray:
    """(2, H, W) circular-disc centroid-moment maps, bf16 conv on the MXU.

    The disc support must stay circular — a square window does not commute
    with image rotation, which breaks descriptor steering. bf16 inputs halve
    the conv cost; moments are large sums, so the 0.4% relative error moves
    the IC angle by ≲0.3°, far below the 12° steering bin.
    """
    masks = jnp.asarray(_moment_masks())  # (2, 31, 31)
    x = img[None, None, :, :].astype(jnp.bfloat16)
    k = masks[:, None, :, :].astype(jnp.bfloat16)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    return out[0]  # (2, H, W)


_MOMENT_FLAT = _moment_masks().reshape(2, -1).T  # (961, 2) numpy, closed over jit


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Keypoint orientations in radians [0, 2π) (ref IC_Angle cc:131-160).

    Dense 31×31 moment convs cost ~55 ms/frame on a v5e (1-input-channel convs
    tile terribly onto the MXU); moments are only needed AT the keypoints, so
    gather the N 31×31 patches (one flat gather) and reduce against the two
    disc masks with a single (N, 961) @ (961, 2) matmul instead.
    """
    h, w = img.shape
    r = HALF_PATCH
    xi = jnp.clip(xy[..., 0].astype(jnp.int32), r, w - 1 - r)
    yi = jnp.clip(xy[..., 1].astype(jnp.int32), r, h - 1 - r)
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    offs = jnp.asarray((dy * w + dx).reshape(-1), jnp.int32)      # (961,)
    idx = (yi * w + xi)[:, None] + offs[None, :]                  # (N, 961)
    patches = jnp.take(img.reshape(-1), idx, axis=0)              # (N, 961)
    m = patches @ jnp.asarray(_MOMENT_FLAT)                       # (N, 2)=[m10,m01]
    ang = jnp.arctan2(m[:, 1], m[:, 0])
    return jnp.where(ang < 0, ang + 2.0 * jnp.pi, ang)


# ---------------------------------------------------------------------------
# Descriptors
# ---------------------------------------------------------------------------


def brief_descriptors(
    blurred: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """(N, 8) uint32 packed rBRIEF-256 descriptors.

    Nearest-pixel sampling from the blurred image at rotation-steered pattern
    offsets — one flat gather of N×512 samples.
    """
    h, w = blurred.shape
    flat = blurred.reshape(-1)
    rot = jnp.asarray(_ROT_PATTERNS)  # (30, 256, 2, 2)

    bins = jnp.clip(
        jnp.round(angles * (N_ROT_BINS / (2.0 * jnp.pi))).astype(jnp.int32) % N_ROT_BINS,
        0,
        N_ROT_BINS - 1,
    )
    offs = rot[bins]  # (N, 256, 2, 2)
    xi = xy[:, None, None, 0].astype(jnp.int32) + offs[..., 0]
    yi = xy[:, None, None, 1].astype(jnp.int32) + offs[..., 1]
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    samples = jnp.take(flat, yi * w + xi, axis=0)  # (N, 256, 2)
    bits = samples[..., 0] < samples[..., 1]  # (N, 256)

    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(
        bits.reshape(bits.shape[0], N_WORDS, 32).astype(jnp.uint32) << shifts[None, None, :],
        axis=-1,
        dtype=jnp.uint32,
    )
    return words  # (N, 8)


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------


class OrbConfig(NamedTuple):
    """Runtime equivalent of the settings-yaml ORBextractor.* block
    (src/Tracking.cc:182-206)."""

    n_features: int = 800
    n_levels: int = 8
    scale: float = 1.2
    fast_threshold: float = 20.0
    fast_min_threshold: float = 7.0
    grid: int = 8


class Keypoints(NamedTuple):
    """SoA keypoint set, fixed capacity = cfg.n_features, mask `valid`.

    uv is in level-0 (full-resolution) pixel coordinates, as the reference
    stores after scaling (ORBextractor.cc:905-918).
    """

    uv: jnp.ndarray        # (N, 2) float32
    response: jnp.ndarray  # (N,) float32
    octave: jnp.ndarray    # (N,) int32
    angle: jnp.ndarray     # (N,) float32 radians
    desc: jnp.ndarray      # (N, 8) uint32
    valid: jnp.ndarray     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


@partial(jax.jit, static_argnames=("cfg",))
def extract_orb(img: jnp.ndarray, cfg: OrbConfig) -> Keypoints:
    """Grayscale f32 [H, W] → Keypoints with capacity cfg.n_features.

    Per level: FAST quota detection → IC orientation → blur → rBRIEF; keypoint
    coords rescaled to level 0. All shapes static; invalid slots masked.
    """
    levels = pyr.build_pyramid(img, cfg.n_levels, cfg.scale)
    quotas = pyr.features_per_level(cfg.n_features, cfg.n_levels, cfg.scale)
    sf = pyr.scale_factors(cfg.n_levels, cfg.scale)

    parts = []
    for lv, (lvl_img, quota) in enumerate(zip(levels, quotas)):
        if quota <= 0:
            continue
        xy, resp, valid = fast_ops.detect_keypoints(
            lvl_img,
            n_keep=quota,
            threshold=cfg.fast_threshold,
            min_threshold=cfg.fast_min_threshold,
            grid=cfg.grid,
        )
        h, w = lvl_img.shape
        inside = (
            (xy[:, 0] >= EDGE_MARGIN)
            & (xy[:, 0] < w - EDGE_MARGIN)
            & (xy[:, 1] >= EDGE_MARGIN)
            & (xy[:, 1] < h - EDGE_MARGIN)
        )
        valid = valid & inside
        ang = ic_angles(lvl_img, xy)
        blurred = pyr.gaussian_blur(lvl_img)
        desc = brief_descriptors(blurred, xy, ang)
        uv0 = xy * sf[lv]
        parts.append(
            Keypoints(
                uv=uv0,
                response=resp,
                octave=jnp.full((quota,), lv, jnp.int32),
                angle=ang,
                desc=desc,
                valid=valid,
            )
        )

    return Keypoints(
        uv=jnp.concatenate([p.uv for p in parts]),
        response=jnp.concatenate([p.response for p in parts]),
        octave=jnp.concatenate([p.octave for p in parts]),
        angle=jnp.concatenate([p.angle for p in parts]),
        desc=jnp.concatenate([p.desc for p in parts]),
        valid=jnp.concatenate([p.valid for p in parts]),
    )
