"""ORB parity harness vs the reference extractor semantics (VERDICT r4 #3).

Small numpy oracles TRANSCRIBE the reference's math — FAST-9/16 segment test
(`/root/reference/src/ORBextractor.cc:489-540` via cv::FAST), IC_Angle
(`:74-101` + umax setup `:704-719`), ComputeOrbDescriptor (`:103-140`),
ComputeNumFeaturesPerScale (`:472-487`) — and the TPU kernels are asserted
against them on shared synthetic images. This anchors TH_LOW=50/TH_HIGH=100
and all BoW behavior to reference descriptor semantics.

Documented INTENTIONAL divergences (tested with explicit gates, not hidden):
- NMS/tiling: the reference runs cv::FAST per ~30px cell with 6px overlap
  (per-cell NMS can keep both of two seam-adjacent corners); ours is one
  whole-image 3x3 NMS — strictly more conservative. The oracle therefore
  checks the SEGMENT TEST + score exactly, and NMS at the whole-image level.
- IC_Angle reads the reference's umax rim table (cvRound(sqrt(225-v^2)) with
  a symmetry fix), which includes a few pixels with x^2+y^2 > 225; our
  circular mask excludes them. Angles agree to ~1 deg (toleranced below) —
  well under the 5.6 deg MXU bin the descriptors quantize to anyway.
- The production MXU descriptor path quantizes the steering angle to 64
  bins; at each BIN CENTER the bits are exact vs the oracle (margin-gated
  for the bf16 contraction).
- Blur: reference compares uint8-rounded GaussianBlur outputs; ours stays
  f32. Bits can differ only where the blurred test pair ties within one
  gray level — excluded via the margin gate.
"""

import numpy as np
import jax.numpy as jnp

from orb_slam2_refactored_tpu.ops import fast as fast_ops
from orb_slam2_refactored_tpu.ops import image as image_ops
from orb_slam2_refactored_tpu.ops import orb as orb_ops

HALF = 15


def cvround(x):
    return int(np.rint(x))


# ---------------------------------------------------------------------------
# Oracles (numpy transcriptions of the reference semantics)
# ---------------------------------------------------------------------------

CIRCLE = [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
          (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
          (-1, -3)]


def oracle_fast_strength(img):
    """FAST-9/16 arc strength per pixel: max over the 16 circular 9-windows
    of min(circle - center) (bright) or min(center - circle) (dark). A pixel
    is a cv::FAST corner at threshold t iff strength > t, and OpenCV's
    corner score (max-threshold) is strength - 1 for integer images — same
    ordering. Direct per-window loops (no cascade tricks) as ground truth."""
    H, W = img.shape
    im = img.astype(np.int64)
    d = np.zeros((16, H, W), np.int64)
    for k, (dx, dy) in enumerate(CIRCLE):
        d[k, 3:H - 3, 3:W - 3] = (im[3 + dy:H - 3 + dy, 3 + dx:W - 3 + dx]
                                  - im[3:H - 3, 3:W - 3])
    dd = np.concatenate([d, d], 0)
    s = np.full((H, W), np.int64(-10 ** 9))
    for i in range(16):
        run = dd[i:i + 9]
        s = np.maximum(s, run.min(0))           # bright arc
        s = np.maximum(s, (-run).min(0))        # dark arc
    s = s.astype(np.float32)
    s[:3] = 0
    s[-3:] = 0
    s[:, :3] = 0
    s[:, -3:] = 0
    return s


def oracle_umax():
    """The reference's rim table (`src/ORBextractor.cc:704-719`)."""
    umax = np.zeros(HALF + 2, np.int64)
    vmax = int(np.floor(HALF * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = cvround(np.sqrt(HALF * HALF - v * v))
    v0 = 0
    for v in range(HALF, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[:HALF + 1]


def oracle_ic_angle(img, y, x, umax):
    """IC_Angle transcription (`src/ORBextractor.cc:74-101`), returning
    radians (the reference returns fastAtan2 degrees; units only)."""
    im = img.astype(np.float64)
    m01 = 0.0
    m10 = 0.0
    for u in range(-HALF, HALF + 1):
        m10 += u * im[y, x + u]
    for v in range(1, HALF + 1):
        v_sum = 0.0
        dmax = int(umax[v])
        for u in range(-dmax, dmax + 1):
            vp = im[y + v, x + u]
            vm = im[y - v, x + u]
            v_sum += vp - vm
            m10 += u * (vp + vm)
        m01 += v * v_sum
    return np.arctan2(m01, m10)


def oracle_blur(img):
    """7x7 sigma=2 separable Gaussian, BORDER_REFLECT_101, float output."""
    k = np.exp(-0.5 * (np.arange(-3, 4) / 2.0) ** 2)
    k /= k.sum()
    p = np.pad(img.astype(np.float64), 3, mode="reflect")
    t = np.zeros_like(p)
    for i, kv in enumerate(k):
        t += kv * np.roll(p, 3 - i, axis=0)
    out = np.zeros_like(p)
    for i, kv in enumerate(k):
        out += kv * np.roll(t, 3 - i, axis=1)
    return out[3:-3, 3:-3]


def oracle_descriptor(blur, y, x, angle_rad, pattern):
    """ComputeOrbDescriptor transcription (`src/ORBextractor.cc:103-140`):
    steered test pairs, cvRound-ed rotated offsets, bit = sample(A) <
    sample(B). Also returns the per-bit |A - B| margin so float-vs-uint8
    blur ties can be excluded from exactness gates. bits in pair order."""
    a, b = np.cos(angle_rad), np.sin(angle_rad)
    bits = np.zeros(256, bool)
    margin = np.zeros(256, np.float64)
    for i in range(256):
        vals = []
        for j in range(2):
            px, py = float(pattern[i, j, 0]), float(pattern[i, j, 1])
            oy = cvround(px * b + py * a)
            ox = cvround(px * a - py * b)
            vals.append(blur[y + oy, x + ox])
        bits[i] = vals[0] < vals[1]
        margin[i] = abs(vals[0] - vals[1])
    return bits, margin


def oracle_budgets(total, scale_factor, nlevels):
    """ComputeNumFeaturesPerScale transcription (`:472-487`)."""
    factor = 1.0 / scale_factor
    nfeat = total * (1 - factor) / (1 - factor ** nlevels)
    out = []
    ssum = 0
    for _ in range(nlevels - 1):
        out.append(cvround(nfeat))
        ssum += out[-1]
        nfeat *= factor
    out.append(max(total - ssum, 0))
    return out


def unpack_desc(desc_u32):
    """uint32[K,8] -> bool[K,256] in reference pair order (little-endian
    bytes, LSB-first bits — matching `_pack_bits`)."""
    by = np.asarray(desc_u32).astype("<u4").view(np.uint8).reshape(-1, 32)
    return np.unpackbits(by, axis=1, bitorder="little").astype(bool)


def make_test_image(h=120, w=160, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.float64)
    img = oracle_blur(img) * 0.7 + oracle_blur(oracle_blur(img)) * 0.3
    return np.clip(img, 0, 255).astype(np.uint8)


def _interior_corners(img, n=150, margin=orb_ops.EDGE_MARGIN):
    s = oracle_fast_strength(img)
    # whole-image 3x3 NMS on the oracle strength
    keep = np.ones_like(s, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            keep &= s >= np.roll(np.roll(s, dy, 0), dx, 1)
    s = np.where(keep & (s > 7), s, 0)
    s[:margin] = 0
    s[-margin:] = 0
    s[:, :margin] = 0
    s[:, -margin:] = 0
    ys, xs = np.nonzero(s > 0)
    order = np.argsort(-s[ys, xs])[:n]
    return ys[order], xs[order]


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

class TestFastParity:
    def test_strength_exact(self):
        img = make_test_image()
        ours = np.asarray(fast_ops.fast_strength_map(img.astype(np.float32)))
        ref = oracle_fast_strength(img)
        inner = np.s_[3:-3, 3:-3]
        assert np.array_equal(ours[inner], ref[inner]), (
            f"{np.abs(ours - ref)[inner].max()} max strength delta")

    def test_corner_mask_both_thresholds(self):
        img = make_test_image(seed=9)
        ours = np.asarray(fast_ops.fast_strength_map(img.astype(np.float32)))
        ref = oracle_fast_strength(img)
        for th in (20.0, 7.0):  # iniThFAST / minThFAST defaults
            assert np.array_equal(ours > th, ref > th)


def test_budget_parity():
    for total, sf, nl in ((2000, 1.2, 8), (1000, 1.2, 8), (1500, 1.25, 6),
                          (100, 1.2, 8), (3000, 1.1, 4)):
        assert orb_ops.features_per_level(total, nl, sf) == \
            oracle_budgets(total, sf, nl), (total, sf, nl)


def test_ic_angle_parity():
    """IC angle vs the reference umax-table transcription on the RAW image:
    EXACT parity (the moment mask transcribes the reference's umax rim —
    `orb_ops._umax_table`; a plain x^2+y^2<=r^2 mask was measured 3.9 deg
    median / 31 deg max off and replaced). Tolerance covers only f32-vs-f64
    moment accumulation."""
    img = make_test_image(seed=5)
    ys, xs = _interior_corners(img)
    assert len(ys) >= 40
    umax = oracle_umax()
    ref = np.array([oracle_ic_angle(img, y, x, umax)
                    for y, x in zip(ys, xs)])
    ours = np.asarray(orb_ops.ic_angles(
        jnp.asarray(img, jnp.float32), jnp.asarray(ys), jnp.asarray(xs)))
    deg = np.degrees(np.abs(np.angle(np.exp(1j * (ours - ref)))))
    assert deg.max() < 0.01, deg.max()


class TestDescriptorParity:
    def _setup(self, pattern_name):
        img = make_test_image(seed=7)
        ys, xs = _interior_corners(img, n=120)
        blur_ref = oracle_blur(img)
        blur_ours = np.asarray(image_ops.gaussian_blur(
            jnp.asarray(img, jnp.float32), 7, 2.0))
        # identical separable kernels: interior agreement to float roundoff
        assert np.abs(blur_ref - blur_ours).max() < 1e-2
        pat = orb_ops.get_pattern(pattern_name)
        return img, ys, xs, blur_ref, blur_ours, pat

    def test_learned_pattern_continuous_bit_exact(self):
        """The continuous (non-binned) descriptor path is BIT-EXACT vs the
        ComputeOrbDescriptor oracle under the learned OpenCV pattern, at
        the oracle's own IC angles — the foundation for TH_LOW=50 and all
        external-vocabulary compatibility."""
        img, ys, xs, blur_ref, blur_ours, pat = self._setup("learned")
        umax = oracle_umax()
        angles = np.array([oracle_ic_angle(img, y, x, umax)
                           for y, x in zip(ys, xs)])
        ours = unpack_desc(orb_ops.brief_descriptors(
            jnp.asarray(blur_ours), jnp.asarray(ys), jnp.asarray(xs),
            jnp.asarray(angles, jnp.float32), pattern="learned"))
        mismatched_tight = 0
        total = 0
        for k, (y, x) in enumerate(zip(ys, xs)):
            ref_bits, margin = oracle_descriptor(blur_ref, y, x,
                                                 float(angles[k]), pat)
            tight = margin > 0.5  # exclude float-vs-float tie noise
            mismatched_tight += int((ours[k] != ref_bits)[tight].sum())
            total += int(tight.sum())
        assert total > 100 * 200  # the gate is not vacuous
        assert mismatched_tight == 0, (
            f"{mismatched_tight}/{total} margin-gated bit mismatches")

    def test_mxu_binned_path_exact_at_bin_centers(self):
        """The MXU diff-table path equals the oracle when the steering angle
        sits AT the bin center (margin-gated for the bf16 contraction) —
        i.e. the only divergence of the production path is the documented
        5.6-deg angle quantization itself."""
        img, ys, xs, blur_ref, blur_ours, pat = self._setup("fresh")
        B = orb_ops.N_ANGLE_BINS
        rng = np.random.default_rng(0)
        bins = rng.integers(0, B, len(ys))
        angles = (bins + 0.5) * 2 * np.pi / B - np.pi
        ours = unpack_desc(orb_ops.brief_descriptors_mxu(
            jnp.asarray(blur_ours), jnp.asarray(ys), jnp.asarray(xs),
            jnp.asarray(angles, jnp.float32), pattern="fresh"))
        bad = 0
        total = 0
        for k, (y, x) in enumerate(zip(ys, xs)):
            ref_bits, margin = oracle_descriptor(blur_ref, y, x,
                                                 float(angles[k]), pat)
            tight = margin > 1.0  # bf16 carries ~0.5 gray of rounding
            bad += int((ours[k] != ref_bits)[tight].sum())
            total += int(tight.sum())
        assert total > 100 * 180
        assert bad == 0, f"{bad}/{total} margin-gated bit mismatches"
