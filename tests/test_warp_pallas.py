"""Pallas warp kernel: interpreter-mode parity with the XLA two-pass warp
(same math, same masks) across rotations incl. the transpose route."""

import numpy as np
import pytest

import jax.numpy as jnp

from hgr_tpu.ops.affine import build_affine
from hgr_tpu.ops.warp import batched_affine_warp_twopass
from hgr_tpu.ops import warp_pallas

pytestmark = pytest.mark.skipif(
    not warp_pallas._HAS_PLTPU, reason="pallas tpu backend unavailable")

RNG = np.random.RandomState(7)


@pytest.mark.parametrize("rot,scale", [
    (0.0, 1.0), (30.0, 1.2), (-75.0, 0.8), (90.0, 1.0), (180.0, 1.35),
])
def test_pallas_warp_matches_xla_twopass(rot, scale):
    b, s = 2, 256
    imgs = RNG.randint(0, 255, (b, s, s, 3)).astype(np.float32)
    m = build_affine(
        jnp.tile(jnp.asarray([128.0, 128.0]), (b, 1)),
        jnp.full((b,), scale), jnp.full((b,), rot),
        jnp.full((b,), 89.6), (192, 192))
    ref = np.asarray(batched_affine_warp_twopass(
        jnp.asarray(imgs), m, (192, 192)))
    got = np.asarray(warp_pallas.warp_twopass_pallas(
        jnp.asarray(imgs), m, (192, 192), interpret=True))
    # float accumulation order differs slightly between the kernel and
    # XLA (~0.005 on the 0-255 scale)
    np.testing.assert_allclose(got, ref, atol=0.02)


def test_pallas_warp_uint8_roundtrip():
    b, s = 1, 128
    imgs = RNG.randint(0, 255, (b, s, s, 3)).astype(np.uint8)
    m = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (b, 1, 1))
    got = np.asarray(warp_pallas.warp_twopass_pallas(
        jnp.asarray(imgs), m, (128, 128), interpret=True))
    np.testing.assert_array_equal(got, imgs)


def test_pallas_fused_jitter_matches_xla_chain():
    """jitter fused in-kernel == hsv_jitter -> twopass warp in XLA."""
    from hgr_tpu.ops.color import hsv_jitter

    b, s = 2, 128
    imgs = RNG.randint(0, 255, (b, s, s, 3)).astype(np.float32)
    m = build_affine(
        jnp.tile(jnp.asarray([64.0, 64.0]), (b, 1)),
        jnp.full((b,), 1.1), jnp.full((b,), 20.0),
        jnp.full((b,), 44.8), (96, 96))
    gains = jnp.asarray([[1.01, 1.3, 0.8], [0.99, 0.7, 1.2]], jnp.float32)
    do_j = jnp.asarray([1.0, 0.0])

    jit_imgs = np.asarray(hsv_jitter(jnp.asarray(imgs), gains))
    mixed = np.where(np.asarray(do_j)[:, None, None, None] > 0,
                     jit_imgs, imgs)
    ref = np.asarray(batched_affine_warp_twopass(
        jnp.asarray(mixed), m, (96, 96)))

    got = np.asarray(warp_pallas.warp_twopass_pallas(
        jnp.asarray(imgs), m, (96, 96), interpret=True,
        jitter_gains=gains, do_jitter=do_j))
    # float op-order can flip the LUT floor() bin at a handful of pixels
    # (sub-1-level differences); require near-exactness elsewhere.
    diff = np.abs(got - ref)
    assert diff.max() <= 1.0 + 1e-5, diff.max()
    assert (diff > 0.02).mean() < 0.01, (diff > 0.02).mean()


def test_canvas_staging_dtypes_exact():
    """bf16/u8 canvas staging must be bit-equal to f32 staging: uint8
    values are exactly representable in bfloat16 (8 significand bits)
    and the kernel computes in f32 regardless."""
    b, s = 2, 128
    imgs = RNG.randint(0, 255, (b, s, s, 3)).astype(np.uint8)
    m = build_affine(
        jnp.tile(jnp.asarray([64.0, 64.0]), (b, 1)),
        jnp.full((b,), 0.9), jnp.full((b,), -15.0),
        jnp.full((b,), 44.8), (96, 96))
    ref = np.asarray(warp_pallas.warp_twopass_pallas(
        jnp.asarray(imgs), m, (96, 96), interpret=True,
        canvas_dtype="float32"))
    for dt in ("bfloat16", "uint8", "packed"):
        got = np.asarray(warp_pallas.warp_twopass_pallas(
            jnp.asarray(imgs), m, (96, 96), interpret=True,
            canvas_dtype=dt))
        np.testing.assert_array_equal(got, ref, err_msg=dt)


def test_packed_kernel_matches_planar_with_jitter():
    """The channel-packed kernel (one int32 gather fetches B,G,R) must be
    bit-identical to the planar kernel, including the fused HSV jitter:
    jitter emits exact 0-255 integers, so the unpack->jitter->repack
    round trip inside the kernel is lossless."""
    b, s = 3, 256
    imgs = RNG.randint(0, 255, (b, s, s, 3)).astype(np.uint8)
    m = build_affine(
        jnp.tile(jnp.asarray([128.0, 128.0]), (b, 1)),
        jnp.asarray([1.0, 0.8, 1.3]), jnp.asarray([0.0, 25.0, -80.0]),
        jnp.full((b,), 89.6), (192, 192))
    gains = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.01, 1.3, 0.8], [0.99, 0.7, 1.2]], jnp.float32)
    do_j = jnp.asarray([0.0, 1.0, 1.0])
    ref = np.asarray(warp_pallas.warp_twopass_pallas(
        jnp.asarray(imgs), m, (192, 192), interpret=True,
        jitter_gains=gains, do_jitter=do_j, canvas_dtype="float32"))
    got = np.asarray(warp_pallas.warp_twopass_pallas(
        jnp.asarray(imgs), m, (192, 192), interpret=True,
        jitter_gains=gains, do_jitter=do_j, canvas_dtype="packed"))
    np.testing.assert_array_equal(got, ref)


def test_warp_pallas_chunked_large_batch(monkeypatch):
    """Batches past _MAX_GRID_B split into multiple pallas_calls and must
    equal the single-chunk path exactly (SMEM cap workaround)."""
    import hgr_tpu.ops.warp_pallas as wp

    rng = np.random.RandomState(11)
    b, s = 6, 128
    imgs = rng.randint(0, 255, (b, s, s, 3)).astype(np.float32)
    theta = 0.25
    m = np.tile(np.asarray(
        [[np.cos(theta), -np.sin(theta), 12.0],
         [np.sin(theta), np.cos(theta), -4.0]], np.float32), (b, 1, 1))
    ref = wp.warp_twopass_pallas(
        jnp.asarray(imgs), jnp.asarray(m), (96, 96), interpret=True)
    monkeypatch.setattr(wp, "_MAX_GRID_B", 4)  # forces 4+2 chunking
    chunked = wp.warp_twopass_pallas(
        jnp.asarray(imgs), jnp.asarray(m), (96, 96), interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(chunked))


def test_warp_pallas_padded_canvas_matches_unpadded():
    """Zero-padding a canvas up to the 128-multiple the kernel needs must
    not change the warp (the pipeline pads non-multiple canvases on
    device, hgr_tpu/data/pipeline.py): samples only ever land inside the
    staged window, and cv2 BORDER_CONSTANT fills zeros beyond it either
    way."""
    rng = np.random.RandomState(3)
    b, s = 3, 96  # pads to 128
    imgs = rng.randint(0, 255, (b, s, s, 3)).astype(np.float32)
    theta = -0.2
    m = np.tile(np.asarray(
        [[1.1 * np.cos(theta), -1.1 * np.sin(theta), 8.0],
         [1.1 * np.sin(theta), 1.1 * np.cos(theta), 6.0]], np.float32),
        (b, 1, 1))
    golden = batched_affine_warp_twopass(jnp.asarray(imgs),
                                         jnp.asarray(m), (64, 64))
    padded = np.zeros((b, 128, 128, 3), np.float32)
    padded[:, :s, :s] = imgs
    out = warp_pallas.warp_twopass_pallas(
        jnp.asarray(padded), jnp.asarray(m), (64, 64), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                               atol=1e-2)
