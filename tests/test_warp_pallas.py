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
