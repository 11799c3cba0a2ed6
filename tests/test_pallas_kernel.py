"""Pallas Hamming kernel: exactness vs the XLA lowering (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_refactored_tpu.ops import hamming


class TestPallasHamming:
    def test_swar_popcount(self):
        from orb_slam2_refactored_tpu.ops.pallas.hamming_kernel import _popcount_u32

        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.integers(0, 2**32, 4096, dtype=np.uint32))
        got = np.asarray(_popcount_u32(v))
        want = np.asarray(jnp.bitwise_count(v)).astype(np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_kernel_interpret_exact(self):
        """Run the kernel body in interpreter mode on CPU — same math path
        the TPU executes (validated bit-exact on hardware separately)."""
        from orb_slam2_refactored_tpu.ops.pallas import hamming_kernel as hk
        from jax.experimental import pallas as pl

        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.integers(0, 2**32, (hk.TM, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (hk.TN, 8), dtype=np.uint32))
        out = pl.pallas_call(
            hk._hamming_tile_kernel,
            out_shape=jax.ShapeDtypeStruct((hk.TM, hk.TN), jnp.int32),
            interpret=True,
        )(a, b)
        ref = np.asarray(
            jnp.sum(jnp.bitwise_count(a[:, None, :] ^ b[None, :, :]), -1)
        )
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_dispatch_fallback_on_cpu(self):
        """On the CPU test backend the dispatcher must use the XLA path."""
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.integers(0, 2**32, (2048, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (1024, 8), dtype=np.uint32))
        d = hamming.hamming_matrix(a, b)  # > threshold: probes and falls back
        assert d.shape == (2048, 1024)
        assert int(d.max()) <= 256


class TestHammingMXU:
    def test_mxu_form_bit_exact(self):
        """The +-1 matmul form equals XOR+popcount exactly: the dot is a sum
        of 256 terms in {+1,-1} (every partial sum an integer < 2^24, exact
        in f32), so (256 - dot)/2 is the Hamming distance bit-for-bit."""
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.integers(0, 2**32, (97, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (131, 8), dtype=np.uint32))
        ref = np.asarray(
            jnp.sum(jnp.bitwise_count(
                jnp.bitwise_xor(a[:, None, :], b[None, :, :])
            ).astype(jnp.int32), axis=-1)
        )
        got = np.asarray(hamming.hamming_matrix_mxu(a, b))
        np.testing.assert_array_equal(got, ref)

    def test_mxu_extremes(self):
        z = jnp.zeros((3, 8), jnp.uint32)
        f = jnp.full((2, 8), 0xFFFFFFFF, jnp.uint32)
        assert np.all(np.asarray(hamming.hamming_matrix_mxu(z, f)) == 256)
        assert np.all(np.asarray(hamming.hamming_matrix_mxu(z, z)) == 0)
