"""DBoW2 text vocabulary round-trip tests."""

import numpy as np

from orb_slam2_refactored_tpu.slam.vocabulary import (
    Vocabulary, load_dbow2_text, save_dbow2_text, train_vocabulary, transform,
)

import jax.numpy as jnp


class TestVocabIO:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        desc = rng.integers(0, 2**32, (400, 8), dtype=np.uint32)
        voc = train_vocabulary(desc, n_words=64, iters=3)
        p = tmp_path / "voc.txt"
        save_dbow2_text(voc, str(p))
        voc2 = load_dbow2_text(str(p))
        np.testing.assert_array_equal(np.asarray(voc.words), np.asarray(voc2.words))
        q = jnp.asarray(desc[:50])
        v1, w1 = transform(voc, q, jnp.ones(50, bool))
        v2, w2 = transform(voc2, q, jnp.ones(50, bool))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_loads_tree_format(self, tmp_path):
        """Internal (non-leaf) nodes must be skipped like the reference's
        tree walk effectively does for word lookup."""
        rng = np.random.default_rng(1)
        p = tmp_path / "tree_voc.txt"
        with open(p, "w") as f:
            f.write("2 2 0 0\n")
            # internal node
            bytes0 = " ".join(str(int(x)) for x in rng.integers(0, 256, 32))
            f.write(f"0 0 {bytes0} 0\n")
            # two leaves
            for _ in range(2):
                b = " ".join(str(int(x)) for x in rng.integers(0, 256, 32))
                f.write(f"1 1 {b} 0.5\n")
        voc = load_dbow2_text(str(p))
        assert voc.n_words == 2
