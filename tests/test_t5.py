"""T5 structural tests with tiny random weights (no checkpoint needed)."""

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import t5

TINY = t5.T5Config(
    vocab=64, d_model=16, d_ff=32, heads=2, d_kv=8, layers=2,
    rel_buckets=8, rel_distance=16,
)
PARAMS = t5.init_params(jax.random.key(0), TINY)
IDS = jnp.asarray([[5, 9, 3, 1, 0, 0]], jnp.int32)
MASK = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)


class TestT5:
    def test_encode_shape(self):
        out = t5.encode(PARAMS, TINY, IDS, MASK)
        assert out.shape == (1, 6, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_invariance(self):
        """Encoder output at valid positions must ignore padded tokens."""
        ids2 = IDS.at[0, 4].set(33)  # change a PADDED token
        a = np.asarray(t5.encode(PARAMS, TINY, IDS, MASK))
        b = np.asarray(t5.encode(PARAMS, TINY, ids2, MASK))
        np.testing.assert_allclose(a[0, :4], b[0, :4], atol=1e-5)

    def test_greedy_generate_deterministic(self):
        key = jax.random.key(1)
        a = t5.generate(PARAMS, TINY, IDS, MASK, key, max_len=8)
        b = t5.generate(PARAMS, TINY, IDS, MASK, key, max_len=8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.shape == (1, 8)

    def test_sampled_generate_runs(self):
        out = t5.generate(
            PARAMS, TINY, IDS, MASK, jax.random.key(2), max_len=8,
            do_sample=True, top_k=5,
        )
        assert out.shape == (1, 8)
        assert int(out.max()) < TINY.vocab

    def test_no_eos_at_first_position(self):
        outs = []
        for s in range(5):
            out = t5.generate(
                PARAMS, TINY, IDS, MASK, jax.random.key(s), max_len=4,
                do_sample=True, top_k=50,
            )
            outs.append(int(np.asarray(out)[0, 0]))
        assert all(o != TINY.eos_id for o in outs)

    def test_rel_bucket_monotone(self):
        rel = jnp.arange(-20, 21)
        buckets = t5._rel_bucket(rel, True, 8, 16)
        assert int(buckets.min()) >= 0 and int(buckets.max()) < 8
