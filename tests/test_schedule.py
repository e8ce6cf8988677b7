import jax.numpy as jnp
import numpy as np

from ct_diffusionmodelbench_tpu.sampling.schedule import get_num_transfer_tokens
from tests.reference_impl import np_get_num_transfer_tokens


def test_matches_reference_semantics():
    rng = np.random.default_rng(0)
    for steps in (1, 3, 8, 32):
        mask = rng.random((4, 64)) < rng.uniform(0.1, 0.9)
        ours = np.asarray(get_num_transfer_tokens(jnp.asarray(mask), steps))
        ref = np_get_num_transfer_tokens(mask, steps)
        np.testing.assert_array_equal(ours, ref)


def test_rows_sum_to_mask_count():
    mask = np.zeros((2, 32), bool)
    mask[0, :7] = True
    mask[1, :] = True
    out = np.asarray(get_num_transfer_tokens(jnp.asarray(mask), 5))
    assert out[0].sum() == 7 and out[1].sum() == 32
    # first `remainder` steps get +1
    assert list(out[0]) == [2, 2, 1, 1, 1]
