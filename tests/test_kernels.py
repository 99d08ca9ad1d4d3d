"""Pallas kernel tests (interpreter mode; see kernels/segsum.py status note)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from femcy_tpu.kernels.segsum import TiledSegsum


def _reference(csr_slots, csr_counts, data, n_slots):
    ref = np.zeros(n_slots, np.float32)
    pos = 0
    for s, c in zip(csr_slots, csr_counts):
        ref[s] = data[pos : pos + c].sum()
        pos += c
    return ref


@pytest.mark.parametrize("n_slots,n_entries", [(1000, 600), (5000, 3200)])
def test_tiled_segsum_interpret(n_slots, n_entries):
    rng = np.random.default_rng(0)
    csr_slots = np.sort(rng.choice(n_slots, size=n_entries, replace=False))
    csr_counts = rng.integers(1, 9, size=n_entries).astype(np.int32)
    plan = TiledSegsum(csr_counts, csr_slots, n_slots)
    data = rng.random(int(csr_counts.sum())).astype(np.float32)
    padded = np.zeros(plan.padded_data_len, np.float32)
    padded[: data.shape[0]] = data
    out = np.asarray(plan(jnp.asarray(padded), interpret=True))
    ref = _reference(csr_slots, csr_counts, data, n_slots)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_tiled_segsum_rejects_undersized_chunk():
    csr_slots = np.arange(10)
    csr_counts = np.full(10, 2000, np.int32)
    with pytest.raises(ValueError):
        TiledSegsum(csr_counts, csr_slots, 1024, chunk=1024)
