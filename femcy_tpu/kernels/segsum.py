"""Pallas TPU kernel: tiled segment-sum over presorted contributions.

XLA lowers scatter-add at a few ns per element on TPU, which makes the FEM
assembly reduction (~144M contributions at 1M elements) the dominant cost.
This kernel restructures the sorted-segment reduction as on-chip dense math:

* the flat output slot space is tiled, S slots per grid program;
* each program DMAs the contiguous chunk of (row,col)-sorted contributions
  covering its slots (start looked up via scalar prefetch);
* the ragged per-slot reduction becomes slab-wise interval masks (two
  ``broadcasted_iota`` comparisons against the slot boundaries) contracted
  with the contribution slab on the MXU: out += slab (1,L) @ mask (L,S).

No scatter instruction is ever issued; everything is contiguous DMA + dense
compare + matmul.  f32 only; the host plan comes from the sorted order /
counts exported by the native pattern builder (femcy_tpu/native/pattern.cpp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLAB = 512


def _segsum_kernel(starts_ref, bounds_ref, data_ref, out_ref, chunk_ref, sem):
    """One tile: S output slots, contributions in data[start : start+CHUNK]."""
    i = pl.program_id(0)
    start = starts_ref[i]
    chunk_len = chunk_ref.shape[0]
    s = out_ref.shape[0]

    dma = pltpu.make_async_copy(
        data_ref.at[pl.ds(pl.multiple_of(start, 1024), chunk_len)],
        chunk_ref,
        sem,
    )
    dma.start()

    lo = bounds_ref[0:s].reshape(1, s)  # first contribution of each slot
    hi = bounds_ref[1 : s + 1].reshape(1, s)  # one-past-last
    dma.wait()

    acc = jnp.zeros((1, s), dtype=jnp.float32)
    for j in range(chunk_len // _SLAB):
        cg = (
            start
            + j * _SLAB
            + jax.lax.broadcasted_iota(jnp.int32, (_SLAB, s), 0)
        )
        mask = ((cg >= lo) & (cg < hi)).astype(jnp.float32)
        slab = chunk_ref[pl.ds(j * _SLAB, _SLAB)].reshape(1, _SLAB)
        acc = acc + jnp.dot(slab, mask, preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(s)


@functools.partial(jax.jit, static_argnames=("n_tiles", "tile_slots", "chunk"))
def sorted_segment_sum_pallas(
    data_sorted, bounds_tiled, chunk_starts, *, n_tiles: int, tile_slots: int,
    chunk: int
):
    """Segment-sum of presorted data into ``n_tiles * tile_slots`` slots.

    data_sorted : (>= max_start + chunk,) f32, sorted by slot, zero-padded
    bounds_tiled : (n_tiles * (tile_slots + 128),) int32 slot boundaries
        (per tile: S+1 boundaries, lane-padded to S+128)
    chunk_starts : (n_tiles,) int32 first contribution of each tile
    """
    width = bounds_tiled.shape[0] // n_tiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((width,), lambda i, s: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # data stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (tile_slots,), lambda i, s: (i,), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _segsum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_slots,), jnp.float32),
    )(chunk_starts, bounds_tiled, data_sorted)


class TiledSegsum:
    """Host-built plan + device callable for one fixed scatter pattern.

    Produces the same values as ``jax.ops.segment_sum(data, targets)`` over a
    fixed target multiset, given the contributions pre-gathered into sorted
    order.
    """

    def __init__(
        self,
        csr_counts: np.ndarray,
        csr_slots: np.ndarray,
        n_slots: int,
        tile_slots: int = 512,
        chunk: int = 0,
    ):
        n_contrib = int(csr_counts.sum())
        counts_per_slot = np.zeros(n_slots, dtype=np.int64)
        counts_per_slot[np.asarray(csr_slots)] = csr_counts
        bounds = np.zeros(n_slots + 1, dtype=np.int64)
        np.cumsum(counts_per_slot, out=bounds[1:])

        self.n_slots = n_slots
        self.tile_slots = tile_slots
        n_tiles = -(-n_slots // tile_slots)
        self.n_tiles = n_tiles
        n_slots_pad = n_tiles * tile_slots
        bounds_pad = np.concatenate(
            [bounds, np.full(n_slots_pad - n_slots, n_contrib, dtype=np.int64)]
        )

        # per-tile boundaries (overlapping by one, lane-padded to S+128)
        idx = (
            np.arange(n_tiles)[:, None] * tile_slots
            + np.arange(tile_slots + 128)[None, :]
        )
        bounds_tiled = bounds_pad[np.minimum(idx, n_slots_pad)]
        # 1D HBM DMA slices must be 1024-aligned: align starts down and round
        # the chunk length up
        starts = (bounds_tiled[:, 0] // 1024) * 1024
        max_chunk = int((bounds_tiled[:, tile_slots] - starts).max())
        if chunk <= 0:
            chunk = max(1024, -(-max_chunk // 1024) * 1024)
        if max_chunk > chunk:
            raise ValueError(
                f"tile needs {max_chunk} contributions > chunk {chunk}; "
                "increase chunk or reduce tile_slots"
            )
        self.chunk = chunk
        self.n_contrib = n_contrib
        self._bounds_tiled = jnp.asarray(
            bounds_tiled.reshape(-1), dtype=jnp.int32
        )
        self._chunk_starts = jnp.asarray(starts, dtype=jnp.int32)

    def __call__(self, data_sorted):
        """data_sorted: (>= n_contrib + chunk,) f32 (zero-padded)."""
        out = sorted_segment_sum_pallas(
            data_sorted,
            self._bounds_tiled,
            self._chunk_starts,
            n_tiles=self.n_tiles,
            tile_slots=self.tile_slots,
            chunk=self.chunk,
        )
        return out[: self.n_slots]

    @property
    def padded_data_len(self) -> int:
        return self.n_contrib + self.chunk
