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

Status: validated correct on real TPU hardware (the earlier numerical
discrepancy was the MXU defaulting to bf16 multiplication -- fixed with
Precision.HIGHEST) and in interpreter mode (tests/test_kernels.py).  The
kernel itself beats XLA's scatter ~3x, but the mandatory gather of the
contributions into sorted order costs as much as the scatter it replaces, so
it is not wired into production paths -- the structured dense assembly
(structured.py) covers the benchmark meshes and the direct segment-sum covers
unstructured ones.  It remains available for workloads whose data already
arrives segment-sorted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLAB = 512


def _segsum_kernel(starts_ref, lo_ref, hi_ref, data_ref, out_ref, chunk_ref, sem):
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

    # lo/hi come pre-shifted from the host: Mosaic's odd-offset 1D lane
    # slices are avoided entirely
    lo = lo_ref[...].reshape(1, s)  # first contribution of each slot
    hi = hi_ref[...].reshape(1, s)  # one-past-last
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
        acc = acc + jnp.dot(
            slab,
            mask,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[:] = acc.reshape(s)


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "tile_slots", "chunk", "interpret")
)
def sorted_segment_sum_pallas(
    data_sorted, lo_tiled, hi_tiled, chunk_starts, *, n_tiles: int,
    tile_slots: int, chunk: int, interpret: bool = False
):
    """Segment-sum of presorted data into ``n_tiles * tile_slots`` slots.

    data_sorted : (>= max_start + chunk,) f32, sorted by slot, zero-padded
    lo_tiled / hi_tiled : (n_tiles * tile_slots,) int32 per-slot contribution
        ranges [lo, hi)
    chunk_starts : (n_tiles,) int32 aligned DMA start of each tile
    """
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_slots,), lambda i, s: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_slots,), lambda i, s: (i,), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(chunk_starts, lo_tiled, hi_tiled, data_sorted)


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
        tile_slots: int = 1024,
        chunk: int = 0,
    ):
        if tile_slots % 1024:
            raise ValueError("tile_slots must be a multiple of 1024 "
                             "(TPU 1D block tiling)")
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
        )  # length n_slots_pad + 1

        # per-slot [lo, hi) contribution ranges, pre-shifted host-side
        lo = bounds_pad[:n_slots_pad]
        hi = bounds_pad[1 : n_slots_pad + 1]
        # 1D HBM DMA slices must be 1024-aligned: align starts down and round
        # the chunk length up
        tile_lo = lo.reshape(n_tiles, tile_slots)
        tile_hi = hi.reshape(n_tiles, tile_slots)
        starts = (tile_lo[:, 0] // 1024) * 1024
        max_chunk = int((tile_hi[:, -1] - starts).max())
        if chunk <= 0:
            chunk = max(1024, -(-max_chunk // 1024) * 1024)
        if max_chunk > chunk:
            raise ValueError(
                f"tile needs {max_chunk} contributions > chunk {chunk}; "
                "increase chunk or reduce tile_slots"
            )
        self.chunk = chunk
        self.n_contrib = n_contrib
        self._lo = jnp.asarray(lo, dtype=jnp.int32)
        self._hi = jnp.asarray(hi, dtype=jnp.int32)
        self._chunk_starts = jnp.asarray(starts, dtype=jnp.int32)

    def __call__(self, data_sorted, interpret: bool = False):
        """data_sorted: (>= n_contrib + chunk,) f32 (zero-padded)."""
        out = sorted_segment_sum_pallas(
            data_sorted,
            self._lo,
            self._hi,
            self._chunk_starts,
            n_tiles=self.n_tiles,
            tile_slots=self.tile_slots,
            chunk=self.chunk,
            interpret=interpret,
        )
        return out[: self.n_slots]

    @property
    def padded_data_len(self) -> int:
        return self.n_contrib + self.chunk
