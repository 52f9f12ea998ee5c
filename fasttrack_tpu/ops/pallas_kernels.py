"""Pallas TPU kernels for the matching hot path.

`hamming_penalty_matrix` fuses the three ops every matcher starts with —
the int8 Hamming MXU matmul, the int->float conversion, and the rank-1
validity/taken penalty broadcasts — into ONE tiled kernel. The fused form
never materializes the raw (M, N) dot product in HBM: each (128, 128) tile
is produced on the MXU, converted and penalized in VMEM, and written once
(one HBM write instead of dot-out + convert + two broadcast-add rounds).

Tiling: queries x keys in (128, 128) blocks (MXU-shaped); the 256-bit
descriptor contraction fits in a single block (int8 min tile is (32, 128),
so a (128, 256) operand block is well-formed). Penalty vectors ride along
as (128, 1)-blocked VMEM inputs.

The XLA path (ops.hamming.hamming_matrix_f32 + adds) stays the default off
TPU and under `interpret=True` in tests; `matmul_precision` is irrelevant
here (exact int8 arithmetic)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BITS = 256
TILE = 128


def _kernel(q_ref, k_ref, qp_ref, kp_ref, out_ref):
    # (TILE, 256) int8 x (TILE, 256) int8 -> (TILE, TILE) int32 on the MXU
    dot = jax.lax.dot_general(
        q_ref[:], k_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    ham = (N_BITS - dot).astype(jnp.float32) * 0.5
    out_ref[:] = ham + qp_ref[:] + kp_ref[:].reshape(1, TILE)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_penalty_matrix(
    q_desc: jnp.ndarray,   # (M, 256) int8 signed descriptors
    kp_desc: jnp.ndarray,  # (N, 256) int8
    q_pen: jnp.ndarray,    # (M,) f32 additive row penalties (e.g. validity)
    kp_pen: jnp.ndarray,   # (N,) f32 additive column penalties
    interpret: bool = False,
) -> jnp.ndarray:
    """(M, N) f32: Hamming(q, k) + q_pen[:, None] + kp_pen[None, :].

    M and N must be multiples of 128 (the framework's capacities are)."""
    M, N = q_desc.shape[0], kp_desc.shape[0]
    assert M % TILE == 0 and N % TILE == 0, (M, N)
    grid = (M // TILE, N // TILE)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, N_BITS), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, N_BITS), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 1), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q_desc, kp_desc, q_pen[:, None], kp_pen[:, None])
