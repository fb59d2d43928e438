"""Windowed triplane sampling — the framework's flagship Pallas kernel.

Why this exists: XLA's TPU gather is index-bound at ~14 ns/row regardless
of row width (measured; see scripts/profile_ablate.py), so the reference's
grid_sample-style triplane lookup (/root/reference/models/generator.py:
301-331) costs ~450 ms per render pass at the training operating point —
50x off HBM speed-of-light. This kernel removes the gather entirely:

1.  Points are blocked by (ray-tile x depth-slab). Rays through an 8x8
    pixel tile are nearly parallel and a slab of consecutive stratified
    depth samples spans <= SLAB/S of the in-box segment, so each block's
    projection onto each triplane is a provably small 2D footprint
    (~(tile_spread + slab_extent) texels per axis).
2.  An XLA prolog computes per-(block, plane) window origins + in-window
    texel coordinates.
3.  The kernel DMAs each block's three plane windows HBM -> VMEM at
    dynamic offsets, then evaluates the bilinear gather as dense MXU
    work: a row-selection one-hot matmul (P, WIN) @ (WIN, WIN*C), a
    lane-masked weighting on the VPU, and a constant channel-fold matmul
    (P, WIN*C) @ (WIN*C, C). No gather/scatter instruction anywhere.
4.  Points whose footprint exceeds the window (possible for the fine
    pass at depth discontinuities) are clamped in-kernel and then
    CORRECTED by a fixed-capacity XLA gather pass over just the
    overflowed points (jnp.nonzero with static size), so results are
    exact whenever overflow_count <= capacity (and the residual count is
    reported for monitoring).

Numerics match ops/triplane.sample_packed_triplane (bf16 tap weights,
f32 accumulation of the MXU partials, mean over 3 planes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_from_image_tpu.ops import triplane as triplane_ops

# Default block geometry: 8x8 rays x 4 depth samples -> P = 256 points.
TILE = 8
SLAB = 4
WIN = 48  # window COLS (x texels); WIN*C lanes is the matmul N dim
# Window ROWS. The row-selection one-hot matmul contracts over K = WIN_Y,
# which the MXU pads to 128 regardless — so a tall window is FREE on the
# MXU up to 128 rows (WIN_Y=112 and 128 measure identically). Depth
# motion lands on the row axis for two of the three planes, so tall
# windows absorb nearly all depth-slab footprint (at WIN_Y == WIN ~50%
# of blocks overflowed at the flagship 128^2/f=1.2 operating point; at
# 128, ZERO do — which lets the lax.cond'd overflow fixup skip entirely).
WIN_Y = 128
C = 32  # triplane channels


def plane_layout_for_dma(planes: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, C, R, R) -> (B, 3, R, R*C) bf16: row y holds the x-major
    interleaved texels so a window is a 2D slice with 128-aligned lane
    offsets (x0 multiple of 4 texels -> lane offset multiple of 128)."""
    b, three, c, r, _ = planes.shape
    assert three == 3 and c == C
    return planes.transpose(0, 1, 3, 4, 2).reshape(b, 3, r, r * c).astype(
        jnp.bfloat16)


def _project_texel(coords: jnp.ndarray, r: int):
    """Normalized [-1,1] coords (..., 3) -> per-plane texel (u=col, v=row)
    with border clamp (align_corners=True; ops/triplane.py:36-49)."""
    t = jnp.clip((coords + 1.0) * 0.5 * (r - 1), 0.0, r - 1.0)
    x, y, z = t[..., 0], t[..., 1], t[..., 2]
    u = jnp.stack((x, x, y), axis=0)  # cols per plane
    v = jnp.stack((y, z, z), axis=0)  # rows per plane
    return u, v


def prepare_blocks(coords: jnp.ndarray, r: int,
                   tile: int = TILE, slab: int = SLAB, win: int = WIN,
                   win_y: int = WIN_Y):
    """Blocks (B, H, W, S, 3) normalized coords for the kernel.

    Returns (u, v, origins, overflow):
      u, v: (B, NB, 3, P) f32 texel coords (plane-projected, clamped)
      origins: (B, NB, 3, 2) int32 (y0, x0) window origins (y0 % 8 == 0,
        x0 % 4 == 0, clipped to [0, r - win_y] / [0, r - win])
      overflow: (B, NB) bool — block contains a point whose 2x2 bilinear
        support exceeds its window (computed by reduction; the per-point
        flags are never materialized)
    """
    win_y = min(win_y, r)  # window cannot exceed the plane
    b, h, w, s, _ = coords.shape
    ht, wt, ks = h // tile, w // tile, s // slab
    nb = ht * wt * ks
    p = tile * tile * slab
    # (B, ht, tile, wt, tile, ks, slab, 3) -> (B, nb, p, 3)
    cb = coords.reshape(b, ht, tile, wt, tile, ks, slab, 3)
    cb = cb.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, nb, p, 3)

    cb32 = cb.astype(jnp.float32)
    u, v = _project_texel(cb32, r)  # (3, B, nb, p)
    u = u.transpose(1, 2, 0, 3)  # (B, nb, 3, p)
    v = v.transpose(1, 2, 0, 3)

    # Out-of-box points get ZERO density downstream (both here and in the
    # reference, models/generator.py:606-640: sigma *= (1 - oob)), so
    # their gathered features never matter. Exclude them from the window
    # placement and the overflow accounting: rays that miss the AABB
    # inherit the batch-global near/far (core/rays.py:141-146) and march
    # border-clamped across the whole plane, which would otherwise force
    # window overflow on ~a third of all blocks.
    valid = jnp.all(jnp.abs(cb32) <= 1.0, axis=-1)[:, :, None, :]
    any_valid = jnp.any(valid, axis=-1)  # (B, nb, 1) -> broadcast over 3
    vmin = jnp.min(jnp.where(valid, v, jnp.inf), axis=-1)
    umin = jnp.min(jnp.where(valid, u, jnp.inf), axis=-1)
    vmax = jnp.max(jnp.where(valid, v, -jnp.inf), axis=-1)
    umax = jnp.max(jnp.where(valid, u, -jnp.inf), axis=-1)
    vmin = jnp.where(any_valid, vmin, 0.0)
    umin = jnp.where(any_valid, umin, 0.0)
    vmax = jnp.where(any_valid, vmax, 0.0)
    umax = jnp.where(any_valid, umax, 0.0)

    def origin(minval, align, w_ext):
        o = jnp.floor(minval).astype(jnp.int32)
        o = o - (o % align)
        return jnp.clip(o, 0, r - w_ext)

    y0 = origin(vmin, 8, win_y)  # (B, nb, 3)
    x0 = origin(umin, 4, win)
    origins = jnp.stack((y0, x0), axis=-1)

    # Origins are floor-aligned below the block minimum, so only the max
    # side can overflow. The test is TAP-aware: the second bilinear tap
    # clamps to the plane border (floor(v)+1 capped at r-1), so a window
    # whose last row IS the plane's last row handles border points
    # exactly — without this, every block touching row/col r-1 would be
    # falsely flagged (~28% of blocks: each hitting ray's first/last
    # sample lies ON an AABB face).
    vtap = jnp.minimum(jnp.floor(vmax) + 1.0, r - 1.0)
    utap = jnp.minimum(jnp.floor(umax) + 1.0, r - 1.0)
    ov = ((vtap > y0.astype(v.dtype) + (win_y - 1)) |
          (utap > x0.astype(u.dtype) + (win - 1)))
    overflow = jnp.any(ov, axis=-1)  # (B, NB)
    return u, v, origins, overflow


def _fold_matrix(win: int) -> np.ndarray:
    """(win*C, C) constant: fold[j, c] = 1 if j % C == c."""
    j = np.arange(win * C)
    f = np.zeros((win * C, C), np.float32)
    f[j, j % C] = 1.0
    return f


def _fold128_matrix() -> np.ndarray:
    """(128, C) constant folding one 128-lane tile's 4 x-groups."""
    j = np.arange(128)
    f = np.zeros((128, C), np.float32)
    f[j, j % C] = 1.0
    return f


def _fold_gm(gm_sum: jnp.ndarray, fold128, win: int, p: int) -> jnp.ndarray:
    """(P, win*C) f32 -> (P, C): sum the win//4 128-lane tiles on the VPU
    (static lane slices), then fold the 4 x-groups inside a tile with one
    tiny (P, 128) @ (128, C) matmul. Replaces the (P, win*C) @ (win*C, C)
    fold whose N=32 wasted 3/4 of the MXU lanes."""
    ntiles = (win * C) // 128
    # Balanced pairwise tree: log2(ntiles) dependent VPU adds instead of
    # a serial chain of ntiles-1.
    parts = [gm_sum[:, t * 128:(t + 1) * 128] for t in range(ntiles)]
    while len(parts) > 1:
        nxt = [parts[j] + parts[j + 1] for j in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    s = parts[0]
    return jax.lax.dot_general(
        s.astype(jnp.bfloat16), fold128,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _plane_taps(org_smem, u_ref, v_ref, pl_idx, rows_f, lane_xf,
                win: int, win_y: int):
    """Hat-function bilinear tap weights for one plane.

    oh_y[p, y] = max(0, 1 - |y - vv[p]|)  (bf16, the matmul LHS)
    m[p, l]    = max(0, 1 - |l//C - uu[p]|)  (f32 lane mask)

    Identical values to the one-hot formulation ((y==fy)(1-ty) +
    (y==fy+1)ty) at a fraction of the VPU ops, and no floor/int work.
    """
    vv = v_ref[0, pl_idx, :] - org_smem[0, pl_idx, 0].astype(jnp.float32)
    uu = u_ref[0, pl_idx, :] - org_smem[0, pl_idx, 1].astype(jnp.float32)
    vv = jnp.clip(vv, 0.0, win_y - 1.0)
    uu = jnp.clip(uu, 0.0, win - 1.0)
    oh_y = jnp.maximum(1.0 - jnp.abs(rows_f - vv[:, None]),
                       0.0).astype(jnp.bfloat16)
    m = jnp.maximum(1.0 - jnp.abs(lane_xf - uu[:, None]), 0.0)
    return oh_y, m


def _start_window_dmas(planes_ref, org_ref, bi, win_scratch, sems, slot,
                       win: int, win_y: int):
    """Issues the 3 plane-window DMAs for the block whose (1, 3, 2) SMEM
    origin slice is `org_ref` into double-buffer `slot`. Origins are
    8-row / 4-texel aligned by construction (prepare_blocks);
    pl.multiple_of lets Mosaic prove tiled-slice divisibility for the
    dynamic HBM offsets."""
    copies = []
    for pl_idx in range(3):
        y0 = pl.multiple_of(org_ref[0, pl_idx, 0], 8)
        x0c = pl.multiple_of(org_ref[0, pl_idx, 1] * C, 128)
        dma = pltpu.make_async_copy(
            planes_ref.at[bi, pl_idx, pl.ds(y0, win_y),
                          pl.ds(x0c, win * C)],
            win_scratch.at[slot, pl_idx],
            sems.at[slot, pl_idx],
        )
        dma.start()
        copies.append(dma)
    return copies


def _resident_body(org_smem, u_ref, v_ref, planes_ref, fold_ref,
                   planes_vmem, sems, *, win: int, win_y: int, p: int,
                   nb: int, num_images: int):
    """Plane-resident block step: each image's full triplanes (3, R,
    R*C bf16, ~12.6 MB at R=256) are DMA'd into a double-buffered VMEM
    scratch once per image (amortized over its NB blocks, with the next
    image prefetched), and every block's window is a dynamic VMEM
    slice — no per-block DMA at all. Measured VMEM on the target chip is
    >=96 MB, so 2 x 12.6 MB + temps fit comfortably. Returns the (P, C)
    f32 mean-of-planes features."""
    i = pl.program_id(0)
    img = i // nb
    slot = jax.lax.rem(img, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(planes_ref.at[0], planes_vmem.at[0],
                              sems.at[0]).start()

    @pl.when(jax.lax.rem(i, nb) == 0)
    def _():
        nxt = img + 1

        @pl.when(nxt < num_images)
        def _():
            pltpu.make_async_copy(planes_ref.at[nxt],
                                  planes_vmem.at[jax.lax.rem(nxt, 2)],
                                  sems.at[jax.lax.rem(nxt, 2)]).start()

        pltpu.make_async_copy(planes_vmem.at[slot], planes_vmem.at[slot],
                              sems.at[slot]).wait()

    rows_f = jax.lax.broadcasted_iota(jnp.int32, (p, win_y),
                                      1).astype(jnp.float32)
    lane_xf = (jax.lax.broadcasted_iota(jnp.int32, (p, win * C), 1)
               // C).astype(jnp.float32)

    gm_sum = jnp.zeros((p, win * C), jnp.float32)
    for pl_idx in range(3):
        y0 = pl.multiple_of(org_smem[0, pl_idx, 0], 8)
        x0c = pl.multiple_of(org_smem[0, pl_idx, 1] * C, 128)
        window = planes_vmem[slot, pl_idx, pl.ds(y0, win_y),
                             pl.ds(x0c, win * C)]
        oh_y, m = _plane_taps(org_smem, u_ref, v_ref, pl_idx, rows_f,
                              lane_xf, win, win_y)
        g = jax.lax.dot_general(
            oh_y, window,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gm_sum = gm_sum + g * m

    return _fold_gm(gm_sum, fold_ref[:], win, p) / 3.0


def _resident_kernel(org_smem, u_ref, v_ref, planes_ref, fold_ref, out_ref,
                     planes_vmem, sems, *, win: int, win_y: int, p: int,
                     nb: int, num_images: int, r: int):
    """Plane-resident windowed bilinear; raw (P, C) feature output."""
    acc = _resident_body(org_smem, u_ref, v_ref, planes_ref, fold_ref,
                         planes_vmem, sems, win=win, win_y=win_y, p=p,
                         nb=nb, num_images=num_images)
    out_ref[0] = acc.astype(out_ref.dtype)


def _resident_kernel_fused(org_smem, u_ref, v_ref, planes_ref, fold_ref,
                           w0_ref, b0_ref, w1_ref, b1_ref, pal_ref,
                           out_ref, planes_vmem, sems, *, win: int,
                           win_y: int, p: int, nb: int, num_images: int,
                           r: int):
    """Plane-resident windowed bilinear + fused decoder tail; out (P, 4)."""
    acc = _resident_body(org_smem, u_ref, v_ref, planes_ref, fold_ref,
                         planes_vmem, sems, win=win, win_y=win_y, p=p,
                         nb=nb, num_images=num_images)
    out_ref[0] = _decode_tail(acc, w0_ref, b0_ref, w1_ref, b1_ref,
                              pal_ref).astype(out_ref.dtype)


def _resident_grad_kernel(org_smem, u_ref, v_ref, dout_ref, planes_ref,
                          foldt_ref, dplanes_ref, duv_ref, planes_vmem,
                          dgrad_vmem, sems, flush_sem, *, win: int,
                          win_y: int, p: int, nb: int, num_images: int,
                          r: int):
    """Backward of the resident windowed sampler.

    Per block: recomputes the selection weights from (u, v), forms
    d_window = oh_y^T @ (dGM * m) (K = P — full MXU efficiency), and
    accumulates it into a per-image f32 VMEM gradient buffer at the
    window's dynamic offset; the buffer flushes to HBM once per image.
    Also emits per-point du/dv for camera/pose gradients:
      dv = sum_j ((doh/dv @ win) * m * dGM)_j,
      du = sum_j ((oh @ win) * dm/du * dGM)_j.
    """
    i = pl.program_id(0)
    img = i // nb
    slot = jax.lax.rem(img, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(planes_ref.at[0], planes_vmem.at[0],
                              sems.at[0]).start()

    @pl.when(jax.lax.rem(i, nb) == 0)
    def _():
        nxt = img + 1

        @pl.when(nxt < num_images)
        def _():
            pltpu.make_async_copy(planes_ref.at[nxt],
                                  planes_vmem.at[jax.lax.rem(nxt, 2)],
                                  sems.at[jax.lax.rem(nxt, 2)]).start()

        pltpu.make_async_copy(planes_vmem.at[slot], planes_vmem.at[slot],
                              sems.at[slot]).wait()
        # Fresh image: zero the gradient accumulator.
        dgrad_vmem[...] = jnp.zeros_like(dgrad_vmem)

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (p, win_y), 1)
    lane_x = jax.lax.broadcasted_iota(jnp.int32, (p, win * C), 1) // C

    dacc = dout_ref[0].astype(jnp.float32) / 3.0  # (P, C)
    # dGM = dacc @ fold^T — broadcasts each channel grad across the
    # window's x groups.
    dgm = jax.lax.dot_general(
        dacc.astype(jnp.bfloat16), foldt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (P, win*C)

    for pl_idx in range(3):
        y0 = pl.multiple_of(org_smem[0, pl_idx, 0], 8)
        x0c = pl.multiple_of(org_smem[0, pl_idx, 1] * C, 128)
        window = planes_vmem[slot, pl_idx, pl.ds(y0, win_y),
                             pl.ds(x0c, win * C)]
        vv_raw = v_ref[0, pl_idx, :] - org_smem[0, pl_idx, 0].astype(
            jnp.float32)
        uu_raw = u_ref[0, pl_idx, :] - org_smem[0, pl_idx, 1].astype(
            jnp.float32)
        vv = jnp.clip(vv_raw, 0.0, win_y - 1.0)
        uu = jnp.clip(uu_raw, 0.0, win - 1.0)
        v_act = ((vv_raw > 0.0) &
                 (vv_raw < win_y - 1.0)).astype(jnp.float32)
        u_act = ((uu_raw > 0.0) & (uu_raw < win - 1.0)).astype(jnp.float32)
        fy = jnp.floor(vv)
        ty = (vv - fy)[:, None]
        fx = jnp.floor(uu)
        tx = (uu - fx)[:, None]
        fyi = fy.astype(jnp.int32)[:, None]
        fxi = fx.astype(jnp.int32)[:, None]

        is_y0 = rows_i == fyi
        is_y1 = rows_i == fyi + 1
        is_x0 = lane_x == fxi
        is_x1 = lane_x == fxi + 1
        oh_y = (is_y0 * (1.0 - ty) + is_y1 * ty).astype(jnp.bfloat16)
        m = is_x0 * (1.0 - tx) + is_x1 * tx

        dg = dgm * m  # (P, win*C)
        d_win = jax.lax.dot_general(
            oh_y, dg.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (win_y, win*C)
        cur = dgrad_vmem[pl_idx, pl.ds(y0, win_y), pl.ds(x0c, win * C)]
        dgrad_vmem[pl_idx, pl.ds(y0, win_y), pl.ds(x0c, win * C)] = (
            cur + d_win)

        # Coordinate gradients.
        g = jax.lax.dot_general(
            oh_y, window,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        doh = (is_y1.astype(jnp.float32) -
               is_y0.astype(jnp.float32)).astype(jnp.bfloat16)
        gv = jax.lax.dot_general(
            doh, window,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv = jnp.sum(gv * m * dgm, axis=-1) * v_act
        dm = is_x1.astype(jnp.float32) - is_x0.astype(jnp.float32)
        du = jnp.sum(g * dm * dgm, axis=-1) * u_act
        duv_ref[0, 0, pl_idx, :] = du.astype(duv_ref.dtype)
        duv_ref[0, 1, pl_idx, :] = dv.astype(duv_ref.dtype)

    # Flush the image's gradient at its last block.
    @pl.when(jax.lax.rem(i, nb) == nb - 1)
    def _():
        copy = pltpu.make_async_copy(dgrad_vmem, dplanes_ref.at[img],
                                     flush_sem)
        copy.start()
        copy.wait()


def windowed_grad(planes_dma, u, v, origins, dout, win: int = WIN,
                  win_y: int = WIN_Y, interpret=None):
    """Runs the backward kernel. Returns (dplanes_dma f32 (B,3,R,R*C),
    du (B,NB,3,P) f32, dv (B,NB,3,P) f32)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, _, r, _ = planes_dma.shape
    win_y = min(win_y, r)
    nb, p = u.shape[1], u.shape[3]
    num_blocks = b * nb
    foldt = jnp.asarray(_fold_matrix(win).T, jnp.bfloat16)  # (C, win*C)
    org_flat = origins.reshape(num_blocks, 3, 2)

    kernel = functools.partial(_resident_grad_kernel, win=win, win_y=win_y,
                               p=p, nb=nb, num_images=b, r=r)
    dplanes, duv = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 3, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # dplanes (HBM, flushed)
            pl.BlockSpec((1, 2, 3, p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 3, r, r * C), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, 2, 3, p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, r, r * C), jnp.bfloat16),
            pltpu.VMEM((3, r, r * C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            has_side_effects=True),
        interpret=interpret,
    )(org_flat,
      u.astype(jnp.float32).reshape(num_blocks, 3, p),
      v.astype(jnp.float32).reshape(num_blocks, 3, p),
      dout.reshape(num_blocks, p, C), planes_dma, foldt)
    du = duv[:, 0].reshape(b, nb, 3, p)
    dv = duv[:, 1].reshape(b, nb, 3, p)
    return dplanes, du, dv


def _resident_grad_planes_kernel(org_smem, u_ref, v_ref, dout_ref,
                                 dplanes_ref, dgrad_vmem, flush_sem, *,
                                 win: int, win_y: int, p: int, nb: int,
                                 num_images: int, r: int):
    """Planes-only backward: `_resident_grad_kernel` without the du/dv
    outputs. For callers whose sample coordinates carry no gradient
    (the GAN train steps — poses are data and the fine-pass depths are
    stop-gradient'd), the two coordinate-gradient matmuls (g, gv) are
    2/3 of the per-plane backward MXU work — dropping them takes the
    backward kernel from ~3.7x to ~1.3x the forward's stream cost.

    Note: the PLANES themselves are never read — d_window depends only
    on the selection weights (recomputed from u/v with the same
    hat-function taps as the forward) and the incoming cotangent, so
    this kernel takes no plane input at all (the forward's plane tensor
    can die before the backward runs)."""
    i = pl.program_id(0)
    img = i // nb

    @pl.when(jax.lax.rem(i, nb) == 0)
    def _():
        dgrad_vmem[...] = jnp.zeros_like(dgrad_vmem)

    rows_f = jax.lax.broadcasted_iota(jnp.int32, (p, win_y),
                                      1).astype(jnp.float32)
    lane_xf = (jax.lax.broadcasted_iota(jnp.int32, (p, win * C), 1)
               // C).astype(jnp.float32)

    dacc = dout_ref[0].astype(jnp.float32) / 3.0  # (P, C)
    # dGM[p, l] = dacc[p, l % C]: a lane-tile repeat (C divides 128),
    # not a matmul.
    dgm = pltpu.repeat(dacc, win, axis=1)  # (P, win*C)

    for pl_idx in range(3):
        y0 = pl.multiple_of(org_smem[0, pl_idx, 0], 8)
        x0c = pl.multiple_of(org_smem[0, pl_idx, 1] * C, 128)
        oh_y, m = _plane_taps(org_smem, u_ref, v_ref, pl_idx, rows_f,
                              lane_xf, win, win_y)
        dg = dgm * m  # (P, win*C)
        d_win = jax.lax.dot_general(
            oh_y, dg.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (win_y, win*C)
        cur = dgrad_vmem[pl_idx, pl.ds(y0, win_y), pl.ds(x0c, win * C)]
        dgrad_vmem[pl_idx, pl.ds(y0, win_y), pl.ds(x0c, win * C)] = (
            cur + d_win)

    @pl.when(jax.lax.rem(i, nb) == nb - 1)
    def _():
        copy = pltpu.make_async_copy(dgrad_vmem, dplanes_ref.at[img],
                                     flush_sem)
        copy.start()
        copy.wait()


def windowed_grad_planes(plane_shape, u, v, origins, dout, win: int = WIN,
                         win_y: int = WIN_Y, interpret=None):
    """Planes-only backward. plane_shape: the (B, 3, R, R*C) shape of the
    DMA plane layout (the tensor itself is NOT needed). Returns
    dplanes_dma f32 of that shape."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, _, r, _ = plane_shape
    win_y = min(win_y, r)
    nb, p = u.shape[1], u.shape[3]
    num_blocks = b * nb
    org_flat = origins.reshape(num_blocks, 3, 2)

    kernel = functools.partial(_resident_grad_planes_kernel, win=win,
                               win_y=win_y, p=p, nb=nb, num_images=b, r=r)
    dplanes = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 3, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, 3, r, r * C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, r, r * C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            has_side_effects=True),
        interpret=interpret,
    )(org_flat,
      u.astype(jnp.float32).reshape(num_blocks, 3, p),
      v.astype(jnp.float32).reshape(num_blocks, 3, p),
      dout.reshape(num_blocks, p, C))
    return dplanes


def _decode_tail(acc, w0_ref, b0_ref, w1_ref, b1_ref, pal_ref):
    """Fused decoder tail: 2-layer softplus MLP + attention softmax +
    palette matmul (models/generator.py TriplanarDecoder.mlp + the
    attention-values color mapping). acc: (P, C) f32 features.
    Returns (P, 4) f32: [sdf_distance | rgb]."""
    h = jax.lax.dot_general(
        acc.astype(jnp.bfloat16), w0_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b0_ref[:]
    h = jax.nn.softplus(h)
    d = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:]
    dist = d[:, :1]
    logits = d[:, 1:]
    probs = jax.nn.softmax(logits, axis=-1)
    rgb = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), pal_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.concatenate((dist, rgb), axis=-1)


def _window_kernel_fused(org_smem, org_next_smem, u_ref, v_ref, planes_ref,
                         fold_ref, w0_ref, b0_ref, w1_ref, b1_ref, pal_ref,
                         out_ref, win_scratch, sems, *, win: int,
                         win_y: int, p: int, nb: int, num_blocks: int):
    """Windowed bilinear + fused decoder tail; out (P, 4)."""
    acc = _window_body(org_smem, org_next_smem, u_ref, v_ref, planes_ref,
                       fold_ref, win_scratch, sems, win=win, win_y=win_y,
                       p=p, nb=nb, num_blocks=num_blocks)
    out_ref[0] = _decode_tail(acc, w0_ref, b0_ref, w1_ref, b1_ref,
                              pal_ref).astype(out_ref.dtype)


def _window_body(org_smem, org_next_smem, u_ref, v_ref, planes_ref,
                 fold_ref, win_scratch, sems, *, win: int, win_y: int,
                 p: int, nb: int, num_blocks: int):
    """One flat block step, double-buffered: block i+1's windows prefetch
    while block i computes (DMA latency was the dominant cost when issued
    and awaited in the same step)."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        _start_window_dmas(planes_ref, org_smem, i // nb, win_scratch,
                           sems, slot, win, win_y)

    @pl.when(i + 1 < num_blocks)
    def _():
        _start_window_dmas(planes_ref, org_next_smem, (i + 1) // nb,
                           win_scratch, sems, next_slot, win, win_y)

    rows_f = jax.lax.broadcasted_iota(jnp.int32, (p, win_y),
                                      1).astype(jnp.float32)
    lane_xf = (jax.lax.broadcasted_iota(jnp.int32, (p, win * C), 1)
               // C).astype(jnp.float32)

    # Sum the x-masked row mixes over the 3 planes FIRST, then fold the
    # channel groups once at the end.
    gm_sum = jnp.zeros((p, win * C), jnp.float32)
    for pl_idx in range(3):
        pltpu.make_async_copy(win_scratch.at[slot, pl_idx],
                              win_scratch.at[slot, pl_idx],
                              sems.at[slot, pl_idx]).wait()
        oh_y, m = _plane_taps(org_smem, u_ref, v_ref, pl_idx, rows_f,
                              lane_xf, win, win_y)
        g = jax.lax.dot_general(
            oh_y, win_scratch[slot, pl_idx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (p, win*C)
        gm_sum = gm_sum + g * m

    acc = _fold_gm(gm_sum, fold_ref[:], win, p)
    return acc / 3.0


def _window_kernel(org_smem, org_next_smem, u_ref, v_ref, planes_ref,
                   fold_ref, out_ref, win_scratch, sems, *, win: int,
                   win_y: int, p: int, nb: int, num_blocks: int):
    """Windowed bilinear, raw (P, C) feature output."""
    acc = _window_body(org_smem, org_next_smem, u_ref, v_ref, planes_ref,
                       fold_ref, win_scratch, sems, win=win, win_y=win_y,
                       p=p, nb=nb, num_blocks=num_blocks)
    out_ref[0] = acc.astype(out_ref.dtype)


def sample_windowed_raw(planes_dma: jnp.ndarray, u, v, origins,
                        win: int = WIN, win_y: int = WIN_Y,
                        interpret=None, decode=None):
    """Runs the kernel. planes_dma: (B, 3, R, R*C) bf16;
    u/v: (B, NB, 3, P); origins: (B, NB, 3, 2).

    Without `decode`: returns raw gathered features (B, NB, P, C).
    With `decode` = dict(w0 (C, H), b0 (H,), w1 (H, 1+K), b1 (1+K,),
    palette (B, K, 3)): the decoder MLP + attention softmax + palette
    matmul run inside the kernel and the output is (B, NB, P, 4) =
    [sdf_distance | rgb] (saves the feature HBM round-trip + two
    bandwidth-bound XLA stages).

    interpret=None auto-selects the Pallas interpreter on non-TPU
    backends (so the same code path runs in CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, _, r, _ = planes_dma.shape
    win_y = min(win_y, r)
    nb, p = u.shape[1], u.shape[3]
    num_blocks = b * nb
    fold = jnp.asarray(_fold128_matrix(), jnp.bfloat16)

    # Plane-resident variant when a double-buffered pair of full plane
    # sets fits VMEM (measured >=96 MB on the target chip).
    plane_bytes = 3 * r * r * C * 2
    if 2 * plane_bytes <= 48 * 1024 * 1024:
        if decode is None:
            kernel = functools.partial(_resident_kernel, win=win,
                                       win_y=win_y, p=p, nb=nb,
                                       num_images=b, r=r)
            out_ch = C
            extra_inputs = ()
            extra_specs = ()
        else:
            kernel = functools.partial(_resident_kernel_fused, win=win,
                                       win_y=win_y, p=p, nb=nb,
                                       num_images=b, r=r)
            out_ch = 4
            extra_inputs = (decode['w0'].astype(jnp.bfloat16),
                            decode['b0'].astype(jnp.float32),
                            decode['w1'].astype(jnp.bfloat16),
                            decode['b1'].astype(jnp.float32),
                            decode['palette'].astype(jnp.bfloat16))
            extra_specs = (
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + decode['palette'].shape[1:],
                             lambda i: (i // nb, 0, 0),
                             memory_space=pltpu.VMEM),
            )
        org_flat = origins.reshape(num_blocks, 3, 2)
        out = pl.pallas_call(
            kernel,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((1, 3, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3, p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # planes in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),  # fold matrix
                *extra_specs,
            ],
            out_specs=pl.BlockSpec((1, p, out_ch), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_blocks, p, out_ch),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, 3, r, r * C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(org_flat,
          u.astype(jnp.float32).reshape(num_blocks, 3, p),
          v.astype(jnp.float32).reshape(num_blocks, 3, p),
          planes_dma, fold, *extra_inputs)
        return out.reshape(b, nb, p, out_ch)

    if decode is None:
        kernel = functools.partial(_window_kernel, win=win, win_y=win_y,
                                   p=p, nb=nb, num_blocks=num_blocks)
        out_ch = C
        extra_inputs = ()
        extra_specs = ()
    else:
        kernel = functools.partial(_window_kernel_fused, win=win,
                                   win_y=win_y, p=p, nb=nb,
                                   num_blocks=num_blocks)
        out_ch = 4
        extra_inputs = (decode['w0'].astype(jnp.bfloat16),
                        decode['b0'].astype(jnp.float32),
                        decode['w1'].astype(jnp.bfloat16),
                        decode['b1'].astype(jnp.float32),
                        decode['palette'].astype(jnp.bfloat16))
        extra_specs = (
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + decode['palette'].shape[1:],
                         lambda i: (i // nb, 0, 0),
                         memory_space=pltpu.VMEM),
        )
    org_flat = origins.reshape(num_blocks, 3, 2)
    # Next-block origins, per-step SMEM slice (lets the kernel prefetch
    # block i+1's windows without holding the whole origin table in SMEM).
    org_next = jnp.concatenate((org_flat[1:], org_flat[-1:]), axis=0)
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 3, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # planes stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fold matrix
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((1, p, out_ch), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks, p, out_ch),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 3, win_y, win * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(org_flat, org_next,
      u.astype(jnp.float32).reshape(num_blocks, 3, p),
      v.astype(jnp.float32).reshape(num_blocks, 3, p),
      planes_dma, fold, *extra_inputs)
    return out.reshape(b, nb, p, out_ch)


@jax.custom_vjp
def windowed_core(planes_dma, u, v, origins):
    """Differentiable windowed sampler core (kernel forward + backward
    kernel as its VJP). origins are integral (non-differentiable)."""
    return sample_windowed_raw(planes_dma, u, v, origins)


def _windowed_core_fwd(planes_dma, u, v, origins):
    out = sample_windowed_raw(planes_dma, u, v, origins)
    return out, (planes_dma, u, v, origins)


def _windowed_core_bwd(res, dout):
    planes_dma, u, v, origins = res
    dplanes, du, dv = windowed_grad(planes_dma, u, v, origins, dout)
    zero_org = np.zeros(origins.shape, dtype=jax.dtypes.float0)
    return (dplanes.astype(planes_dma.dtype), du.astype(u.dtype),
            dv.astype(v.dtype), zero_org)


windowed_core.defvjp(_windowed_core_fwd, _windowed_core_bwd)


@functools.lru_cache(maxsize=None)
def _windowed_core_planes_for(plane_shape, plane_dtype_name):
    """custom_vjp instance specialized on the plane tensor's static
    shape/dtype: the backward never reads the planes, so keeping the
    statics in a closure (instead of saving the tensor as a residual)
    lets the forward's plane tensor die before the backward runs."""
    plane_dtype = jnp.dtype(plane_dtype_name)

    @jax.custom_vjp
    def core(planes_dma, u, v, origins):
        return sample_windowed_raw(planes_dma, u, v, origins)

    def fwd(planes_dma, u, v, origins):
        return sample_windowed_raw(planes_dma, u, v, origins), (u, v,
                                                                origins)

    def bwd(res, dout):
        u, v, origins = res
        dplanes = windowed_grad_planes(plane_shape, u, v, origins, dout)
        zero_org = np.zeros(origins.shape, dtype=jax.dtypes.float0)
        return (dplanes.astype(plane_dtype), jnp.zeros_like(u),
                jnp.zeros_like(v), zero_org)

    core.defvjp(fwd, bwd)
    return core


def windowed_core_planes(planes_dma, u, v, origins):
    """Like `windowed_core` but its VJP produces PLANE gradients only
    (du/dv are zero). For callers whose sample coordinates are
    stop-gradient'd — the GAN training steps — this skips the two
    coordinate-gradient matmuls that are 2/3 of the backward kernel's
    MXU work. Using it where coordinates DO need gradients silently
    zeroes them; `sample_triplane_windowed(coord_grads=...)` is the
    gated entry point."""
    core = _windowed_core_planes_for(tuple(planes_dma.shape),
                                     jnp.dtype(planes_dma.dtype).name)
    return core(planes_dma, u, v, origins)


def _unblock(x: jnp.ndarray, b, h, w, s, tile, slab):
    """(B, NB, P, C) -> (B, H*W*S, C) in renderer point order."""
    ht, wt, ks = h // tile, w // tile, s // slab
    c = x.shape[-1]
    x = x.reshape(b, ht, wt, ks, tile, tile, slab, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # (B, ht, tile, wt, tile, ks, slab, C)
    return x.reshape(b, h * w * s, c)


def unblock_points(x: jnp.ndarray, h: int, w: int, s: int,
                   tile: int = TILE, slab: int = SLAB) -> jnp.ndarray:
    """(B, NB*P, c) kernel-blocked point order -> (B, H*W*S, c) renderer
    order. Public counterpart of `_unblock` for callers that consume the
    sampler's output in blocked order (sample_triplane_windowed with
    unblock=False) and reorder only their small decoded outputs: the
    blocked->natural transpose on the (N, 32) feature tensor is a 4x-
    padded T(8,128) relayout on TPU (1 GB logical -> 4 GB physical at
    batch 16), while on a 1..4-channel decoded tensor XLA lays the
    points axis minor and the same transpose is pad-free.

    tile/slab MUST match the values the sampler call used to block the
    points (sample_triplane_windowed's tile/slab arguments; both default
    to the same module constants). A mismatched pair whose product
    happens to agree reshapes cleanly but returns points in a silently
    wrong order — tests/test_triplane.py pins the default-geometry
    round trip against the unblock=True path."""
    b = x.shape[0]
    return _unblock(x.reshape(b, -1, tile * tile * slab, x.shape[-1]),
                    b, h, w, s, tile, slab)


def sample_triplane_windowed(
    planes: jnp.ndarray,
    planes_dma: jnp.ndarray,
    packed_planes: Optional[jnp.ndarray],
    coords: jnp.ndarray,
    overflow_capacity_frac: float = 1 / 64,
    tile: int = TILE,
    slab: int = SLAB,
    win: int = WIN,
    win_y: int = WIN_Y,
    interpret=None,
    decode=None,
    coord_grads: bool = True,
    unblock: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full windowed sampler with exact overflow correction.

    Args:
      planes: (B, 3, C, R, R) raw planes (used only to build the XLA
        fallback table when packed_planes is None).
      planes_dma: (B, 3, R, R*C) bf16 DMA layout (plane_layout_for_dma).
      packed_planes: optional (B, 3*R*R, 4C) quad table for the exact
        correction path (built on the fly if None).
      coords: (B, H, W, S, 3) normalized [-1, 1] sample coordinates.
      overflow_capacity_frac: fixed correction capacity as a fraction of
        the total point count.
      coord_grads: set False ONLY when `coords` is stop-gradient'd
        upstream (GAN training: poses are data) — the backward then runs
        the planes-only grad kernel (~3x cheaper) and coordinate
        cotangents are zero.
      unblock: when False, features are returned in the kernel's blocked
        point order (B, NB*P, C) — callers whose downstream is pointwise
        (the decoder MLP) should take this and reorder only their small
        decoded outputs via `unblock_points`, avoiding the 4x-padded
        (N, 32) relayout (see unblock_points).

    Returns:
      features (B, H*W*S, C) bf16 (blocked (B, NB*P, C) if
      unblock=False), overflow_resid (scalar int32: points that
      overflowed beyond the correction capacity; 0 => exact).
    """
    b, h, w, s, _ = coords.shape
    r = planes_dma.shape[2]
    if not coord_grads:
        coords = jax.lax.stop_gradient(coords)
    u, v, origins, ov_any = prepare_blocks(coords, r, tile, slab, win,
                                           win_y)
    plane_bytes = 3 * r * r * C * 2
    if decode is None and win == WIN and win_y == WIN_Y and \
            2 * plane_bytes <= 48 * 1024 * 1024:
        # Differentiable core (resident kernel fwd + backward kernel as
        # VJP): gradients flow to the planes, and to the point
        # coordinates unless coord_grads=False.
        core = windowed_core if coord_grads else windowed_core_planes
        feats = core(planes_dma, u, v, origins)
    else:
        feats = sample_windowed_raw(planes_dma, u, v, origins, win, win_y,
                                    interpret=interpret,
                                    decode=decode)  # (B, NB, P, C or 4)

    # Exact fix-up of overflowed points through the XLA quad-table path,
    # selected at BLOCK granularity: nonzero over the (B*NB) block flags
    # is ~100x cheaper than point-granular selection over B*N, and
    # overflow is spatially clustered (silhouette blocks) anyway.
    # The whole correction runs under lax.cond: batches with NO
    # overflowing block (the common case at WIN_Y=128 — benign cameras)
    # skip its ~20 ms/pass of index-bound gathers at runtime while
    # keeping the exact path compiled in for the silhouette/fine-pass
    # geometries that need it.
    nb, p = feats.shape[1], feats.shape[2]
    flat_ov = ov_any.reshape(-1)  # (B*NB,)
    cap_b = max(int(b * nb * overflow_capacity_frac), 4)

    feats = jax.lax.cond(
        jnp.any(flat_ov),
        lambda f: _overflow_fixup(f, flat_ov, cap_b, coords, planes_dma,
                                  packed_planes, decode, b, nb, p, h, w, s,
                                  r, tile, slab),
        lambda f: f,
        feats)

    if unblock:
        feats = _unblock(feats, b, h, w, s, tile, slab)
    else:
        feats = feats.reshape(b, nb * p, feats.shape[-1])
    resid = jnp.maximum(jnp.sum(flat_ov.astype(jnp.int32)) - cap_b, 0)
    return feats, resid


def _overflow_fixup(feats, flat_ov, cap_b, coords, planes_dma,
                    packed_planes, decode, b, nb, p, h, w, s, r, tile,
                    slab):
    """Exact correction of overflowed blocks (see sample_triplane_windowed).
    feats: (B, NB, P, out_ch) kernel output; returns same shape."""
    # Filler entries (when fewer than cap_b blocks overflow) get the
    # out-of-range id b*nb so the final scatter drops them; all gathers
    # below use the clamped `sel_c` to stay in range. A fill of 0 would
    # scatter duplicate index 0, and the scatter-set VJP would then
    # gather block 0's cotangent once per filler — inflating its
    # feature/plane gradient whenever the fixup path is live.
    sel, = jnp.nonzero(flat_ov, size=cap_b, fill_value=b * nb)  # block ids
    sel_c = jnp.minimum(sel, b * nb - 1)
    bi = (sel_c // nb).astype(jnp.int32)
    # Re-block the coords identically to prepare_blocks and gather the
    # selected blocks' points. (Gathering rows of the already-blocked
    # u/v instead looks cheaper but measured 26 ms SLOWER in the full
    # render graph: it forces XLA to materialize the 100 MB u/v
    # intermediates that otherwise fuse into the kernel call.)
    ht, wt, ks = h // tile, w // tile, s // slab
    cb = coords.reshape(b, ht, tile, wt, tile, ks, slab, 3)
    cb = cb.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b * nb, p, 3)
    pts = cb[sel_c].reshape(cap_b * p, 3)  # (cap_b*P, 3)

    uu, vv = _project_texel(pts.astype(jnp.float32), r)  # (3, cap_b*P)
    bi_pt = jnp.repeat(bi, p)
    good = 0.0
    if packed_planes is not None:
        # Quad-table path: one 128-lane row per point per plane.
        rr3 = packed_planes.shape[1]
        packed_flat = packed_planes.reshape(b * rr3,
                                            packed_planes.shape[-1])
        for p_idx in range(3):
            fx = jnp.floor(uu[p_idx])
            fy = jnp.floor(vv[p_idx])
            tx = (uu[p_idx] - fx)[:, None]
            ty = (vv[p_idx] - fy)[:, None]
            fxi = jnp.minimum(fx.astype(jnp.int32), r - 1)
            fyi = jnp.minimum(fy.astype(jnp.int32), r - 1)
            row = bi_pt * rr3 + p_idx * r * r + fyi * r + fxi
            quad = jnp.take(packed_flat, row, axis=0).reshape(
                cap_b * p, 4, C).astype(jnp.float32)
            wts = jnp.stack(((1 - tx) * (1 - ty), tx * (1 - ty),
                             (1 - tx) * ty, tx * ty), axis=1)
            good = good + jnp.sum(quad * wts, axis=1)
    else:
        # Packed-table-free path (saves the (B, 3RR, 4C) table — 6.4 GB
        # at the training operating point): 4 taps of 32 contiguous
        # lanes each, gathered from the DMA plane layout viewed as
        # (B*3*R*R, C) texel rows. Single-row `take` is the only gather
        # form on XLA:TPU's fast path — both multi-row gather slices
        # ((2, C) from this view) and lane-offset slices ((2, 2C) from a
        # (B*3*R, R*C) view) measured 10-16x slower end-to-end.
        texels = planes_dma.reshape(b * 3 * r * r, C)
        # All 12 taps (3 planes x 4 bilinear corners) through ONE take:
        # the forward gather cost is identical (same total rows), but the
        # backward becomes a single scatter-add into the dplanes table
        # instead of 12 — each scatter zero-initializes and updates the
        # full (B*3*R*R, C) f32 buffer, and 12 of them dominated the
        # whole training backward whenever the fixup cond was live
        # (~174 ms/pass at the flagship point).
        idx_all = []
        w_all = []
        for p_idx in range(3):
            fx = jnp.floor(uu[p_idx])
            fy = jnp.floor(vv[p_idx])
            tx = (uu[p_idx] - fx)[:, None]
            ty = (vv[p_idx] - fy)[:, None]
            x0i = fx.astype(jnp.int32)
            y0i = fy.astype(jnp.int32)
            base = (bi_pt * 3 + p_idx) * r * r
            for dy, dx, wsel in ((0, 0, (1 - tx) * (1 - ty)),
                                 (0, 1, tx * (1 - ty)),
                                 (1, 0, (1 - tx) * ty),
                                 (1, 1, tx * ty)):
                yi = jnp.minimum(y0i + dy, r - 1)
                xi = jnp.minimum(x0i + dx, r - 1)
                idx_all.append(base + yi * r + xi)
                w_all.append(wsel)
        idx = jnp.concatenate(idx_all)
        wts = jnp.concatenate(w_all)
        tex = jnp.take(texels, idx, axis=0).astype(jnp.float32) * wts
        good = jnp.sum(tex.reshape(12, cap_b * p, C), axis=0)
    good = (good / 3.0).reshape(cap_b, p, C)

    if decode is not None:
        # Apply the same fused decoder tail in XLA for the corrected
        # blocks (cap is small).
        hid = jax.nn.softplus(
            good.astype(jnp.float32) @ decode['w0'].astype(jnp.float32) +
            decode['b0'])
        d = hid @ decode['w1'].astype(jnp.float32) + decode['b1']
        probs = jax.nn.softmax(d[..., 1:], axis=-1)
        pal_sel = decode['palette'].astype(jnp.float32)[bi]  # (cap_b, K, 3)
        rgb = jnp.einsum('bpk,bkc->bpc', probs, pal_sel)
        good = jnp.concatenate((d[..., :1], rgb), axis=-1)

    out_ch = feats.shape[-1]
    feats_flat = feats.reshape(b * nb, p, out_ch)
    valid = flat_ov[sel_c]
    cur = feats_flat[sel_c]
    new = jnp.where(valid[:, None, None], good.astype(feats.dtype), cur)
    # mode='drop' discards filler rows (sel == b*nb) instead of writing
    # them; their updates also get zero cotangent in the VJP.
    return feats_flat.at[sel].set(
        new, mode='drop').reshape(b, nb, p, out_ch)
