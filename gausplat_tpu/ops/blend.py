"""Vectorized alpha-blend batch math, shared by the Pallas rasterizer and
the XLA fallback.

Parity targets:
- forward blend loop: .../jit/kernel/rasterize/kernel.wgsl:107-200
- backward blend loop: .../jit/kernel/rasterize_backward/kernel.wgsl:124-273

TPU-native reformulation. The reference blends points *sequentially* per
pixel with data-dependent early exits (divergent control flow — natural on a
GPU SIMT core, hostile on a TPU VPU). Here a whole batch of ``B`` points is
blended at once against a tile's 256 pixels:

- transmittance is an **exclusive masked cumulative product** of ``1 - a``
  along the point axis;
- the reference's "stop before transmittance drops below the floor" rule is
  the *first crossing* of the candidate transmittance below
  ``TRANSMITTANCE_MIN``; points at/after the first crossing are masked via a
  cumulative product of the not-crossed indicator (sticky across batches via
  a ``done`` flag);
- the backward pass runs in *forward* order (no reverse traversal): the
  "color behind point n" term is recovered as
  ``<g, C_final> - <g, prefix_n>`` using one cumulative sum, where
  ``C_final`` is the forward image (saved as a residual).

All arrays here are laid out ``[B points (sublanes), N pixels (lanes)]`` with
per-point data as ``[B, 1]`` columns and per-pixel data as ``[1, N]`` rows,
matching the TPU register layout (8 x 128 VPU).

Gradient convention: the conic cotangent is w.r.t. the (xx, xy, yy) triple
as used in ``density = exp(-0.5 (cxx dx^2 + 2 cxy dx dy + cyy dy^2))``, i.e.
the xy component is **twice** the reference's stored half-gradient
(rasterize_backward/kernel.wgsl:249-251) — the reference contracts it with a
symmetric matrix that double-counts the off-diagonal, so the final parameter
gradients are identical.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import OPACITY_2D_MAX, OPACITY_2D_MIN, TRANSMITTANCE_MIN


class EntryBlock(NamedTuple):
    """A batch of B point entries, broadcast-ready ([B, 1] columns)."""

    color: jax.Array  # [B, 3]
    conic_xx: jax.Array  # [B, 1]
    conic_xy: jax.Array  # [B, 1]
    conic_yy: jax.Array  # [B, 1]
    opacity: jax.Array  # [B, 1] outer (post-sigmoid) opacity
    pos_x: jax.Array  # [B, 1]
    pos_y: jax.Array  # [B, 1]

    @classmethod
    def from_rows(cls, rows: jax.Array) -> "EntryBlock":
        """From a packed [B, >=9] block with the canonical column order
        (r, g, b, cxx, cxy, cyy, opacity, px, py)."""
        return cls(
            color=rows[:, 0:3],
            conic_xx=rows[:, 3:4],
            conic_xy=rows[:, 4:5],
            conic_yy=rows[:, 5:6],
            opacity=rows[:, 6:7],
            pos_x=rows[:, 7:8],
            pos_y=rows[:, 8:9],
        )


#: Canonical packed-entry column order used across the rasterizer.
ENTRY_COLUMNS = 9

#: Row counts of the two on-HBM entry layouts (see ``entries_from_rows``).
ENTRY_ROWS_F32 = 9
ENTRY_ROWS_PACKED = 6


# --- bf16-pair packing ----------------------------------------------------------
#
# The packed entry layout halves the HBM volume of the rasterizer's dominant
# data movement (the per-entry gather, the kernel input DMA, the per-entry
# gradient rows and their reduction sort). Two bf16 values live in one int32
# word: the *high* 16 bits of an f32 are exactly its bf16 truncation, so
# packing/unpacking is pure integer masking — no bf16 dtype, Mosaic-friendly.
# Positions stay f32 (sub-pixel precision at 4K needs the full mantissa;
# bf16 would quantize pixel coordinates to ~8 px) — their words are plain
# f32 bit patterns. Enabled by RenderOptions(entry_dtype="bf16").

_HI_MASK = np.int32(-65536)  # 0xFFFF0000 (numpy literal: jnp
# constants at module scope would be captured by Pallas kernels)


def _bits(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(bits: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _round_bf16_bits(x: jax.Array) -> jax.Array:
    """f32 -> nearest-bf16 bit pattern in the high 16 bits (half-up tie)."""
    return jnp.bitwise_and(_bits(x) + np.int32(0x8000), _HI_MASK)


def pack_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two f32 arrays -> one int32 word array (a in high bits, b in low)."""
    return jnp.bitwise_or(
        _round_bf16_bits(a),
        jax.lax.shift_right_logical(_round_bf16_bits(b), 16),
    )


def unpack_hi(word: jax.Array) -> jax.Array:
    return _f32(jnp.bitwise_and(word, _HI_MASK))


def unpack_lo(word: jax.Array) -> jax.Array:
    return _f32(jax.lax.shift_left(word, 16))


def entries_from_rows(rows: jax.Array, packed: bool) -> EntryBlock:
    """Decode an entry block from its on-HBM row layout.

    - ``packed=False``: rows are f32 ``[9, B]`` in the canonical order.
    - ``packed=True``: rows are int32 ``[6, B]``:
      ``[r|g, b|opacity, cxx|cxy, cyy|unused, bits(px), bits(py)]``.
    """
    cols = rows.T
    if not packed:
        return EntryBlock.from_rows(cols)
    w = [cols[:, i : i + 1] for i in range(ENTRY_ROWS_PACKED)]
    return EntryBlock(
        color=jnp.concatenate(
            [unpack_hi(w[0]), unpack_lo(w[0]), unpack_hi(w[1])], axis=1
        ),
        conic_xx=unpack_hi(w[2]),
        conic_xy=unpack_lo(w[2]),
        conic_yy=unpack_hi(w[3]),
        opacity=unpack_lo(w[1]),
        pos_x=_f32(w[4]),
        pos_y=_f32(w[5]),
    )


def _shift_down(x: jax.Array, s: int, fill: float) -> jax.Array:
    """Shift rows down by ``s`` along axis 0, filling with ``fill``.

    Built from concat+slice (static shapes) so it lowers both in Mosaic
    (Pallas TPU) and plain XLA.
    """
    filler = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([filler, x[:-s]], axis=0)


def cumprod_points(x: jax.Array) -> jax.Array:
    """Inclusive cumulative product along axis 0 (points), log-steps."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = x * _shift_down(x, s, 1.0)
        s *= 2
    return x


def cumsum_points(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along axis 0 (points), log-steps."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = x + _shift_down(x, s, 0.0)
        s *= 2
    return x


#: exp2 density path (GAUSPLAT_EXP2=1): fold ``-0.5 * log2(e)`` into the
#: conic once per *entry* ([B, 1] ops) so the per-pair chain drops the
#: ``-0.5`` multiply and evaluates the VPU-native ``exp2`` directly instead
#: of ``exp`` (which lowers to exp2 plus a per-pair log2(e) multiply).
#: Bit-identical up to 1-2 ULP of the reference ``exp(-0.5 q)``
#: (rasterize/kernel.wgsl:163-172). Opt-in until the Mosaic lowering of
#: exp2 is verified on-chip.
import os as _os

EXP2_DENSITY = int(_os.environ.get("GAUSPLAT_EXP2", "0"))

#: MXU offload (GAUSPLAT_MXU, DEFAULT ON): evaluate the three inner pair
#: matmuls — forward color accumulation [3,B]x[B,N], backward <g, c_n>
#: [B,3]x[3,N], and d_color [B,N]x[N,3] — as lax.dot_general so Mosaic
#: places them on the (otherwise idle) MXU instead of the VPU, which is
#: the roofline wall at ~45% of peak (PERF.md). Exact contraction,
#: different summation order (ULP-level). On-chip A/B (round 4, after the
#: reduce rebuild): 154.4 -> 137.5 ms at precision=highest.
MXU_BLEND = int(_os.environ.get("GAUSPLAT_MXU", "1"))

#: Matmul precision for the MXU_BLEND dots. On TPU the DEFAULT dot precision
#: is single-pass bf16, which showed a 3.8e-3 max image deviation on-chip
#: (round-3 session: test_mxu_blend_matches_oracle failed on hardware while
#: passing in CPU interpret mode) — ~1/255, a visible quantum. "highest"
#: (multi-pass) restores f32-accurate contractions — and measured FASTER
#: than "default" in the full chain (137.5 vs 148.1 ms, round-4 A/B), so
#: it wins on both axes.
MXU_PRECISION = _os.environ.get("GAUSPLAT_MXU_PRECISION", "highest")


def _mxu_dot(a: jax.Array, b: jax.Array, dims) -> jax.Array:
    prec = (
        jax.lax.Precision.HIGHEST
        if MXU_PRECISION == "highest"
        else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), precision=prec,
        preferred_element_type=jnp.float32,
    )

#: Quadratic-form-as-matmul (GAUSPLAT_QUADM=1): the per-(entry, pixel)
#: density exponent ``s*(cxx dx^2 + 2 cxy dx dy + cyy dy^2)`` is bilinear in
#: a per-entry 6-vector and the per-pixel monomial basis
#: ``[1, px, py, px^2, px*py, py^2]`` — one [B, 6] x [6, N] dot_general on
#: the MXU replaces the ~9 per-pair VPU ops of the expanded quad (forward),
#: and the backward's six per-entry gradient row-reductions collapse to one
#: [B, N] x [N, 6] moment matmul plus [B, 1] combines (the reference
#: accumulates these per-thread at rasterize_backward/kernel.wgsl:236-269).
#: All coordinates are shifted to the window's first pixel (tile-local
#: frame), which bounds every monomial by O(tile + blendable radius) — the
#: conic scales as 1/sigma^2, so the expanded terms stay O(10) and the
#: classic expansion cancellation never materializes. The scaled exponent is
#: clamped to <= 0 (exact-math invariant of a PSD conic), replacing the
#: default path's ``density <= 1`` guard. Opt-in pending on-chip A/B.
QUAD_MATMUL = int(_os.environ.get("GAUSPLAT_QUADM", "0"))

#: Backward-only moment matmul (GAUSPLAT_QUADM_BWD=1): the backward's six
#: per-entry gradient row-reductions as ONE [B, N] x [N, 6] MXU dot, while
#: the forward density stays on the default VPU path. The combined QUADM
#: package lost its on-chip A/B (225.8 vs 204.6 in the round-3 session);
#: this probes whether the backward half alone wins now that MXU_BLEND is
#: the default and the grad reduce no longer dominates.
QUADM_BWD = int(_os.environ.get("GAUSPLAT_QUADM_BWD", "0"))

#: Matmul precision for the QUADM dots: "highest" (3-pass bf16 = full f32,
#: default — the A/B oracle tolerances need it) or "default" (single-pass
#: bf16, ~2x less MXU time; fine for training-loop gradients).
QUADM_PRECISION = _os.environ.get("GAUSPLAT_QUADM_PRECISION", "highest")

_NEG_HALF_LOG2E = np.float32(-0.5 * np.log2(np.e))


def _quadm_dot(a: jax.Array, b: jax.Array, dims) -> jax.Array:
    prec = (
        jax.lax.Precision.HIGHEST
        if QUADM_PRECISION == "highest"
        else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), precision=prec,
        preferred_element_type=jnp.float32,
    )


def _local_frame(entries: EntryBlock, pix_x: jax.Array, pix_y: jax.Array):
    """Shift pixel + entry coordinates to the window's first pixel."""
    x0, y0 = pix_x[:, :1], pix_y[:, :1]
    return (
        pix_x - x0, pix_y - y0,  # [1, N]
        entries.pos_x - x0, entries.pos_y - y0,  # [B, 1]
    )


def _pixel_monomials(px: jax.Array, py: jax.Array) -> jax.Array:
    """[6, N] basis (1, px, py, px^2, px*py, py^2) in the local frame."""
    return jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py], axis=0
    )


def density_terms(entries: EntryBlock, pix_x: jax.Array, pix_y: jax.Array):
    """Common density/alpha terms. ``pix_*``: [1, N]. Returns [B, N] arrays
    (dx, dy, density, alpha, blendable). Under QUAD_MATMUL the density comes
    from one MXU dot and dx/dy are not materialized (returned as None — the
    backward uses the moment-matmul path instead)."""
    f32 = jnp.float32
    if QUAD_MATMUL:
        px, py, xe, ye = _local_frame(entries, pix_x, pix_y)
        cxx, cxy, cyy = entries.conic_xx, entries.conic_xy, entries.conic_yy
        s = _NEG_HALF_LOG2E if EXP2_DENSITY else f32(-0.5)
        u = jnp.concatenate(
            [
                (cxx * xe * xe + f32(2.0) * cxy * (xe * ye) + cyy * ye * ye) * s,
                (cxx * xe + cxy * ye) * (f32(-2.0) * s),
                (cxy * xe + cyy * ye) * (f32(-2.0) * s),
                cxx * s,
                cxy * (f32(2.0) * s),
                cyy * s,
            ],
            axis=1,
        )  # [B, 6]: the per-entry quadratic-form coefficients, pre-scaled
        q = _quadm_dot(u, _pixel_monomials(px, py), ((1,), (0,)))  # [B, N]
        q = jnp.minimum(q, f32(0.0))  # PSD-conic invariant (s < 0)
        density = jnp.exp2(q) if EXP2_DENSITY else jnp.exp(q)
        alpha = jnp.minimum(entries.opacity * density, f32(OPACITY_2D_MAX))
        blendable = alpha >= f32(OPACITY_2D_MIN)
        return None, None, density, alpha, blendable
    dx = entries.pos_x - pix_x
    dy = entries.pos_y - pix_y
    if EXP2_DENSITY:
        s = _NEG_HALF_LOG2E
        cxx = entries.conic_xx * s  # [B, 1]: once per entry, not per pair
        cxy = entries.conic_xy * (f32(2.0) * s)
        cyy = entries.conic_yy * s
        quad2 = cxx * dx * dx + cxy * (dx * dy) + cyy * dy * dy
        density = jnp.exp2(quad2)
        # density <= 1  <=>  quad >= 0  <=>  quad2 <= 0 (s < 0), exactly.
        in_range = quad2 <= f32(0.0)
    else:
        quad = (
            entries.conic_xx * dx * dx
            + f32(2.0) * entries.conic_xy * dx * dy
            + entries.conic_yy * dy * dy
        )
        density = jnp.exp(f32(-0.5) * quad)
        in_range = density <= f32(1.0)
    alpha = jnp.minimum(entries.opacity * density, f32(OPACITY_2D_MAX))
    blendable = in_range & (alpha >= f32(OPACITY_2D_MIN))
    return dx, dy, density, alpha, blendable


class ForwardState(NamedTuple):
    """Per-pixel cross-batch carry ([1, N] rows)."""

    color: jax.Array  # [3, N] accumulated RGB
    transmittance: jax.Array  # [1, N]
    done: jax.Array  # [1, N] bool
    rendered_count: jax.Array  # [1, N] int32 (reference point_rendered_counts)

    @classmethod
    def initial(cls, n: int) -> "ForwardState":
        return cls(
            color=jnp.zeros((3, n), jnp.float32),
            transmittance=jnp.ones((1, n), jnp.float32),
            done=jnp.zeros((1, n), jnp.bool_),
            rendered_count=jnp.zeros((1, n), jnp.int32),
        )


def forward_batch(
    state: ForwardState,
    entries: EntryBlock,
    pix_x: jax.Array,
    pix_y: jax.Array,
    base_position: jax.Array,
    entry_mask: jax.Array | None = None,  # [B, 1] valid-lane mask
) -> ForwardState:
    """Blend one batch of B points into N pixels (front-to-back).

    ``base_position``: scalar int32, the position within the tile's segment
    of the batch's lane 0 (may be negative when the segment starts mid-batch
    — such lanes must be masked off via ``entry_mask``).
    """
    f32 = jnp.float32
    b_pts = entries.opacity.shape[0]

    _, _, _, alpha, blendable = density_terms(entries, pix_x, pix_y)
    if entry_mask is not None:
        blendable = blendable & entry_mask
    blendable = blendable & ~state.done

    one_minus = jnp.where(blendable, f32(1.0) - alpha, f32(1.0))
    prod_incl = cumprod_points(one_minus)
    candidate_t = state.transmittance * prod_incl

    # First crossing below the transmittance floor stops the pixel *before*
    # blending the crossing point (rasterize/kernel.wgsl:178-185). Exactly:
    # a not-done pixel always carries transmittance >= the floor (the
    # crossing point itself is never blended), and ``candidate_t`` is
    # non-increasing along the point axis (every factor <= 1), so "no
    # crossing at or before n" collapses to one comparison — no cumulative
    # product over the crossing indicator is needed.
    kept = candidate_t >= f32(TRANSMITTANCE_MIN)
    blended = blendable & kept
    crossed = blendable & ~kept

    prod_excl = _shift_down(prod_incl, 1, 1.0) if b_pts > 1 else jnp.ones_like(
        prod_incl
    )
    weight = jnp.where(blended, alpha * state.transmittance * prod_excl, f32(0.0))

    if MXU_BLEND:
        # color^T [3, B] x weight [B, N] on the MXU (K = B contraction).
        color = state.color + _mxu_dot(
            entries.color, weight, ((0,), (0,))
        )
    else:
        color = state.color + jnp.stack(
            [
                jnp.sum(weight * entries.color[:, c : c + 1], axis=0)
                for c in range(3)
            ]
        )
    # New transmittance = the candidate at the last kept position (its min
    # over kept rows, by monotonicity), or unchanged if nothing was kept —
    # replaces a third cumulative product with one sublane min-reduction.
    transmittance = jnp.min(
        jnp.where(kept, candidate_t, state.transmittance),
        axis=0,
        keepdims=True,
    )
    done = state.done | jnp.any(crossed, axis=0, keepdims=True)

    positions = base_position + jnp.arange(b_pts, dtype=jnp.int32)[:, None]
    rendered = jnp.max(
        jnp.where(blended, positions + 1, 0), axis=0, keepdims=True
    )
    rendered_count = jnp.maximum(state.rendered_count, rendered)

    return ForwardState(
        color=color,
        transmittance=transmittance,
        done=done,
        rendered_count=rendered_count,
    )


class BackwardState(NamedTuple):
    """Per-pixel cross-batch carry for the backward pass ([1, N] rows)."""

    transmittance: jax.Array  # [1, N] running t (forward replay)
    grad_prefix: jax.Array  # [1, N] <g, prefix color so far>

    @classmethod
    def initial(cls, n: int) -> "BackwardState":
        return cls(
            transmittance=jnp.ones((1, n), jnp.float32),
            grad_prefix=jnp.zeros((1, n), jnp.float32),
        )


class EntryGrads(NamedTuple):
    """Per-entry gradients for one batch ([B, ...])."""

    color: jax.Array  # [B, 3]
    conic: jax.Array  # [B, 3] (xx, xy, yy) — full xy cotangent (see module doc)
    opacity: jax.Array  # [B, 1] w.r.t. *outer* opacity
    pos_2d: jax.Array  # [B, 2]


def grads_to_rows(grads: EntryGrads, packed: bool) -> jax.Array:
    """Encode per-entry gradients into their on-HBM row layout.

    - ``packed=False``: f32 ``[9, B]`` canonical order.
    - ``packed=True``: int32 ``[6, B]``: color/conic/opacity pairs in bf16
      words, pos-2d grads as f32 bit patterns (mirrors the entry layout so
      one decoder serves both).
    """
    if not packed:
        return jnp.concatenate(
            [grads.color, grads.conic, grads.opacity, grads.pos_2d], axis=-1
        ).T
    c, k = grads.color, grads.conic
    rows = jnp.concatenate(
        [
            pack_pair(c[:, 0:1], c[:, 1:2]),
            pack_pair(c[:, 2:3], grads.opacity),
            pack_pair(k[:, 0:1], k[:, 1:2]),
            pack_pair(k[:, 2:3], jnp.zeros_like(k[:, 2:3])),
            _bits(grads.pos_2d[:, 0:1]),
            _bits(grads.pos_2d[:, 1:2]),
        ],
        axis=-1,
    )
    return rows.T


def grad_rows_to_components(rows: jax.Array, packed: bool) -> tuple:
    """On-HBM grad rows [R, N] -> 9 f32 [N] arrays in the canonical order
    (r, g, b, cxx, cxy, cyy, opacity, px, py)."""
    if not packed:
        return tuple(rows[c] for c in range(ENTRY_COLUMNS))
    w = [rows[i] for i in range(ENTRY_ROWS_PACKED)]
    return (
        unpack_hi(w[0]), unpack_lo(w[0]), unpack_hi(w[1]),
        unpack_hi(w[2]), unpack_lo(w[2]), unpack_hi(w[3]),
        unpack_lo(w[1]), _f32(w[4]), _f32(w[5]),
    )


def backward_batch(
    state: BackwardState,
    entries: EntryBlock,
    pix_x: jax.Array,
    pix_y: jax.Array,
    base_position: jax.Array,
    grad_color: jax.Array,  # [3, N] upstream dL/d(pixel color)
    grad_dot_final: jax.Array,  # [1, N] <g, C_final> for the pixel
    rendered_count: jax.Array,  # [1, N] int32 from the forward pass
    entry_mask: jax.Array | None = None,  # [B, 1] valid-lane mask
) -> tuple[BackwardState, EntryGrads]:
    """Backward of :func:`forward_batch`, in forward traversal order."""
    f32 = jnp.float32
    b_pts = entries.opacity.shape[0]

    dx, dy, density, alpha, blendable = density_terms(entries, pix_x, pix_y)
    if entry_mask is not None:
        blendable = blendable & entry_mask
    positions = base_position + jnp.arange(b_pts, dtype=jnp.int32)[:, None]
    blended = blendable & (positions < rendered_count)

    one_minus = jnp.where(blended, f32(1.0) - alpha, f32(1.0))
    prod_incl = cumprod_points(one_minus)
    prod_excl = _shift_down(prod_incl, 1, 1.0) if b_pts > 1 else jnp.ones_like(
        prod_incl
    )
    t_n = state.transmittance * prod_excl  # [B, N] transmittance before n
    weight = jnp.where(blended, alpha * t_n, f32(0.0))

    # <g, c_n> per (point, pixel).
    if MXU_BLEND:
        g_dot_c = _mxu_dot(entries.color, grad_color, ((1,), (0,)))
    else:
        g_dot_c = sum(
            grad_color[c : c + 1, :] * entries.color[:, c : c + 1]
            for c in range(3)
        )
    grad_prefix_n = state.grad_prefix + cumsum_points(weight * g_dot_c)
    g_dot_behind = grad_dot_final - grad_prefix_n  # <g, S_n>

    # dL/d alpha'_n = t_n <g, c_n> - <g, S_n> / (1 - alpha_n)
    # (rasterize_backward/kernel.wgsl:197-221, reformulated; see module doc).
    d_alpha = jnp.where(
        blended, t_n * g_dot_c - g_dot_behind / one_minus, f32(0.0)
    )

    # Factored gradient reductions (exact up to float reassociation):
    # k = -density * d_density with d_density = opacity * d_alpha
    # (rasterize_backward/kernel.wgsl:236-246); the conic is constant per
    # entry, so d_pos = sum_pix k (C d) = C (sum_pix k d) — the per-pair
    # conic contraction moves outside the reduction as a [B, 1] combine,
    # and the exact 0.5 conic factors apply per entry. This cuts the
    # per-pair chain from ~34 ops to ~19 (PERF.md roofline: the grad
    # reductions were the largest backward block).
    t0 = density * d_alpha
    if QUAD_MATMUL or QUADM_BWD:
        # Moment matmul: every reduction below is a contraction of
        # k = -opacity * t0 with a monomial in dx = xe - px, dy = ye - py,
        # so the six per-pair reductions collapse to ONE [B, N] x [N, 6]
        # dot against the pixel-monomial basis plus per-entry combines
        # (dx, dy are never materialized).
        px, py, xe, ye = _local_frame(entries, pix_x, pix_y)
        m = _quadm_dot(t0, _pixel_monomials(px, py), ((1,), (1,)))  # [B, 6]
        d_opacity = m[:, 0:1]
        negop = -entries.opacity
        k0, k1, k2 = negop * m[:, 0:1], negop * m[:, 1:2], negop * m[:, 2:3]
        k3, k4, k5 = negop * m[:, 3:4], negop * m[:, 4:5], negop * m[:, 5:6]
        s_x = xe * k0 - k1  # sum k dx
        s_y = ye * k0 - k2
        d_conic = jnp.concatenate(
            [
                f32(0.5) * (xe * xe * k0 - f32(2.0) * xe * k1 + k3),
                xe * ye * k0 - xe * k2 - ye * k1 + k4,  # full xy cotangent
                f32(0.5) * (ye * ye * k0 - f32(2.0) * ye * k2 + k5),
            ],
            axis=-1,
        )  # [B, 3]
    else:
        d_opacity = jnp.sum(t0, axis=1, keepdims=True)  # [B, 1]
        k = t0 * (-entries.opacity)  # density_density_grad_n
        t1 = k * dx
        t2 = k * dy
        s_x = jnp.sum(t1, axis=1, keepdims=True)  # [B, 1] sum k dx
        s_y = jnp.sum(t2, axis=1, keepdims=True)
        d_conic = jnp.stack(
            [
                f32(0.5) * jnp.sum(t1 * dx, axis=1),
                jnp.sum(t1 * dy, axis=1),  # full xy cotangent
                f32(0.5) * jnp.sum(t2 * dy, axis=1),
            ],
            axis=-1,
        )  # [B, 3]
    d_pos = jnp.concatenate(
        [
            entries.conic_xx * s_x + entries.conic_xy * s_y,
            entries.conic_xy * s_x + entries.conic_yy * s_y,
        ],
        axis=-1,
    )  # [B, 2]

    if MXU_BLEND:
        # weight [B, N] x grad_color [3, N] contracted over pixels -> [B, 3]
        # on the MXU (the VPU is the wall; K = 256 keeps the array busy).
        d_color = _mxu_dot(weight, grad_color, ((1,), (1,)))
    else:
        d_color = jnp.stack(
            [
                jnp.sum(weight * grad_color[c : c + 1, :], axis=1)
                for c in range(3)
            ],
            axis=-1,
        )  # [B, 3]

    new_state = BackwardState(
        transmittance=state.transmittance * prod_incl[-1:],
        grad_prefix=state.grad_prefix
        + jnp.sum(weight * g_dot_c, axis=0, keepdims=True),
    )
    return new_state, EntryGrads(
        color=d_color, conic=d_conic, opacity=d_opacity, pos_2d=d_pos
    )
