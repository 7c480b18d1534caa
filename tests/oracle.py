"""Sequential NumPy oracle of the reference rasterizer semantics.

A direct, unvectorized re-statement of the per-pixel blend loops in
rasterize/kernel.wgsl:104-220 and rasterize_backward/kernel.wgsl:121-273,
used as the differential-test target for the vectorized TPU rasterizer.
"""

import numpy as np

OPACITY_2D_MAX = 252.0 / 255.0
OPACITY_2D_MIN = 1.0 / 255.0
TRANSMITTANCE_MIN = (1.0 - OPACITY_2D_MAX) ** 2
TILE = 16


def rasterize_forward(
    point_data: np.ndarray,  # [P, 9] (r, g, b, cxx, cxy, cyy, op_outer, px, py)
    sorted_point_indices: np.ndarray,  # [K] entries, sorted by (tile, depth)
    tile_ranges: np.ndarray,  # [num_tiles, 2]
    image_width: int,
    image_height: int,
    tile_count_x: int,
):
    f = np.float32
    image = np.zeros((image_height, image_width, 3), f)
    transmittances = np.ones((image_height, image_width), f)
    counts = np.zeros((image_height, image_width), np.int32)

    num_tiles = tile_ranges.shape[0]
    for tile in range(num_tiles):
        start, end = int(tile_ranges[tile, 0]), int(tile_ranges[tile, 1])
        if end <= start:
            continue
        tx, ty = tile % tile_count_x, tile // tile_count_x
        for ly in range(TILE):
            for lx in range(TILE):
                x, y = tx * TILE + lx, ty * TILE + ly
                if x >= image_width or y >= image_height:
                    continue
                color = np.zeros(3, f)
                t_state = f(1.0)
                rendered = 0
                state = 0
                for e in range(start, end):
                    state += 1
                    pi = int(sorted_point_indices[e])
                    r, g, b, cxx, cxy, cyy, op, px, py = point_data[pi].astype(f)
                    dx, dy = f(px - x), f(py - y)
                    density = np.exp(
                        f(-0.5) * (cxx * dx * dx + 2 * cxy * dx * dy + cyy * dy * dy)
                    ).astype(f)
                    if density > 1.0:
                        continue
                    alpha = min(op * density, f(OPACITY_2D_MAX))
                    if alpha < OPACITY_2D_MIN:
                        continue
                    t_next = f(t_state * (1.0 - alpha))
                    if t_next < TRANSMITTANCE_MIN:
                        break
                    color += np.array([r, g, b], f) * alpha * t_state
                    rendered = state
                    t_state = t_next
                image[y, x] = color
                transmittances[y, x] = t_state
                counts[y, x] = rendered
    return image, transmittances, counts


def rasterize_backward(
    point_data: np.ndarray,
    sorted_point_indices: np.ndarray,
    tile_ranges: np.ndarray,
    grad_image: np.ndarray,  # [H, W, 3]
    counts: np.ndarray,  # [H, W] from forward
    transmittances: np.ndarray,  # [H, W] from forward
    image_width: int,
    image_height: int,
    tile_count_x: int,
):
    """Per-point gradients (d_color [P,3], d_conic_triple [P,3] with FULL xy
    cotangent, d_opacity_outer [P,1], d_pos2d [P,2]), reference back-to-front
    traversal."""
    f = np.float32
    p = point_data.shape[0]
    d_color = np.zeros((p, 3), f)
    d_conic = np.zeros((p, 3), f)
    d_op = np.zeros((p, 1), f)
    d_pos = np.zeros((p, 2), f)

    num_tiles = tile_ranges.shape[0]
    for tile in range(num_tiles):
        start, end = int(tile_ranges[tile, 0]), int(tile_ranges[tile, 1])
        if end <= start:
            continue
        tx, ty = tile % tile_count_x, tile // tile_count_x
        for ly in range(TILE):
            for lx in range(TILE):
                x, y = tx * TILE + lx, ty * TILE + ly
                if x >= image_width or y >= image_height:
                    continue
                g = grad_image[y, x].astype(f)
                rendered = int(counts[y, x])
                t_state = f(transmittances[y, x])
                c2d_state = np.zeros(3, f)  # composited color behind
                c3d_state = np.zeros(3, f)
                a2d_state = f(0.0)
                state = end - start
                for e in range(end - 1, start - 1, -1):
                    if state > rendered:
                        state -= 1
                        continue
                    pi = int(sorted_point_indices[e])
                    r, gg, b, cxx, cxy, cyy, op, px, py = point_data[pi].astype(f)
                    dx, dy = f(px - x), f(py - y)
                    density = np.exp(
                        f(-0.5) * (cxx * dx * dx + 2 * cxy * dx * dy + cyy * dy * dy)
                    ).astype(f)
                    if density > 1.0:
                        continue
                    alpha = min(op * density, f(OPACITY_2D_MAX))
                    if alpha < OPACITY_2D_MIN:
                        continue
                    c2d_state = c3d_state * a2d_state + c2d_state * (1.0 - a2d_state)
                    c3d_state = np.array([r, gg, b], f)
                    a2d_state = alpha
                    t_state = f(t_state / (1.0 - alpha))

                    dc = alpha * t_state * g
                    da = f(t_state * np.dot(c3d_state - c2d_state, g))
                    d_density = op * da
                    d_op_outer = density * da  # outer-opacity grad
                    k = f(-density * d_density)
                    d_color[pi] += dc
                    d_conic[pi] += np.array(
                        [0.5 * k * dx * dx, k * dx * dy, 0.5 * k * dy * dy], f
                    )
                    d_op[pi, 0] += d_op_outer
                    d_pos[pi] += np.array(
                        [k * (cxx * dx + cxy * dy), k * (cxy * dx + cyy * dy)], f
                    )
    return d_color, d_conic, d_op, d_pos
