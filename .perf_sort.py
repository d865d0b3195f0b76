import time, jax, jax.numpy as jnp, numpy as np
from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.ops.preprocess import project_gaussians
from street_sparse_3dgs_tpu.ops import binning

H, W, N = 512, 512, 32768
s = make_toy_scene(seed=0, n=N, n_cameras=1, width=W, height=H)
cam = s.cameras[0]
proj = project_gaussians(s.means3d, s.scales, s.quats, s.opacities, s.sh_coeffs, cam, 3)

@jax.jit
def bin_current(p):
    b = binning.bin_gaussians(p, H, W, 32, 384)
    return b.gather.sum() + b.mask.sum()

def bin_packed(proj, height, width, max_dup, tile_capacity):
    n = proj.depth.shape[0]
    tiles_x, tiles_y = binning.num_tiles(height, width)
    t_total = tiles_x * tiles_y
    order = jnp.argsort(proj.depth)
    mean2d = proj.mean2d[order]; radius = proj.radius[order]; valid = proj.valid[order]
    x0, y0, x1, y1 = binning.tile_rect(mean2d, radius, tiles_x, tiles_y)
    nx = jnp.where(valid, x1 - x0, 0); ny = jnp.where(valid, y1 - y0, 0)
    coverage = nx * ny
    slots = jnp.arange(max_dup, dtype=jnp.int32)
    nx_safe = jnp.maximum(nx, 1)
    sy = slots[None, :] // nx_safe[:, None]; sx = slots[None, :] % nx_safe[:, None]
    tile_id = (y0[:, None] + sy) * tiles_x + (x0[:, None] + sx)
    in_range = slots[None, :] < jnp.minimum(coverage, max_dup)[:, None]
    keys = jnp.where(in_range, tile_id, t_total).astype(jnp.int32)
    vals = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, max_dup))
    # pack: key in high bits, val in low bits. val < n*max_dup = 2^20; key <= t_total(1024) needs 11 bits
    vbits = 21  # up to 2M rows
    packed = (keys.astype(jnp.int32) << vbits | vals).ravel()
    sp = jnp.sort(packed)
    sorted_keys = sp >> vbits
    sorted_vals = sp & ((1 << vbits) - 1)
    boundaries = jnp.searchsorted(sorted_keys, jnp.arange(t_total + 1, dtype=jnp.int32))
    starts = boundaries[:-1]; counts = boundaries[1:] - starts
    k = jnp.arange(tile_capacity, dtype=jnp.int32)
    idx = jnp.minimum(starts[:, None] + k[None, :], n * max_dup - 1)
    gather = sorted_vals[idx]
    mask = k[None, :] < jnp.minimum(counts, tile_capacity)[:, None]
    return jnp.where(mask, gather, 0), mask

@jax.jit
def bin_new(p):
    g, m = bin_packed(p, H, W, 32, 384)
    return g.sum() + m.sum()

def t(f, *a, n=30):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

# correctness
b = binning.bin_gaussians(proj, H, W, 32, 384)
g2, m2 = bin_packed(proj, H, W, 32, 384)
print("gather equal:", bool(jnp.all(b.gather == g2)), "mask equal:", bool(jnp.all(b.mask == m2)))
print("current 2-array sort:", f"{t(bin_current, proj):.2f} ms")
print("packed 1-array sort :", f"{t(bin_new, proj):.2f} ms")
