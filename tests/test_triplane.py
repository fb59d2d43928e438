import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.ops import triplane
from nerf_from_image_tpu.ops import triplane as tri


def test_packed_matches_reference_in_range():
    key = jax.random.PRNGKey(0)
    planes = jax.random.normal(key, (2, 3, 8, 16, 16))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 7, 3),
                                minval=-1.0, maxval=1.0)
    fast = triplane.sample_triplane(planes, coords)
    ref = triplane.sample_triplane_reference(planes, coords)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_packed_matches_reference_at_border():
    key = jax.random.PRNGKey(2)
    planes = jax.random.normal(key, (1, 3, 4, 8, 8))
    # Exactly -1/1 coords and slightly outside.
    coords = jnp.asarray([[[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                           [1.0, -1.0, 0.3], [-1.2, 0.5, 1.3]]])
    fast = triplane.sample_triplane(planes, coords)
    ref = triplane.sample_triplane_reference(planes, coords)
    # First three are in-range (exact parity); the OOB one clamps to the
    # same border texel in both formulations.
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_gradients_flow_to_planes_and_coords():
    planes = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 8, 8))
    coords = jax.random.uniform(jax.random.PRNGKey(4), (1, 6, 3),
                                minval=-0.9, maxval=0.9)

    def f(planes, coords):
        return jnp.sum(triplane.sample_triplane(planes, coords) ** 2)

    gp, gc = jax.grad(f, argnums=(0, 1))(planes, coords)
    assert np.isfinite(np.asarray(gp)).all() and np.abs(
        np.asarray(gp)).sum() > 0
    assert np.isfinite(np.asarray(gc)).all() and np.abs(
        np.asarray(gc)).sum() > 0
    # Second-order (needed for eikonal loss).
    g2 = jax.grad(lambda c: jnp.sum(jax.grad(f, argnums=1)(planes, c) ** 2))(
        coords)
    assert np.isfinite(np.asarray(g2)).all()


def test_generator_pallas_path_matches_xla():
    """Renderer-level parity: Generator(use_pallas=True) through the full
    render equals the XLA gather path (kernel runs in interpreter mode on
    the CPU test backend)."""
    import jax
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.render import render as render_fn

    kwargs = dict(latent_dim=32, scene_range=0.55, attention_values=4,
                  use_sdf=True, img_resolution=64)
    gen_x = Generator(**kwargs)
    gen_p = Generator(use_pallas=True, **kwargs)
    z0 = jnp.zeros((1, 32))
    variables = jax.jit(gen_x.init)(jax.random.PRNGKey(0), z0)

    def forward(gen):
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
        ws = gen.apply(variables, z, method=Generator.map)
        state = gen.apply(variables, ws, method=Generator.synthesize)

        def sample_fn(pts, reqs):
            return gen.apply(variables, state, pts, reqs,
                             method=Generator.sample)

        cam = jnp.broadcast_to(jnp.eye(4), (1, 4, 4)).at[:, 2, 3].set(2.0)
        out = render_fn(sample_fn, 16, 16, cam, jnp.full((1,), 1.2), None,
                        None, scene_range=0.55, white_background=True,
                        depth_samples_per_ray=4, rng=None,
                        fine_sampling=True, compute_normals=True)
        return out.rgb, out.mask, out.normals

    rgb_x, mask_x, nrm_x = jax.jit(lambda: forward(gen_x))()
    rgb_p, mask_p, nrm_p = jax.jit(lambda: forward(gen_p))()
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x),
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(mask_p), np.asarray(mask_x),
                               atol=3e-2)
    # Normals go through the windowed sampler's backward kernel (du/dv)
    # on the pallas path; composited normals must agree with the XLA
    # quad-table double-grad path.
    np.testing.assert_allclose(np.asarray(nrm_p), np.asarray(nrm_x),
                               atol=6e-2)


def test_windowed_overflow_fixup_matches_xla():
    """Blocks whose footprint exceeds the window must be corrected
    exactly by the fixup gather (quad-slice path, packed_planes=None)."""
    from nerf_from_image_tpu.ops.pallas import triplane_window as tw

    B, R = 1, 128
    H = W = 8
    S = 4
    planes = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 32, R, R),
                               jnp.float32)
    # Points spread across most of the volume inside each block -> the
    # (WIN, WIN_Y) window cannot cover them.
    coords = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, S, 3),
                                minval=-0.95, maxval=0.95)
    pdma = tw.plane_layout_for_dma(planes)
    u, v, origins, ov = tw.prepare_blocks(coords, R)
    assert bool(jnp.any(ov)), 'test geometry must overflow'

    feats, resid = jax.jit(
        lambda pl_, pd, c: tw.sample_triplane_windowed(
            pl_, pd, None, c, overflow_capacity_frac=1.0))(
        planes, pdma, coords)
    assert int(resid) == 0

    packed = tri.pack_triplane(planes.astype(jnp.bfloat16))
    ref = tri.sample_packed_triplane(packed, coords.reshape(B, -1, 3), R)
    np.testing.assert_allclose(np.asarray(feats, np.float32),
                               np.asarray(ref, np.float32), atol=6e-2)


def test_windowed_fused_decode_matches_xla():
    """Resident fused-decode kernel parity: in-kernel decoder MLP +
    attention softmax + palette matmul vs the same math in XLA on the
    XLA-gathered features."""
    from nerf_from_image_tpu.ops.pallas import triplane_window as tw

    k = jax.random.PRNGKey(0)
    B, R = 2, 64
    H = W = 8
    S = 4
    hid, nval = 64, 4
    planes = jax.random.normal(k, (B, 3, 32, R, R), jnp.float32)
    base = jax.random.uniform(jax.random.PRNGKey(1),
                              (B, 1, 1, 1, 1, 1, 1, 3),
                              minval=-0.5, maxval=0.5)
    jit_ = jax.random.uniform(jax.random.PRNGKey(2),
                              (B, 1, 8, 1, 8, 1, 4, 3),
                              minval=-0.04, maxval=0.04)
    coords = jnp.clip(base + jit_, -1, 1).reshape(B, H, W, S, 3)
    decode = {
        'w0': jax.random.normal(jax.random.PRNGKey(3), (32, hid)) * 0.2,
        'b0': jax.random.normal(jax.random.PRNGKey(4), (hid,)) * 0.1,
        'w1': jax.random.normal(jax.random.PRNGKey(5), (hid, 1 + nval)) * 0.2,
        'b1': jax.random.normal(jax.random.PRNGKey(6), (1 + nval,)) * 0.1,
        'palette': jax.random.normal(jax.random.PRNGKey(7), (B, nval, 3)),
    }

    pdma = tw.plane_layout_for_dma(planes)
    out4, resid = jax.jit(lambda pl_, pd, c: tw.sample_triplane_windowed(
        pl_, pd, None, c, decode=decode))(planes, pdma, coords)

    packed = tri.pack_triplane(planes.astype(jnp.bfloat16))
    feats = tri.sample_packed_triplane(packed, coords.reshape(B, -1, 3), R)
    h = jax.nn.softplus(
        feats.astype(jnp.float32) @ decode['w0'] + decode['b0'])
    d = h @ decode['w1'] + decode['b1']
    probs = jax.nn.softmax(d[..., 1:], axis=-1)
    rgb = jnp.einsum('bpk,bkc->bpc', probs, decode['palette'])
    ref = jnp.concatenate((d[..., :1], rgb), axis=-1)

    assert int(resid) == 0
    np.testing.assert_allclose(np.asarray(out4, np.float32),
                               np.asarray(ref, np.float32), atol=6e-2)


def test_windowed_gradients_match_xla():
    """custom_vjp (grad kernel) parity: d/d(planes) and d/d(coords)
    through the windowed sampler vs the XLA quad-table path."""
    import jax
    from nerf_from_image_tpu.ops.pallas import triplane_window as tw

    k = jax.random.PRNGKey(0)
    B, R = 1, 64
    H = W = 8
    S = 4
    planes = jax.random.normal(k, (B, 3, 32, R, R), jnp.float32)
    base = jax.random.uniform(jax.random.PRNGKey(1),
                              (B, 1, 1, 1, 1, 1, 1, 3),
                              minval=-0.5, maxval=0.5)
    jit_ = jax.random.uniform(jax.random.PRNGKey(2),
                              (B, 1, 8, 1, 8, 1, 4, 3),
                              minval=-0.04, maxval=0.04)
    coords = jnp.clip(base + jit_, -1, 1).reshape(B, H, W, S, 3)
    wvec = jax.random.normal(jax.random.PRNGKey(5), (B, H * W * S, 32))

    def loss_pallas(planes, coords):
        pdma = tw.plane_layout_for_dma(planes)
        feats, _ = tw.sample_triplane_windowed(planes, pdma, None, coords)
        return jnp.sum(feats.astype(jnp.float32) * wvec)

    def loss_xla(planes, coords):
        packed = tri.pack_triplane(planes.astype(jnp.bfloat16))
        feats = tri.sample_packed_triplane(packed,
                                           coords.reshape(B, -1, 3), R)
        return jnp.sum(feats.astype(jnp.float32) * wvec)

    gp_p, gc_p = jax.grad(loss_pallas, argnums=(0, 1))(planes, coords)
    gp_x, gc_x = jax.grad(loss_xla, argnums=(0, 1))(planes, coords)

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-8)

    assert rel(gp_p, gp_x) < 0.05  # bf16 tap-weight rounding scale
    assert rel(gc_p, gc_x) < 0.05

    # Planes-only backward (coord_grads=False): plane grads must match;
    # coordinate grads are zero by contract.
    def loss_pallas_pg(planes, coords):
        pdma = tw.plane_layout_for_dma(planes)
        feats, _ = tw.sample_triplane_windowed(planes, pdma, None, coords,
                                               coord_grads=False)
        return jnp.sum(feats.astype(jnp.float32) * wvec)

    gp_po, gc_po = jax.grad(loss_pallas_pg, argnums=(0, 1))(planes, coords)
    assert rel(gp_po, gp_x) < 0.05
    assert float(jnp.sum(jnp.abs(gc_po))) == 0.0


def test_overflow_fixup_partial_capacity_gradients():
    """When fewer blocks overflow than the fixup capacity, filler
    selection entries must be dropped, not scattered as duplicate block
    0 (which inflated block 0's plane/feature gradient; ADVICE r1)."""
    from nerf_from_image_tpu.ops.pallas import triplane_window as tw

    B, R = 1, 128
    H = W = 8
    S = 4
    planes = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 32, R, R),
                               jnp.float32)
    # Tight per-block clusters (fit the window) everywhere except two
    # blocks whose points are spread over the whole volume -> exactly
    # those blocks overflow, leaving most of the cap as filler.
    base = jax.random.uniform(jax.random.PRNGKey(1),
                              (B, 1, 1, 1, 1, 1, 1, 3),
                              minval=-0.4, maxval=0.4)
    jit_ = jax.random.uniform(jax.random.PRNGKey(2),
                              (B, 1, 8, 1, 8, 1, 4, 3),
                              minval=-0.03, maxval=0.03)
    coords = jnp.clip(base + jit_, -1, 1).reshape(B, H, W, S, 3)
    spread = jax.random.uniform(jax.random.PRNGKey(3), (2, S, 3),
                                minval=-0.95, maxval=0.95)
    cb = coords.reshape(B, H // 8, 8, W // 8, 8, S // 4, 4, 3)
    cb = cb.at[0, 0, 0, 0, 0, 0].set(spread[0])
    cb = cb.at[0, 0, 3, 0, 5, 0].set(spread[1])
    coords = cb.reshape(B, H, W, S, 3)
    _, _, _, ov = tw.prepare_blocks(coords, R)
    n_ov = int(jnp.sum(ov.astype(jnp.int32)))
    assert 0 < n_ov < 4, f'need partial overflow, got {n_ov} blocks'

    wvec = jax.random.normal(jax.random.PRNGKey(5), (B, H * W * S, 32))

    def loss_pallas(planes):
        pdma = tw.plane_layout_for_dma(planes)
        feats, _ = tw.sample_triplane_windowed(
            planes, pdma, None, coords, overflow_capacity_frac=1.0)
        return jnp.sum(feats.astype(jnp.float32) * wvec)

    def loss_xla(planes):
        packed = tri.pack_triplane(planes.astype(jnp.bfloat16))
        feats = tri.sample_packed_triplane(packed,
                                           coords.reshape(B, -1, 3), R)
        return jnp.sum(feats.astype(jnp.float32) * wvec)

    fp, gp = jax.value_and_grad(loss_pallas)(planes)
    fx, gx = jax.value_and_grad(loss_xla)(planes)
    np.testing.assert_allclose(float(fp), float(fx), rtol=2e-2)
    a = np.asarray(gp, np.float64)
    b = np.asarray(gx, np.float64)
    assert np.abs(a - b).max() / (np.abs(b).max() + 1e-8) < 0.05


def test_unblock_points_matches_unblocked_path():
    """unblock=False + unblock_points must equal the unblock=True
    output bit-for-bit (ADVICE r3: every consumer of the blocked-order
    decode relies on this reorder contract; a new sample() output wired
    without its `reorder` would silently return kernel-blocked order).
    Also covers Generator.sample's parity between the two modes at the
    default (tile, slab) geometry."""
    from nerf_from_image_tpu.ops.pallas import triplane_window as tw

    B, R = 1, 128
    H = W = 8
    S = 4
    planes = jax.random.normal(jax.random.PRNGKey(2), (B, 3, 32, R, R),
                               jnp.float32)
    coords = jax.random.uniform(jax.random.PRNGKey(3), (B, H, W, S, 3),
                                minval=-0.5, maxval=0.5)
    pdma = tw.plane_layout_for_dma(planes)
    f_nat, _ = jax.jit(
        lambda p, pd, c: tw.sample_triplane_windowed(p, pd, None, c))(
        planes, pdma, coords)
    f_blk, _ = jax.jit(
        lambda p, pd, c: tw.sample_triplane_windowed(p, pd, None, c,
                                                     unblock=False))(
        planes, pdma, coords)
    reordered = tw.unblock_points(f_blk, H, W, S)
    np.testing.assert_array_equal(np.asarray(reordered), np.asarray(f_nat))
