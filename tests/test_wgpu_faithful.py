"""The wgpu-faithful backend: software model of the reference's HARDWARE
pipeline (wgpu_pipeline/renderer.rs + shaders.wgsl), restoring the
custom-vs-hardware A/B the reference ships.
"""

import jax.numpy as jnp
import numpy as np

from compute_renderer_tpu.backends import get_backend, wgpu_faithful, xla
from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import (
    Effect, EffectUniform, WaveDirection,
)
from compute_renderer_tpu.core.types import Mesh
from compute_renderer_tpu.io import procedural

W, H = 128, 96


def frame_args(mesh, effect=None, eye=(0.0, 0.0, 3.0)):
    cam = Camera.first_person(list(eye), aspect=W / H)
    u = cam.uniform()
    eff = effect if effect is not None else EffectUniform().as_array()
    return (
        jnp.asarray(mesh.positions),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj),
        jnp.asarray(u.view_position),
        jnp.asarray(np.array([[0.0, 0.0, 5.0]], np.float32)),
        jnp.asarray(np.ones((1, 3), np.float32)),
        jnp.asarray(np.ones((1,), np.float32)),
        jnp.asarray(eff),
    )


def test_registered_backend():
    assert get_backend("wgpu-faithful") is wgpu_faithful


def test_renders_sphere_on_blue():
    args = frame_args(procedural.icosphere(2))
    rgba, depth = wgpu_faithful.render_frame(*args, width=W, height=H)
    rgba = np.asarray(rgba)
    depth = np.asarray(depth)
    covered = depth < 1.0
    assert covered.sum() > 500
    # Background is the blue clear color; depth cleared to 1.0.
    assert tuple(rgba[0, 0]) == (0, 0, 255, 255)
    assert depth[0, 0] == 1.0
    # Covered pixels are shaded (not background).
    ys, xs = np.nonzero(covered)
    assert (rgba[ys, xs, 2] != 255).any() or (rgba[ys, xs, 0] > 0).any()


def test_effects_are_ignored():
    # The hardware pipeline has no effects (shaders.wgsl:34-44): a wave
    # uniform must change NOTHING (the custom path deforms the silhouette).
    m = procedural.icosphere(2)
    e = Effect.wave(0.5, 3.0, 2.0, WaveDirection.VERTICAL)
    e.update(0.4)
    plain, _ = wgpu_faithful.render_frame(*frame_args(m), width=W, height=H)
    waved, _ = wgpu_faithful.render_frame(
        *frame_args(m, effect=e.uniform(0.4).as_array()), width=W, height=H
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(waved))


def test_distinct_look_vs_custom_semantics():
    # The two pipelines LOOK different by design (sRGB vs gamma 1/2.2,
    # pixel-center vs integer sampling, perspective-correct vs affine):
    # same silhouette class, different pixels.
    m = procedural.icosphere(2)
    args = frame_args(m)
    hw, _ = wgpu_faithful.render_frame(*args, width=W, height=H)
    sw, _ = xla.render_frame(*args, width=W, height=H)
    hw, sw = np.asarray(hw), np.asarray(sw)
    cov_hw = (hw[..., 2] != 255).sum()
    cov_sw = (sw[..., 2] != 255).sum()
    assert abs(cov_hw - cov_sw) < 0.1 * max(cov_hw, cov_sw)
    assert (hw != sw).any()


def test_backface_culling_ccw():
    # A single camera-facing triangle draws; with reversed winding it is
    # back-facing and culled (a closed mesh would just show its inside).
    m = procedural.single_triangle()
    _, d_front = wgpu_faithful.render_frame(
        *frame_args(m), width=W, height=H
    )
    assert (np.asarray(d_front) < 1.0).any()
    rev = Mesh(
        m.positions, m.normals, m.uvs,
        m.indices.reshape(-1, 3)[:, ::-1].reshape(-1).copy(),
    )
    _, depth = wgpu_faithful.render_frame(
        *frame_args(rev), width=W, height=H
    )
    assert (np.asarray(depth) == 1.0).all()


def test_shared_edge_no_gaps_no_cracks():
    # Top-left fill rule: a screen-facing quad split along its diagonal
    # must cover its interior with no background seam along the shared
    # edge (each edge pixel rasterized by exactly one triangle).
    quad = procedural.quad(z=0.0, size=1.0)
    _, depth = wgpu_faithful.render_frame(
        *frame_args(quad), width=W, height=H
    )
    depth = np.asarray(depth)
    covered = depth < 1.0
    # Interior bounding box of the covered region must be fully covered.
    ys, xs = np.nonzero(covered)
    y0, y1, x0, x1 = ys.min() + 2, ys.max() - 2, xs.min() + 2, xs.max() - 2
    assert covered[y0:y1, x0:x1].all(), "seam/gap inside the quad"


def test_srgb_differs_from_gamma():
    # A mid-gray linear value encodes differently under sRGB vs pow(1/2.2);
    # pin the backend's transfer function at a few points.
    lin = jnp.asarray(np.array([0.0, 0.002, 0.0031308, 0.18, 0.5, 1.0],
                               np.float32))
    enc = np.asarray(wgpu_faithful._srgb_encode(lin))
    expect = np.array([0.0, 0.02584, 0.04045, 0.46135613, 0.73536, 1.0],
                      np.float32)
    np.testing.assert_allclose(enc, expect, atol=2e-4)


def test_perspective_correct_interpolation():
    # The hardware pipeline interpolates attributes perspective-correctly
    # (a/w, 1/w affine in screen space); the custom pipeline is affine.
    # Analytic check: a quad spanning depth recovers the TRUE world-space
    # point at a probe pixel. Build a floor-like quad tilted in depth, put
    # the probe at the screen center, and compare the interpolated world
    # position against the exact ray/plane intersection.
    cam = Camera.first_person([0.0, 1.0, 3.0], aspect=W / H)
    u = cam.uniform()
    # Plane y = 0, spanning x in [-5, 5], z in [-20, 2].
    pos = np.array(
        [[-5, 0, 2], [5, 0, 2], [5, 0, -20], [-5, 0, -20]], np.float32
    )
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uvs = np.zeros((4, 2), np.float32)
    idx = np.array([0, 2, 1, 0, 3, 2], np.uint32)  # CCW from above
    mesh = Mesh(pos, nrm, uvs, idx)

    args = (
        jnp.asarray(mesh.positions), jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj), jnp.asarray(u.view_position),
        jnp.asarray(np.array([[0.0, 50.0, 0.0]], np.float32)),
        jnp.asarray(np.ones((1, 3), np.float32)),
        jnp.asarray(np.ones((1,), np.float32)),
        jnp.asarray(EffectUniform().as_array()),
    )
    # Winding: ensure something draws; flip if culled.
    rgba, depth = wgpu_faithful.render_frame(*args, width=W, height=H)
    depth = np.asarray(depth)
    if not (depth < 1.0).any():
        idx2 = idx.reshape(-1, 3)[:, ::-1].reshape(-1).copy()
        mesh = Mesh(pos, nrm, uvs, idx2)
        args = (jnp.asarray(mesh.positions),) + args[1:3] + (
            jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        ) + args[4:]
        rgba, depth = wgpu_faithful.render_frame(*args, width=W, height=H)
        depth = np.asarray(depth)
    assert (depth < 1.0).sum() > 100

    # Depth must be monotone along the floor at the center column (farther
    # = greater NDC z) — pins the viewport/depth mapping.
    col = W // 2
    rows = np.nonzero(depth[:, col] < 1.0)[0]
    assert len(rows) > 10
    d = depth[rows, col]
    assert (np.diff(d) <= 1e-7).all(), "depth not monotone along the floor"

    # Perspective-correctness proper: at a probe pixel, the shaded color
    # must match the analytic shading of the EXACT ray/floor intersection
    # (perspective-correct world position), and must NOT match shading of
    # the screen-space-affine interpolated position (what the custom
    # pipeline would produce). A near light makes the two measurably
    # different across the quad's large depth span.
    vp = np.asarray(u.view_proj, np.float64)
    inv = np.linalg.inv(vp)
    probe_r = int(rows[len(rows) // 3])
    px, py = col + 0.5, probe_r + 0.5
    xn = px / W * 2.0 - 1.0
    yn = 1.0 - py / H * 2.0

    def unproject(zn):
        q = inv @ np.array([xn, yn, zn, 1.0])
        return q[:3] / q[3]

    p0, p1 = unproject(0.0), unproject(1.0)
    t = -p0[1] / (p1[1] - p0[1])  # intersect y = 0
    wpos_exact = p0 + t * (p1 - p0)

    light_pos = np.array([0.0, 2.0, -6.0])
    eye = np.asarray(u.view_position, np.float64)[:3]
    normal = np.array([0.0, 1.0, 0.0])

    def shade(wp):
        ld = light_pos - wp
        ld = ld / np.linalg.norm(ld)
        diff = max(float(normal @ ld), 0.0)
        vd = eye - wp
        vd = vd / np.linalg.norm(vd)
        edotn = float(-ld @ normal)
        refl = -ld - 2.0 * edotn * normal
        spec = max(float(vd @ refl), 0.0) ** 32
        c = 0.1 + diff + spec * 0.5
        c = min(max(c, 0.0), 1.0)
        enc = c * 12.92 if c <= 0.0031308 else 1.055 * c ** (1 / 2.4) - 0.055
        return round(enc * 255.0)

    args_lit = args[:6] + (
        jnp.asarray(light_pos[None, :].astype(np.float32)),
    ) + args[7:]
    rgba_lit, _ = wgpu_faithful.render_frame(*args_lit, width=W, height=H)
    got = int(np.asarray(rgba_lit)[probe_r, col, 0])
    assert abs(got - shade(wpos_exact)) <= 2, (
        got, shade(wpos_exact), wpos_exact)

    # The affine-interpolated position (screen-space barycentric over raw
    # world coords) sits elsewhere on the plane; its shading must differ,
    # proving the probe distinguishes the two interpolation schemes.
    h = np.concatenate([pos, np.ones((4, 1), np.float32)], 1) @ vp.T
    sx = (h[:, 0] / h[:, 3] + 1) * 0.5 * W
    sy = (1 - h[:, 1] / h[:, 3]) * 0.5 * H
    # Triangle (0, 2, 1) covers the probe (center column, lower half).
    tri_ids = (0, 2, 1)
    ax, ay = sx[tri_ids[0]], sy[tri_ids[0]]
    bx, by = sx[tri_ids[1]], sy[tri_ids[1]]
    cx, cy = sx[tri_ids[2]], sy[tri_ids[2]]
    det = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
    l1 = ((bx - px) * (cy - py) - (cx - px) * (by - py)) / det
    l2 = ((cx - px) * (ay - py) - (ax - px) * (cy - py)) / det
    l3 = 1.0 - l1 - l2
    wpos_affine = (l1 * pos[tri_ids[0]] + l2 * pos[tri_ids[1]]
                   + l3 * pos[tri_ids[2]]).astype(np.float64)
    assert abs(shade(wpos_affine) - shade(wpos_exact)) > 4, (
        "probe does not distinguish affine from perspective-correct")


def test_near_plane_clipping_floor_through_camera():
    # Fixed-function near-plane clipping (round 4): a floor quad running
    # UNDER the camera and far behind it has every triangle crossing
    # w = 0. The custom pipeline discards such triangles whole
    # (binning.wgsl:96-98) and draws nothing; the hardware pipeline clips
    # them and still shows the floor ahead (shaders.wgsl:34-44 +
    # renderer.rs:202-217 fixed-function state). Coverage and attributes
    # are checked against analytic ray/plane expectations.
    cam = Camera.first_person([0.0, 1.0, 3.0], aspect=W / H)
    u = cam.uniform()
    pos = np.array(
        [[-50, 0, 50], [50, 0, 50], [50, 0, -50], [-50, 0, -50]], np.float32
    )
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uvs = np.zeros((4, 2), np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)  # front-facing from +y
    light_pos = np.array([[0.0, 2.0, -6.0]], np.float32)
    args = (
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(uvs),
        jnp.asarray(idx.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj), jnp.asarray(u.view_position),
        jnp.asarray(light_pos), jnp.asarray(np.ones((1, 3), np.float32)),
        jnp.asarray(np.ones((1,), np.float32)),
        jnp.asarray(EffectUniform().as_array()),
    )
    rgba, depth = wgpu_faithful.render_frame(*args, width=W, height=H)
    rgba, depth = np.asarray(rgba), np.asarray(depth)
    covered = depth < 1.0
    # Both triangles cross w = 0 (two verts at z=+50, behind the near
    # plane at eye z=3 looking down -z) — without clipping nothing draws.
    assert covered.sum() > 0.2 * W * H, (
        f"only {covered.sum()} px covered — near-plane clipping missing?"
    )

    # Analytic coverage: a pixel sees the floor iff its eye ray hits
    # y = 0 in FRONT of the near plane (the floor is effectively
    # infinite here). Compare away from the 1-px rasterization boundary.
    vp = np.asarray(u.view_proj, np.float64)
    inv = np.linalg.inv(vp)
    xs = (np.arange(W) + 0.5) / W * 2.0 - 1.0
    ys = 1.0 - (np.arange(H) + 0.5) / H * 2.0
    xn, yn = np.meshgrid(xs, ys)

    def unproject(zn):
        q = np.stack([xn, yn, np.full_like(xn, zn), np.ones_like(xn)], -1)
        p = q @ inv.T
        return p[..., :3] / p[..., 3:4]

    p0, p1 = unproject(0.0), unproject(1.0)
    dy = p1[..., 1] - p0[..., 1]
    t = -p0[..., 1] / np.where(dy == 0, 1.0, dy)
    hit = p0 + t[..., None] * (p1 - p0)
    expect = (t > 0) & (t < 1) & (np.abs(hit[..., 0]) < 50) \
        & (np.abs(hit[..., 2]) < 50)
    mismatch = covered != expect
    # Allow a 1-px band at the coverage boundary (fill rule / f32 edges),
    # dilated by hand with slicing.
    border = np.zeros_like(expect)
    e = expect
    border[1:, :] |= e[1:, :] != e[:-1, :]
    border[:-1, :] |= e[:-1, :] != e[1:, :]
    border[:, 1:] |= e[:, 1:] != e[:, :-1]
    border[:, :-1] |= e[:, :-1] != e[:, 1:]
    assert (mismatch & ~border).sum() == 0, (
        f"{(mismatch & ~border).sum()} px disagree with the analytic "
        "clip coverage away from the boundary"
    )

    # Attribute correctness through the clip: at a probe pixel the shaded
    # value must match analytic shading of the exact ray/floor hit
    # (clip-space varying interpolation keeps perspective correctness).
    rows = np.nonzero(covered[:, W // 2])[0]
    probe_r = int(rows[len(rows) // 2])
    wp = hit[probe_r, W // 2]
    eye = np.asarray(u.view_position, np.float64)[:3]
    normal = np.array([0.0, 1.0, 0.0])
    lp = light_pos[0].astype(np.float64)
    ld = lp - wp
    ld /= np.linalg.norm(ld)
    diff = max(float(normal @ ld), 0.0)
    vd = eye - wp
    vd /= np.linalg.norm(vd)
    refl = -ld - 2.0 * float(-ld @ normal) * normal
    spec = max(float(vd @ refl), 0.0) ** 32
    c = min(max(0.1 + diff + spec * 0.5, 0.0), 1.0)
    enc = c * 12.92 if c <= 0.0031308 else 1.055 * c ** (1 / 2.4) - 0.055
    got = int(rgba[probe_r, W // 2, 0])
    assert abs(got - round(enc * 255.0)) <= 2, (got, round(enc * 255.0))


def test_near_plane_clip_noop_for_front_geometry():
    # A mesh fully in front of the near plane must be byte-identical to
    # what the pre-clipping model produced: fully-inside triangles pass
    # through the clip stage ungathered and unlerped.
    m = procedural.icosphere(2)
    args = frame_args(m)
    rgba, depth = wgpu_faithful.render_frame(*args, width=W, height=H)
    depth = np.asarray(depth)
    assert (depth < 1.0).sum() > 500
    # Depth-format option: unorm24 quantization only perturbs depth below
    # the 24-bit step and never changes coverage on this scene.
    rgba_q, depth_q = wgpu_faithful.render_frame(
        *args, width=W, height=H, depth_format="unorm24"
    )
    assert ((np.asarray(depth_q) < 1.0) == (depth < 1.0)).all()
    assert np.abs(np.asarray(depth_q) - depth).max() <= 2.0 / (1 << 24)
