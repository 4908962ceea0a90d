"""Frame-parallel batch rendering: data parallelism over a device mesh.

The reference renders one frame at a time on one GPU (SURVEY.md §2.4). For
offline/animation/benchmark workloads the highest-throughput multi-chip
decomposition is the simplest one: shard the FRAME axis. Each device holds
the full (replicated) geometry and renders its own slice of the uniform
stack with the unmodified single-device pipeline — zero communication
until the caller gathers the frames (and none at all if they are consumed
per-device, e.g. written to per-host storage). This composes with, rather
than replaces, the intra-frame decompositions in ``parallel.sharding``
(framebuffer stripes, sort-middle): frames-outer x stripes-inner is the
natural 2-D mesh extension once a single frame no longer fits one chip's
latency budget.

Throughput model: n devices render n frames per (single-device) frame
time — linear scaling, since there is no cross-device traffic in the hot
loop. Contrast the stripe decomposition, which shortens per-frame LATENCY
but pays a per-frame all-gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from compute_renderer_tpu.backends import tpu


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "num_lights", "pair_cap",
                     "tile_cap", "path", "interpret", "effect_kind",
                     "tile_h", "tile_w", "tri_chunk", "worklist",
                     "tex_filter", "ssaa", "tex_mode"),
)
def render_frames_sharded(
    positions, normals, uvs, tri,
    packed_stack,  # (K, U) f32 — Renderer.pack_uniforms rows, K % n == 0
    *,
    mesh: Mesh,
    width: int,
    height: int,
    num_lights: int,
    pair_cap: int = 0,
    tile_cap: int = 0,
    path: str = "auto",
    interpret: bool | None = None,
    effect_kind: int | None = None,
    # Forwarded single-device kernel options: a Renderer constructed with
    # custom tile dimensions / chunking / work-list choice must render the
    # SAME image per frame here as renderer.render does (tile size is
    # observable: coverage-expanding effects clip to the tile-rect union).
    tile_h: int = 0,
    tile_w: int = 0,
    tri_chunk: int = 0,
    worklist: bool = True,
    face_kd=None,  # (T, 3) f32 per-triangle diffuse (material extension)
    # Texture extension (together, replicated): each device's frames run
    # the single-device deferred-texturing pipeline unchanged.
    face_tex=None,
    texels=None,
    tex_table=None,
    tex_filter: str = "nearest",
    tex_mips=None,  # (M, L, 3) mip level table (trilinear only)
    tex_mode: str = "fused",  # "fused" texf kernels | "deferred" vis+tail
    texels_packed=None,  # optional u8-packed pool (pack_pool_u8)
    uv_soa=None,  # precomputed (3, 2, T) texf uv corners (engine upload)
    tex_rows=None,  # precomputed (T, 3) TextureInfo rows
    # SSAA extension: width/height are the RENDER resolution (output x
    # ssaa); each frame box-resolves to the output size inside the scan.
    ssaa: int = 1,
):
    """Render K frames with the frame axis sharded over ``mesh``.

    Geometry is replicated; each device runs the single-device pipeline
    (``tpu.render_frame`` — same kernels, same overflow contract) over its
    K/n frames with ``lax.scan``. Returns ((K, H, W, 4) u8 sharded on the
    frame axis, (n, 2) i32 per-device max needed-capacity report).

    K must be a multiple of the mesh size (pad the stack by repeating the
    last frame and drop the tail, as ``Renderer.render_batch_device`` does
    via ``render_frames`` below).
    """
    from compute_renderer_tpu.engine.renderer import unpack_uniforms

    axis = mesh.axis_names[0]
    n = mesh.devices.size
    K = packed_stack.shape[0]
    if K % n != 0:
        raise ValueError(f"frame count {K} not divisible by mesh size {n}")

    def device_body(pos, nrm, uv, idx, stack_local, *extra):
        kwargs = dict(zip(extra_names, extra))

        def frame(carry, packed):
            vpos, vp, eff, lwp, lc, li = unpack_uniforms(packed, num_lights)
            rgba, _, overflow = tpu.render_frame(
                pos, nrm, uv, idx, vp, vpos, lwp, lc, li, eff,
                width=width, height=height, pair_cap=pair_cap,
                tile_cap=tile_cap, path=path, interpret=interpret,
                effect_kind=effect_kind, tile_h=tile_h, tile_w=tile_w,
                tri_chunk=tri_chunk, worklist=worklist,
                tex_filter=tex_filter, tex_mode=tex_mode, **kwargs,
            )
            if ssaa > 1:
                from compute_renderer_tpu.engine.renderer import (
                    box_downsample,
                )

                rgba = box_downsample(rgba, ssaa)
            return jnp.maximum(carry, overflow), rgba
        needed, frames = jax.lax.scan(
            frame, jnp.zeros((2,), jnp.int32), stack_local
        )
        return frames, needed[None]

    operands = (positions, normals, uvs, tri, packed_stack)
    in_specs = (P(), P(), P(), P(), P(axis))
    extra_names = []
    if face_kd is not None:
        operands = operands + (face_kd,)
        in_specs = in_specs + (P(),)
        extra_names.append("face_kd")
    if face_tex is not None:
        operands = operands + (face_tex, texels, tex_table)
        in_specs = in_specs + (P(), P(), P())
        extra_names.extend(["face_tex", "texels", "tex_table"])
        if tex_mips is not None:
            operands = operands + (tex_mips,)
            in_specs = in_specs + (P(),)
            extra_names.append("tex_mips")
        if texels_packed is not None:
            operands = operands + (texels_packed,)
            in_specs = in_specs + (P(),)
            extra_names.append("texels_packed")
        if uv_soa is not None:
            operands = operands + (uv_soa, tex_rows)
            in_specs = in_specs + (P(), P())
            extra_names.extend(["uv_soa", "tex_rows"])
    return jax.shard_map(
        device_body,
        mesh=mesh,
        # Geometry replicated; only the frame axis is sharded.
        in_specs=in_specs,
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(*operands)


def render_frames(renderer, uniforms_seq, mesh: Mesh,
                  max_retries: int = 3) -> np.ndarray:
    """Host-level frame-parallel entry on an ``engine.Renderer``.

    Packs the uniforms, pads the stack to a mesh-size multiple (repeating
    the last frame), renders with ``render_frames_sharded``, retries once
    per reported capacity overflow (exact-need growth, the analog of
    ``Renderer._checked``), and returns the (len(uniforms_seq), H, W, 4)
    uint8 frames on host."""
    from compute_renderer_tpu.backends.tpu import (
        default_caps, grow_pair_cap, grow_tile_cap, resolve_path,
    )

    uniforms_seq = list(uniforms_seq)
    if not uniforms_seq:
        return np.zeros((0, renderer.height, renderer.width, 4), np.uint8)
    packs = []
    L = None
    for u in uniforms_seq:
        p, L = renderer.pack_uniforms(u)
        packs.append(p)
    n = mesh.devices.size
    K = len(packs)
    pad = (-K) % n
    packs.extend([packs[-1]] * pad)
    stack = jnp.asarray(np.stack(packs))

    T = max(renderer.num_triangles, 1)
    path = resolve_path(renderer.options.get("path", "auto"), T)
    caps = default_caps(path, T, renderer.rw, renderer.rh)
    pair_cap = renderer.options.get("pair_cap") or caps["pair_cap"]
    tile_cap = (renderer.options.get("tile_cap") or caps["tile_cap"] or 0
                if path != "micro" else 0)

    for _ in range(max_retries):
        frames, needed = render_frames_sharded(
            renderer.positions, renderer.normals, renderer.uvs,
            renderer.tri, stack,
            mesh=mesh, width=renderer.rw, height=renderer.rh,
            ssaa=renderer.ssaa,
            num_lights=L, pair_cap=pair_cap, tile_cap=tile_cap,
            path=path,
            effect_kind=renderer.options.get("effect_kind"),
            tile_h=renderer.options.get("tile_h", 0),
            tile_w=renderer.options.get("tile_w", 0),
            tri_chunk=renderer.options.get("tri_chunk", 0),
            worklist=renderer.options.get("worklist", True),
            tex_filter=renderer.options.get("tex_filter", "nearest"),
            tex_mode=renderer.options.get("tex_mode", "fused"),
            face_kd=renderer.face_kd,
            **(renderer.textures or {}),
        )
        need = np.asarray(needed).max(axis=0)
        if not need.any():
            return np.asarray(frames)[:K]
        if need[0]:
            pair_cap = grow_pair_cap(pair_cap, int(need[0]))
        if need[1] and path != "micro":
            from compute_renderer_tpu.backends.tpu import MAX_TILE_CAP

            if (int(need[1]) > MAX_TILE_CAP
                    and renderer.options.get("path", "auto") == "auto"):
                # Per-tile density beyond the SMEM window at any legal
                # cap: fall back to the micro path (no per-tile ceiling),
                # dropping tile-unit caps (micro pairs are 8x8 cells).
                path = "micro"
                caps = default_caps("micro", T, renderer.rw,
                                    renderer.rh)
                pair_cap = caps["pair_cap"]
                tile_cap = 0
                continue
            tile_cap = grow_tile_cap(tile_cap, int(need[1]),
                                     caps["tile_h"], caps["tile_w"])
    raise RuntimeError(
        f"frame-parallel binning overflow after {max_retries} retries "
        f"(pair_cap={pair_cap}, tile_cap={tile_cap})"
    )


# ---------------------------------------------------------------------------
# 2-D composition: frames (dp) x framebuffer stripes (sp) on one mesh
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "num_lights", "pair_cap",
                     "interpret", "ssaa"),
)
def render_frames_sharded_2d(
    positions, normals, uvs, tri,
    packed_stack,  # (K, U) f32, K % mesh.shape[frames-axis] == 0
    *,
    mesh: Mesh,  # 2-D: axes (frames, tiles), in that order
    width: int,
    height: int,
    num_lights: int,
    pair_cap: int = 0,
    interpret: bool | None = None,
    ssaa: int = 1,
):
    """Render K frames on a 2-D mesh: the FRAME axis is data-parallel and,
    within each frame group, the framebuffer shards into horizontal
    STRIPES — the frames-outer x stripes-inner composition the package
    docstring promises once one frame no longer fits a single chip's
    latency budget (dp x sp in scaling-book terms; no reference analog —
    the reference is strictly one frame on one GPU).

    Per device: ``lax.scan`` over its K/nf frames, each rendered by the
    SAME micro-path stripe body the 1-D decomposition uses
    (``sharding._stripe_render_micro``) against its stripe of the padded
    framebuffer. Communication is unchanged from 1-D stripes (the implicit
    output all-gather per frame group, riding ICI); the frame axis adds
    none. Returns ((K, H, W, 4) u8 sharded over BOTH mesh axes (frames ->
    dim 0, stripes -> dim 1), (nf * nt, 2) i32 needed-capacity report).

    The micro path is used unconditionally: its HBM-streamed pair windows
    carry any scene size, so one body serves the whole 2-D product."""
    from compute_renderer_tpu.backends import binning
    from compute_renderer_tpu.engine.renderer import unpack_uniforms
    from compute_renderer_tpu.parallel.sharding import (
        _check_ssaa_stripes, _stripe_render_micro,
    )

    axis_f, axis_t = mesh.axis_names
    nf = mesh.shape[axis_f]
    nt = mesh.shape[axis_t]
    K = packed_stack.shape[0]
    if K % nf != 0:
        raise ValueError(f"frame count {K} not divisible by mesh axis "
                         f"{axis_f}={nf}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rw, rh = width * ssaa, height * ssaa
    ntx = (rw + 127) // 128
    nty = (rh + 7) // 8
    nty = (nty + nt - 1) // nt * nt  # equal stripes
    T = int(tri.shape[0])
    if pair_cap == 0:
        pair_cap = binning.default_pair_cap_micro(max(T, 1), ntx * nty * 16)
    _check_ssaa_stripes(ssaa, nty // nt * 8, ntx * 128)

    def device_body(pos, nrm, uv, idx, stack_local):
        def frame(carry, packed):
            vpos, vp, eff, lwp, lc, li = unpack_uniforms(packed, num_lights)
            rgba, key, needed = _stripe_render_micro(
                pos, nrm, uv, idx, vp, vpos, lwp, lc, li, eff,
                width=rw, height=rh, nty_total=nty, pair_cap=pair_cap,
                n_shards=nt, axis_name=axis_t, interpret=interpret,
                ssaa=ssaa,
            )
            return jnp.maximum(carry, needed[0]), (rgba, key)

        needed, (frames, keys) = jax.lax.scan(
            frame, jnp.zeros((2,), jnp.int32), stack_local
        )
        del keys  # depth keys are per-stripe diagnostics; frames suffice
        return frames, needed[None]

    rgba, needed = jax.shard_map(
        device_body,
        mesh=mesh,
        # Geometry replicated; the uniform stack sharded over frames only.
        in_specs=(P(), P(), P(), P(), P(axis_f)),
        out_specs=(P(axis_f, axis_t), P((axis_f, axis_t),)),
        check_vma=False,
    )(positions, normals, uvs, tri, packed_stack)
    return rgba[:, :height, :width], needed


def render_frames_2d(renderer, uniforms_seq, mesh: Mesh,
                     max_retries: int = 3) -> np.ndarray:
    """Host-level 2-D (frames x stripes) entry on an ``engine.Renderer``:
    packs + pads the uniform stack, renders with
    ``render_frames_sharded_2d``, retries once per reported capacity
    overflow (exact-need growth), returns (len(uniforms_seq), H, W, 4)."""
    from compute_renderer_tpu.backends.tpu import default_caps, grow_pair_cap

    uniforms_seq = list(uniforms_seq)
    if not uniforms_seq:
        return np.zeros((0, renderer.height, renderer.width, 4), np.uint8)
    packs = []
    L = None
    for u in uniforms_seq:
        p, L = renderer.pack_uniforms(u)
        packs.append(p)
    nf = mesh.shape[mesh.axis_names[0]]
    K = len(packs)
    packs.extend([packs[-1]] * ((-K) % nf))
    stack = jnp.asarray(np.stack(packs))

    T = max(renderer.num_triangles, 1)
    pair_cap = (renderer.options.get("pair_cap")
                or default_caps("micro", T, renderer.rw,
                                renderer.rh)["pair_cap"])
    for _ in range(max_retries):
        frames, needed = render_frames_sharded_2d(
            renderer.positions, renderer.normals, renderer.uvs,
            renderer.tri, stack,
            mesh=mesh, width=renderer.width, height=renderer.height,
            num_lights=L, pair_cap=pair_cap, ssaa=renderer.ssaa,
        )
        need = np.asarray(needed).max(axis=0)
        if not need.any():
            return np.asarray(frames)[:K]
        pair_cap = grow_pair_cap(pair_cap, int(need[0]))
    raise RuntimeError(
        f"2-D frame-parallel binning overflow after {max_retries} retries "
        f"(pair_cap={pair_cap})"
    )
