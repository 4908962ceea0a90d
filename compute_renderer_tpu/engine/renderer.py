"""Renderer: geometry upload + the jitted per-frame render step.

The TPU equivalent of the reference's CustomRenderer orchestration
(src/custom_pipeline/renderer.rs:105-157): where the reference encodes four
compute passes into one command buffer per frame, here the whole pipeline is
one jitted XLA program ``render_frame(uniforms) -> (H,W,4) u8`` with geometry
resident on device. ``resize`` recreates the compiled step for the new
framebuffer shape (reference renderer.rs:159-170 rebuilds all buffers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from compute_renderer_tpu.backends import get_backend
from compute_renderer_tpu.engine.scene import FrameUniforms


def unpack_uniforms(packed, L):
    """Inverse of ``Renderer.pack_uniforms``: split the single per-frame
    f32 buffer back into (view_position, view_proj, effect, light_pos,
    light_color, light_intensity). THE one definition of the packed layout
    — the render step and the frame-parallel path both consume it."""
    vpos = packed[0:4]
    vp = packed[4:20].reshape(4, 4)
    eff = packed[20:26]
    o = 26
    lwp = packed[o:o + 3 * L].reshape(L, 3)
    lc = packed[o + 3 * L:o + 6 * L].reshape(L, 3)
    li = packed[o + 6 * L:o + 7 * L]
    return vpos, vp, eff, lwp, lc, li


@partial(jax.jit, static_argnames=("w", "h"))
def _count_pairs(packed, pos_soa, *, w, h):
    """Exact cover-pair total for one frame (micro-path calibration).

    Geometry is an ARGUMENT here, unlike the render step (which bakes it
    as constants for kernel speed): this program compiles once per
    (T, W, H) shape and caches across scenes/Renderers — baking would add
    a full remote compile per mega scene for a program that runs once."""
    from compute_renderer_tpu.backends import binning, common

    vp = packed[4:20].reshape(4, 4)
    eff = packed[20:26]
    _, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, w, h)
    setup = common.triangle_setup_soa(screen_soa, eff, w, h, 8, 8)
    _, _, c = binning.cover_counts(setup)
    return jnp.sum(c)


def box_downsample(rgba, s: int):
    """SSAA resolve: average s x s pixel blocks of an (H*s, W*s, 4) u8
    frame down to (H, W, 4). f32 mean + round-half-up — deterministic and
    backend-agnostic (the resolve sees only the finished framebuffer)."""
    if s == 1:
        return rgba
    H = rgba.shape[0] // s
    W = rgba.shape[1] // s
    x = rgba.astype(jnp.float32).reshape(H, s, W, s, 4).mean(axis=(1, 3))
    return jnp.floor(x + jnp.float32(0.5)).astype(jnp.uint8)


class Renderer:
    def __init__(self, mesh, width: int, height: int, backend: str = "tpu",
                 **options):
        self.backend_name = {"custom": "tpu", "wgpu": "xla"}.get(backend, backend)
        self.backend = get_backend(self.backend_name)
        self.width = int(width)
        self.height = int(height)
        # SSAA extension (beyond the reference, which has no AA): render
        # every frame at ssaa x the output resolution and box-resolve on
        # device. Engine-level, so every backend gets it; one u8 frame
        # still crosses the link per present.
        self.ssaa = int(options.pop("ssaa", 1))
        if self.ssaa < 1:
            raise ValueError(f"ssaa must be >= 1, got {self.ssaa}")
        if self.backend_name != "tpu":
            # Static-specialization hint consumed by the tpu backend only.
            options.pop("effect_kind", None)
        if self.backend_name not in ("tpu", "xla"):
            # Texture filtering rides the texture extension (tpu/xla only;
            # wgpu-faithful models the reference's texture-less pipeline).
            options.pop("tex_filter", None)
        # Measured per-scene tile-shape auto-tune (tile path, real TPU
        # only): no density statistic separates the 16x256 scenes from the
        # 8x128 scenes (see tpu.choose_tile), so the engine TIMES the
        # candidates once per scene/resolution and keeps the winner.
        # tile_autotune=False (or pinning tile_h/tile_w) disables it.
        self._tile_autotune = bool(options.pop("tile_autotune", True))
        self.options = options
        self._step_cache = {}
        self._pending_overflow = None
        # Settle-to-need capacity calibration (micro path): done once per
        # scene/size unless the caller pinned pair_cap explicitly.
        self._user_pair_cap = "pair_cap" in options
        self._calibrate_pair_cap = not self._user_pair_cap
        self._user_tile = "tile_h" in options or "tile_w" in options
        self._tile_tuned = self._user_tile or not self._tile_autotune
        self._upload(mesh)

    def _upload(self, mesh) -> None:
        self.mesh = mesh
        self.positions = jnp.asarray(mesh.positions)
        self.normals = jnp.asarray(mesh.normals)
        self.uvs = jnp.asarray(mesh.uvs)
        self.tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
        self.num_triangles = int(self.tri.shape[0])
        # Material extension: per-triangle diffuse, consumed by the tpu and
        # xla backends (wgpu-faithful models the reference's material-less
        # hardware pipeline and ignores it — faithful by definition).
        kd = getattr(mesh, "face_kd", None)
        self.face_kd = (
            jnp.asarray(kd)
            if kd is not None and self.backend_name in ("tpu", "xla")
            else None
        )
        # Texture extension: the flat atlas + per-triangle slots (both
        # backends run the same deferred sampling tail; see
        # common.sample_atlas).
        self.textures = None
        if (getattr(mesh, "has_textures", False)
                and self.backend_name in ("tpu", "xla")):
            self.textures = {
                "face_tex": jnp.asarray(mesh.face_tex),
                "tex_table": jnp.asarray(mesh.tex_table),
            }
            if self.options.get("tex_filter") in ("trilinear", "anisotropic"):
                # Mip chains are built ONCE on host so every backend only
                # samples — no cross-backend mip-construction parity
                # surface (io.textures.build_mips).
                from compute_renderer_tpu.io.textures import (
                    trilinear_tex_arrays,
                )

                pool, mips = trilinear_tex_arrays(mesh.texels,
                                                  mesh.tex_table)
                self.textures["texels"] = jnp.asarray(pool)
                self.textures["tex_mips"] = jnp.asarray(mips)
            else:
                self.textures["texels"] = jnp.asarray(mesh.texels)
                if self.backend_name == "tpu":
                    # Fused texturing (tpu backend default for nearest/
                    # bilinear) with the deferred fallback for over-large
                    # atlases — the SAME decisions tpu.render makes, so
                    # engine frames compile to the identical program. (The
                    # u8-packed pool is deliberately not used: see the
                    # measured note in tpu.render.)
                    from compute_renderer_tpu.backends.tpu import (
                        texf_eligible,
                    )

                    if not (self.options.get("tex_mode", "fused") == "fused"
                            and texf_eligible(mesh.tex_table)):
                        self.options["tex_mode"] = "deferred"
        # Corner-SoA geometry (3 corners, 3 comps, T) for the tpu backend's
        # micro (mega-scene) path: gathered + transposed ONCE at upload
        # (indices are static per mesh) so the per-frame front-end is
        # gather-free contiguous streaming work. ~72 MB/1M tris — only
        # built when this mesh will actually dispatch to the micro path.
        self.pos_soa = self.nrm_soa = None
        if self.backend_name == "tpu" and self.num_triangles > 0:
            from compute_renderer_tpu.backends.tpu import resolve_path

            path = resolve_path(self.options.get("path", "auto"),
                                self.num_triangles,
                                self.options.get("tri_chunk", 0))
            if path == "micro":
                self.pos_soa = self.positions[self.tri].transpose(1, 2, 0)
                self.nrm_soa = self.normals[self.tri].transpose(1, 2, 0)
                if (self.textures is not None
                        and self.options.get("tex_mode", "fused") != (
                            "deferred")
                        and self.options.get("tex_filter", "nearest")
                        in ("nearest", "bilinear")):
                    # texf inputs are static per mesh — precompute like
                    # pos_soa/nrm_soa (in-jit derivation costs a
                    # 9M-element gather per frame at 1M tris).
                    from compute_renderer_tpu.backends.common import (
                        tex_rows_f32,
                    )

                    self.textures["uv_soa"] = self.uvs.astype(
                        jnp.float32)[self.tri].transpose(1, 2, 0)
                    self.textures["tex_rows"] = tex_rows_f32(
                        self.textures["face_tex"],
                        self.textures["tex_table"])
        self._step_cache.clear()

    @property
    def rw(self) -> int:
        """Render-resolution width (output width x ssaa)."""
        return self.width * self.ssaa

    @property
    def rh(self) -> int:
        """Render-resolution height (output height x ssaa)."""
        return self.height * self.ssaa

    def resize(self, width: int, height: int) -> None:
        """Reference CustomRenderer::resize rebuilds all buffers
        (renderer.rs:159-170); here the per-size compiled step is rebuilt
        lazily on next render."""
        self.width = int(width)
        self.height = int(height)
        if not self._user_pair_cap:
            # A settled capacity was measured at the old resolution;
            # coverage scales with the cell grid, so re-settle.
            self.options.pop("pair_cap", None)
            self._calibrate_pair_cap = True
        if self._tile_autotune and not self._user_tile:
            # The tuned shape was measured at the old resolution.
            self.options.pop("tile_h", None)
            self.options.pop("tile_w", None)
            self._tile_tuned = False
        self._step_cache.clear()

    # -- per-frame step -------------------------------------------------------

    @staticmethod
    def pack_uniforms(uniforms: FrameUniforms) -> tuple[np.ndarray, int]:
        """Flatten all per-frame uniforms into ONE f32 buffer so each frame
        costs a single host->device transfer (the reference makes three
        queue.write_buffer calls per frame, scene.rs:156-186; over a remote
        TPU tunnel every transfer has fixed latency, so one beats six)."""
        L = uniforms.light_world_pos.shape[0]
        return np.concatenate(
            [
                np.asarray(uniforms.view_position, np.float32).ravel(),
                np.asarray(uniforms.view_proj, np.float32).ravel(),
                np.asarray(uniforms.effect, np.float32).ravel(),
                np.asarray(uniforms.light_world_pos, np.float32).ravel(),
                np.asarray(uniforms.light_color, np.float32).ravel(),
                np.asarray(uniforms.light_intensity, np.float32).ravel(),
            ]
        ).astype(np.float32), L

    def _get_step(self, num_lights: int):
        """Compiled per-frame step with geometry baked in as constants."""
        key = (num_lights, self.rw, self.rh,
               self.options.get("tile_h"), self.options.get("tile_w"))
        step = self._step_cache.get(key)
        if step is not None:
            return step

        L = num_lights
        positions, normals, uvs, tri = (
            self.positions, self.normals, self.uvs, self.tri,
        )
        width, height, options = self.rw, self.rh, self.options
        ssaa = self.ssaa
        backend = self.backend
        if self.pos_soa is not None:
            options = dict(options, pos_soa=self.pos_soa,
                           nrm_soa=self.nrm_soa)
        if self.face_kd is not None:
            options = dict(options, face_kd=self.face_kd)
        if self.textures is not None:
            options = dict(options, **self.textures)

        @jax.jit
        def step(packed):
            vpos, vp, eff, lwp, lc, li = unpack_uniforms(packed, L)
            out = backend.render_frame(
                positions, normals, uvs, tri, vp, vpos, lwp, lc, li, eff,
                width=width, height=height, **options,
            )
            if ssaa > 1:
                out = (box_downsample(out[0], ssaa),) + tuple(out[1:])
            return out

        self._step_cache[key] = step
        return step

    def _maybe_calibrate(self, uniforms: FrameUniforms) -> None:
        """Settle the micro-path pair capacity to the scene's MEASURED need
        (+12.5% slack, tpu.grow_pair_cap) instead of the 3T/8 heuristic,
        which overshoots typical mega-scene coverage by ~25%+ — and every
        pair-sized stage (expansion, sort, histogram, coefficient gather,
        kernel HBM stream) scales with the cap. One tiny front-end program
        (vertex + setup + a cover-count reduction; no sort, no raster)
        measures the exact pair total for the first frame; normal overflow
        detection grows the capacity if the camera later moves into denser
        coverage. Runs once per scene/resolution; skipped when the caller
        pinned pair_cap."""
        if not self._calibrate_pair_cap or self.pos_soa is None:
            return
        self._calibrate_pair_cap = False

        from compute_renderer_tpu.backends.tpu import grow_pair_cap

        width, height = self.rw, self.rh
        packed, _ = self.pack_uniforms(uniforms)
        total = int(np.asarray(_count_pairs(
            jnp.asarray(packed), self.pos_soa, w=width, h=height,
        )))
        # Keep the cell-count floor of default_pair_cap_micro (the sorted
        # list must be addressable per cell segment).
        num_cells = ((width + 127) // 128) * ((height + 7) // 8) * 16
        self.options["pair_cap"] = grow_pair_cap(
            0, max(total, num_cells, 1024)
        )
        self._step_cache.clear()

    def _maybe_tune_tile(self, uniforms_seq) -> None:
        """Pick the framebuffer tile shape by MEASUREMENT, once per
        scene/resolution (tile path, real TPU only).

        The round-5 bisect (scripts/bisect_r4_tile.py, v5e 2026-08-20)
        showed the optimum is scene-dependent under the batched-slope
        methodology — 16x256 wins suzanne (0.325 vs 0.560 ms/frame) and
        san-miguel-small (3.66 vs 4.20), 8x128 wins exterior (0.97 vs
        1.42) — and that no cheap density statistic separates them. So:
        time each tpu.TILE_CANDIDATES shape on the caller's own
        granularity (the first batch for the batched path, single-frame
        dispatches otherwise) and keep the winner. For the plain/wave/
        edge-melt effect classes the image is bitwise identical across
        tile shapes (coverage confines pixels to the triangle, and the
        (key, tri) depth resolve is tiling-independent), so the choice is
        purely scheduling. Mirage and voxelize EXPAND coverage beyond the
        triangle (sample warp / relaxed threshold), making the covered-
        tile rectangle part of the per-pixel semantics — tuning would tie
        the image to timing noise, so those scenes (and dynamic-effect
        renderers with no static effect_kind) keep the default shape.
        Costs one extra compile per losing candidate, amortized by the
        persistent compilation cache. Disabled when the caller pins
        tile_h/tile_w, passes tile_autotune=False, is not on the tile
        path, or runs interpret-mode (timing would be meaningless)."""
        if self._tile_tuned:
            return
        self._tile_tuned = True
        if (self.backend_name != "tpu" or self.num_triangles == 0
                or jax.default_backend() != "tpu" or not uniforms_seq):
            return

        from compute_renderer_tpu.core.effects import (
            EFFECT_MIRAGE,
            EFFECT_VOXELIZE,
        )

        if self.options.get("effect_kind") in (None, EFFECT_MIRAGE,
                                               EFFECT_VOXELIZE):
            return

        from compute_renderer_tpu.backends.tpu import (
            TILE_CANDIDATES,
            resolve_path,
        )

        path = resolve_path(self.options.get("path", "auto"),
                            self.num_triangles,
                            self.options.get("tri_chunk", 0))
        if path != "tile":
            return

        import time as _time

        batched = len(uniforms_seq) > 1
        rounds = 3 if batched else 6
        results = {}
        for th, tw in TILE_CANDIDATES:
            self.options["tile_h"], self.options["tile_w"] = th, tw
            # Checked warm-up: compiles the candidate and settles its
            # binning capacities (a retry here must not be timed).
            if batched:
                out = self.render_batch_device(list(uniforms_seq))
                np.asarray(out[-1, 0, 0])
            else:
                out = self._checked(uniforms_seq[0])
                np.asarray(out[0][0, 0])
            if self.options.get("path") == "micro":
                # Over-dense tile->micro fallback fired during warm-up:
                # the tile shape is moot, keep micro.
                return
            best = float("inf")
            for _ in range(rounds):
                t0 = _time.perf_counter()
                if batched:
                    self.render_batch_device(list(uniforms_seq),
                                             check=False)
                    self.fence_pending()
                else:
                    o = self.render_device(uniforms_seq[0])
                    np.asarray(o[2] if len(o) > 2 else o[0][0, 0])
                best = min(best, _time.perf_counter() - t0)
            results[(th, tw)] = best
        winner = min(results, key=results.get)
        self.options["tile_h"], self.options["tile_w"] = winner

    def render_device(self, uniforms: FrameUniforms):
        """Render and return the device-resident (H,W,4) u8 framebuffer
        (plus the depth-key buffer; the tpu backend also returns its binning
        overflow flag). No host transfer, no overflow check — callers that
        block (render / render_blocked / the benchmark loop) go through
        ``_checked`` so overflow retries with doubled capacities instead of
        silently dropping triangles (the reference's unchecked-overflow bug,
        gpu_buffers.rs:53-63)."""
        packed, L = self.pack_uniforms(uniforms)
        return self._get_step(L)(jnp.asarray(packed))

    def _checked(self, uniforms: FrameUniforms, max_retries: int = 3):
        """Render, blocking on the tpu backend's overflow report; the report
        carries the NEEDED capacities, so a retry recompiles once with a
        sufficient size (doubling blindly cost minutes of recompiles per
        step at mega scale)."""
        self._maybe_tune_tile([uniforms])
        for _ in range(max_retries):
            # Inside the loop: a tile->micro fallback (_grow_caps) re-arms
            # calibration, and the micro pair capacity must be re-measured
            # in cell units before the retry renders.
            self._maybe_calibrate(uniforms)
            out = self.render_device(uniforms)
            if len(out) < 3:
                return out
            flags = np.asarray(out[2])
            if not flags.any():
                return out
            self._grow_caps(pair_needed=int(flags[0]),
                            tile_needed=int(flags[1]))
        raise RuntimeError(
            f"binning capacity overflow after {max_retries} retries "
            f"(options={self.options})"
        )

    def _grow_caps(self, pair_needed: int = 0, tile_needed: int = 0) -> None:
        """Grow binning capacities to the backend-reported need (0 = leave
        alone; see binning.bin_*'s pair_needed/tile_needed outputs)."""
        from compute_renderer_tpu.backends.tpu import (
            default_caps,
            grow_pair_cap,
            grow_tile_cap,
            resolve_path,
        )

        T = max(self.num_triangles, 1)
        path = resolve_path(self.options.get("path", "auto"), T,
                            self.options.get("tri_chunk", 0))
        from compute_renderer_tpu.backends.tpu import MAX_TILE_CAP

        if (path != "micro" and tile_needed > MAX_TILE_CAP
                and self.options.get("path", "auto") == "auto"):
            # The scene's screen-space density exceeds the tile kernel's
            # SMEM window at any legal tile_cap (resolve_path's
            # triangle-count split can't see density — e.g. a 36k-tri
            # mesh at a thumbnail resolution packs >8192 triangles into
            # one tile). Fall back to the micro path: its pair windows
            # stream from HBM with no per-tile ceiling. An explicitly
            # pinned path="tile" keeps the hard error (grow_tile_cap).
            self._switch_to_micro()
            return
        caps = default_caps(path, T, self.rw, self.rh,
                            self.options.get("tile_h", 0),
                            self.options.get("tile_w", 0))
        pc = self.options.get("pair_cap") or caps["pair_cap"]
        if pair_needed:
            pc = grow_pair_cap(pc, pair_needed)
        if path == "micro":
            # No tile-side cap on the micro path (window chunks stream from
            # HBM with a dynamic trip count).
            self.options["pair_cap"] = pc
            self._step_cache.clear()
            return

        tc = self.options.get("tile_cap") or caps["tile_cap"]
        if tile_needed:
            tc = grow_tile_cap(tc, tile_needed, caps["tile_h"],
                               caps["tile_w"])
        self.options["pair_cap"] = pc
        self.options["tile_cap"] = tc
        self._step_cache.clear()

    def _switch_to_micro(self) -> None:
        """Tile->micro fallback for over-dense scenes (see _grow_caps).
        Tile-path capacities are dropped (micro pair units are 8x8 CELLS,
        not tiles — stale values would mis-size every pair-sized stage) and
        calibration re-arms so the next checked render measures the micro
        pair need exactly."""
        self.options["path"] = "micro"
        for k in ("tile_cap", "tile_h", "tile_w", "worklist"):
            self.options.pop(k, None)
        if not self._user_pair_cap:
            self.options.pop("pair_cap", None)
            self._calibrate_pair_cap = True
        if self.pos_soa is None and self.num_triangles > 0:
            self.pos_soa = self.positions[self.tri].transpose(1, 2, 0)
            self.nrm_soa = self.normals[self.tri].transpose(1, 2, 0)
        self._step_cache.clear()

    def _get_batch_step(self, num_lights: int):
        """Compiled K-frame step: lax.scan over a stack of packed uniforms
        inside ONE XLA program. Amortizes per-dispatch latency (a remote TPU
        adds fixed cost per execute call) — the offline/animation path."""
        key = ("batch", num_lights, self.rw, self.rh,
               self.options.get("tile_h"), self.options.get("tile_w"))
        step = self._step_cache.get(key)
        if step is not None:
            return step
        frame = self._get_step(num_lights)

        @jax.jit
        def batch(packed_stack):
            def body(overflow, packed):
                out = frame(packed)
                if len(out) > 2:
                    overflow = jnp.maximum(overflow, out[2])
                return overflow, out[0]

            overflow, frames = jax.lax.scan(
                body, jnp.zeros((2,), jnp.int32), packed_stack
            )
            return frames, overflow

        self._step_cache[key] = batch
        return batch

    def render_batch_device(self, uniforms_seq, max_retries: int = 3,
                            check: bool = True):
        """Render a sequence of frames in one dispatch; returns the
        device-resident (K,H,W,4) u8 stack.

        ``check=True`` fetches the overflow flags (one extra host<->device
        round trip) and retries with doubled binning capacities. Steady-state
        loops (benchmarks) pass ``check=False`` — the flags accumulate on
        device and ``flush_overflow()`` fetches them once at the end."""
        uniforms_seq = list(uniforms_seq)
        self._maybe_tune_tile(uniforms_seq)
        packs = []
        L = None
        for u in uniforms_seq:
            p, L = self.pack_uniforms(u)
            packs.append(p)
        stack = jnp.asarray(np.stack(packs))
        for _ in range(max_retries):
            if check and uniforms_seq:
                # Inside the loop: a tile->micro fallback re-arms
                # calibration mid-retry (see _checked).
                self._maybe_calibrate(uniforms_seq[0])
            frames, overflow = self._get_batch_step(L)(stack)
            if not check:
                self._pending_overflow = (
                    overflow
                    if self._pending_overflow is None
                    else jnp.maximum(self._pending_overflow, overflow)
                )
                return frames
            flags = np.asarray(overflow)
            if not flags.any():
                return frames
            self._grow_caps(pair_needed=int(flags[0]),
                            tile_needed=int(flags[1]))
        raise RuntimeError(
            f"binning capacity overflow after {max_retries} retries "
            f"(options={self.options})"
        )

    def fence_pending(self) -> None:
        """Block until every dispatched batch has completed on device, via a
        tiny device_get of the accumulated overflow flags.
        ``jax.block_until_ready`` is NOT a reliable completion fence on
        remote/tunneled backends (observed returning immediately for
        still-running single-fusion programs); an actual transfer is."""
        if self._pending_overflow is not None:
            np.asarray(self._pending_overflow)

    def flush_overflow(self) -> bool:
        """Fetch and clear overflow flags accumulated by unchecked batch
        renders. True means at least one rendered frame silently dropped
        triangles and the run should be treated as invalid."""
        if self._pending_overflow is None:
            return False
        flags = np.asarray(self._pending_overflow)
        self._pending_overflow = None
        return bool(flags.any())

    def render(self, uniforms: FrameUniforms) -> np.ndarray:
        """Render one frame to a host (H,W,4) uint8 RGBA array — the
        'present' step (reference present_pass collapses to a device_get,
        SURVEY.md D7)."""
        rgba = self._checked(uniforms)[0]
        return np.asarray(jax.device_get(rgba))

    def render_blocked(self, uniforms: FrameUniforms):
        """Render and block until the device finishes, returning the device
        framebuffer. Used by the benchmark harness to measure true per-frame
        latency (the reference's custom path never fences — BASELINE.md
        documents why we do). The fence is a tiny device_get:
        ``block_until_ready`` is not reliable through a tunneled backend."""
        out = self._checked(uniforms)
        if len(out) < 3:
            # xla backend: no overflow flags were fetched by _checked, so
            # fetch one pixel to force completion.
            np.asarray(out[0][0, 0])
        return out[0]
