"""A/B the two remaining big binning stages (VERDICT r4 next #5).

binning_profile2 (v5e, 1M tris / 327k pairs): expand 4.0 ms and
pair_coeffs 4.5 ms dwarf the 0.44 ms sort they sit around. But the
expansion *kernel* alone measured 0.49 ms (bisect L4), so ~3.5 ms lives
in the XLA wrapper (cumsum + pad concats + casts); and pair_coeffs is a
P-sized gather PLUS a 128x32 lane transpose, either of which could
dominate. This script decomposes both on real frame data and times the
candidate reformulations:

  expand side
    ex_full        expand_cells_meta (current default)        [baseline]
    ex_cumsum      jnp.cumsum over the (T,) cover counts alone
    ex_cumsum2d    two-level blocked cumsum (lanes-major inner)
    ex_kernel      the Pallas expansion with starts precomputed
    ex_full2d      expand_cells_meta with the blocked cumsum patched in

  pair-coeff side
    pc_full        build_pair_coeffs(c64 table, sorted_tri)   [baseline]
    pc_gather      the (P,16) c64 row gather alone
    pc_post        pad+reshape+transpose alone (pre-gathered input)
    pc_colmajor    column-major scheme: gather lanes from the (16,T) c64
                   table the front end already emits (NO .T, NO 128x32
                   lane transpose; only a majors-permute copy)
    pc_colgather   the axis-1 gather alone

Equality is asserted (bitwise) for every reformulation before timing.

    python scripts/ab_expand_coeffs.py [--iters 12]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="San_Miguel/san-miguel-low-poly.obj")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from compute_renderer_tpu.backends import (
        binning, pallas_expand, pallas_front, pallas_micro,
    )
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io import procedural

    I32 = jnp.int32
    mesh = procedural.make_model(args.model)
    scene = Scene.from_config(
        SceneConfig(camera_config=CameraConfig.first_person(
            [13.57, 2.63, 10.24])), W, H)
    u = scene.update(0.016)

    pos = jnp.asarray(mesh.positions)
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    nrm = jnp.asarray(mesh.normals)
    vp = jnp.asarray(u.view_proj)
    eff = jnp.asarray(u.effect)
    pos_soa = pos[tri].transpose(1, 2, 0)
    nrm_soa = nrm[tri].transpose(1, 2, 0)

    T = int(tri.shape[0])
    ntx = (W + 127) // 128
    nty = (H + 7) // 8
    num_cells = ntx * nty * 16
    pair_cap = binning.default_pair_cap_micro(T, num_cells)
    interpret = jax.default_backend() != "tpu"

    results = {"tris": T, "pair_cap": int(pair_cap)}

    def stage(name, f, *a):
        t, out = _timeit(f, *a, iters=args.iters)
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)
        return out

    coeff, meta = jax.block_until_ready(pallas_front.front_end(
        pos_soa, nrm_soa, vp, eff, width=W, height=H, interpret=interpret))
    c, rx, x0, y0 = meta[3], meta[2], meta[0], meta[1]

    # ---------------- expand side ----------------
    def f_ex_full(c, rx, x0, y0):
        return binning.expand_cells_meta(
            c, rx, x0, y0, ntx, num_cells, pair_cap, interpret=interpret)

    cell, tri_of_pair, total = stage("ex_full", jax.jit(f_ex_full),
                                     c, rx, x0, y0)
    results["pairs"] = int(total)
    print(json.dumps({"pairs": int(total)}), flush=True)

    def f_cumsum(c):
        return jnp.cumsum(c.astype(I32))

    def cumsum2d(c):
        n = c.shape[0]
        npad = (n + 1023) // 1024 * 1024
        r = jnp.pad(c.astype(I32), (0, npad - n)).reshape(-1, 1024)
        within = jnp.cumsum(r, axis=1)
        tot = within[:, -1]
        offs = jnp.cumsum(tot) - tot
        return (within + offs[:, None]).reshape(-1)[:n]

    ref = np.asarray(jax.jit(f_cumsum)(c))
    alt = np.asarray(jax.jit(cumsum2d)(c))
    assert np.array_equal(ref, alt), "cumsum2d mismatch"
    stage("ex_cumsum", jax.jit(f_cumsum), c)
    stage("ex_cumsum2d", jax.jit(cumsum2d), c)

    # Kernel with starts precomputed outside the timed region (the tail of
    # pallas_expand.expand_cells, script-local).
    B = pallas_expand.B
    Tpad = (T + B - 1) // B * B
    starts_full = jnp.cumsum(c.astype(I32)) - c.astype(I32)
    tot_s = starts_full[-1] + c[-1]
    pad1 = lambda a, v: jnp.concatenate(
        [a.astype(I32), jnp.full((Tpad - T,), v, I32)])
    starts_p = pad1(starts_full, tot_s)
    c_p, rx_p, x0_p, y0_p = (pad1(c, 0), pad1(rx, 0), pad1(x0, 0),
                             pad1(y0, 0))
    cap_pad = (pair_cap + pallas_expand.PAD + 1023) // 1024 * 1024
    dims = jnp.array([T, ntx, num_cells, pair_cap], I32)

    def f_ex_kernel(dims, starts, cc, rxx, xx0, yy0):
        as_row = lambda a: a.reshape(1, -1)
        cell2, tri2, tot2 = pl.pallas_call(
            functools.partial(pallas_expand._expand_kernel, form="dim1"),
            grid=(Tpad // B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, B), lambda i: (0, i)),
                pl.BlockSpec((1, B), lambda i: (0, i)),
                pl.BlockSpec((1, B), lambda i: (0, i)),
                pl.BlockSpec((1, B), lambda i: (0, i)),
                pl.BlockSpec((1, B), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, cap_pad), I32),
                jax.ShapeDtypeStruct((1, cap_pad), I32),
                jax.ShapeDtypeStruct((1,), I32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(dims, as_row(starts), as_row(cc), as_row(rxx), as_row(xx0),
          as_row(yy0))
        return cell2[0, :pair_cap], tri2[0, :pair_cap], tot2[0]

    cell_k, tri_k, tot_k = jax.jit(f_ex_kernel)(
        dims, starts_p, c_p, rx_p, x0_p, y0_p)
    assert np.array_equal(np.asarray(cell), np.asarray(cell_k))
    assert np.array_equal(np.asarray(tri_of_pair), np.asarray(tri_k))
    stage("ex_kernel", jax.jit(f_ex_kernel),
          dims, starts_p, c_p, rx_p, x0_p, y0_p)

    # Full expand with the blocked cumsum patched in (what the fix would
    # ship): cumsum2d + pad + kernel, all inside one jit.
    def f_ex_full2d(c, rx, x0, y0):
        starts_all = cumsum2d(c) - c.astype(I32)
        tot = starts_all[-1] + c[-1]
        sp = jnp.concatenate(
            [starts_all, jnp.full((Tpad - T,), tot, I32)])
        z = jnp.zeros((Tpad - T,), I32)
        pz = lambda a: jnp.concatenate([a.astype(I32), z])
        return f_ex_kernel(dims, sp, pz(c), pz(rx), pz(x0), pz(y0))

    cell_2, tri_2, tot_2 = jax.jit(f_ex_full2d)(c, rx, x0, y0)
    assert np.array_equal(np.asarray(cell), np.asarray(cell_2))
    assert np.array_equal(np.asarray(tri_of_pair), np.asarray(tri_2))
    stage("ex_full2d", jax.jit(f_ex_full2d), c, rx, x0, y0)

    # ---------------- pair-coeff side ----------------
    sorted_cell, sorted_tri = jax.block_until_ready(jax.jit(
        lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True)
    )(cell, tri_of_pair))

    table = jax.block_until_ready(
        jax.jit(pallas_front.pack_table_c64)(coeff))  # (T, 16) c64

    def f_pc_full(table, sorted_tri):
        return pallas_micro.build_pair_coeffs(table, sorted_tri)

    ref_pc = stage("pc_full", jax.jit(f_pc_full), table, sorted_tri)

    def f_pc_gather(table, sorted_tri):
        return table[sorted_tri]

    gathered = stage("pc_gather", jax.jit(f_pc_gather), table, sorted_tri)

    def f_pc_post(gathered):
        g = jnp.stack([jnp.real(gathered), jnp.imag(gathered)],
                      axis=2).reshape(gathered.shape[0], -1)
        rows = pallas_micro.SB_ROWS
        chunk_rows = pallas_micro.default_chunk_rows(False, texf=False)
        chunk_pairs = (chunk_rows // rows) * 128
        P = g.shape[0]
        P_pad = ((P + 127) // 128) * 128 + chunk_pairs + 128
        g = jnp.pad(g, ((0, P_pad - P), (0, rows - g.shape[1])))
        return g.reshape(-1, 128, rows).transpose(0, 2, 1).reshape(-1, 128)

    post = stage("pc_post", jax.jit(f_pc_post), gathered)
    assert np.array_equal(np.asarray(ref_pc), np.asarray(post))

    # Column-major: the front end's native (2k, T) f32 rows pack to
    # (16, T) c64 with NO transpose; gather pairs on the lane axis; the
    # only layout op left is a majors-permute (sublane/lane axes
    # untouched).
    tabT = jax.block_until_ready(jax.jit(
        lambda co: jax.lax.complex(co[0::2, :], co[1::2, :]))(coeff))

    def f_pc_colgather(tabT, sorted_tri):
        return tabT[:, sorted_tri]

    stage("pc_colgather", jax.jit(f_pc_colgather), tabT, sorted_tri)

    rows = pallas_micro.SB_ROWS
    chunk_rows = pallas_micro.default_chunk_rows(False, texf=False)
    chunk_pairs = (chunk_rows // rows) * 128
    P = int(sorted_tri.shape[0])
    P_pad = ((P + 127) // 128) * 128 + chunk_pairs + 128

    def f_pc_colmajor(tabT, sorted_tri):
        g = tabT[:, sorted_tri]  # (16, P) c64
        gf = jnp.stack([jnp.real(g), jnp.imag(g)], axis=1).reshape(
            2 * g.shape[0], g.shape[1])  # (32, P) f32, row order preserved
        gf = jnp.pad(gf, ((0, 0), (0, P_pad - P)))
        return (gf.reshape(rows, -1, 128).transpose(1, 0, 2)
                .reshape(-1, 128))

    col = jax.jit(f_pc_colmajor)(tabT, sorted_tri)
    assert np.array_equal(np.asarray(ref_pc), np.asarray(col)), \
        "colmajor stream mismatch"
    stage("pc_colmajor", jax.jit(f_pc_colmajor), tabT, sorted_tri)

    # Barrier form: the row gather alone measures 2.5 ms and the
    # pad+transpose alone ~0, but fused they cost 4.2 — XLA fuses the
    # transpose INTO the gather's output layout and the combined access
    # pattern loses. An optimization_barrier pins the gather to its
    # natural row-major output, then the layout pass runs separately.
    def f_pc_barrier(table, sorted_tri):
        g = jax.lax.optimization_barrier(table[sorted_tri])
        return f_pc_post(g)

    bar = jax.jit(f_pc_barrier)(table, sorted_tri)
    assert np.array_equal(np.asarray(ref_pc), np.asarray(bar))
    stage("pc_barrier", jax.jit(f_pc_barrier), table, sorted_tri)

    # ---------------- whole frame with the landed switches ----------------
    from compute_renderer_tpu.backends import tpu

    uvs = jnp.asarray(mesh.uvs)
    vpos = jnp.asarray(u.view_position).astype(F32)
    lwp = jnp.asarray(u.light_world_pos).astype(F32)
    lc = jnp.asarray(u.light_color).astype(F32)
    li = jnp.asarray(u.light_intensity).astype(F32)

    def frame(**kw):
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, jnp.asarray(u.view_proj), vpos, lwp, lc,
            li, eff, width=W, height=H, pos_soa=pos_soa, nrm_soa=nrm_soa,
            effect_kind=0, **kw)

    ref_f = jax.block_until_ready(frame())
    for name, kw in [
        ("frame_default", {}),
        ("frame_cm", dict(micro_colmajor=True)),
        ("frame_cm_levers", dict(micro_colmajor=True, micro_tree=True,
                                 micro_prefetch=True)),
    ]:
        out = jax.block_until_ready(frame(**kw))
        assert np.array_equal(np.asarray(ref_f[0]), np.asarray(out[0])), name
        t, _ = _timeit(lambda: frame(**kw), iters=args.iters)
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
