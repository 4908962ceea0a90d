"""Hardware A/B: fused texf kernels vs the round-3 deferred texturing tail.

Round-3 suite rows put the deferred tail's cost in plain sight: 67 ms for a
36k-tri textured frame vs 4.1 ms plain (the resolve/sample gathers), and
160 ms for the 1M-tri textured row. The round-4 fused mode interpolates
uv/kd/TextureInfo/diff/spec in-kernel and leaves the XLA tail one texel
fetch (packed to 1 gather element per tap when the atlas is u8-exact).
This script times both modes on the suite's texture scenes:

  structured_tex (~36k tris, tile path): nearest + bilinear, each mode
  structured (~1M tris, micro path) + textures: nearest, each mode

Verdict targets (round-3 VERDICT item 1): structured-tex <= 12 ms,
textured mega <= 60 ms.

    python scripts/ab_tex_fused.py [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import tpu
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io.textures import pack_pool_u8

    results = {}

    def run_scene(label, model, tris_hint, filters):
        config = SceneConfig(
            model_path=model,
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON,
                position=(13.566635, 4.0, 24.0),
            ),
            enable_textures=True,
        )
        scene = Scene.from_config(config, W, H)
        mesh = scene.mesh
        u = scene.update(0.016)
        argsj = (
            jnp.asarray(mesh.positions), jnp.asarray(mesh.normals),
            jnp.asarray(mesh.uvs),
            jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
            jnp.asarray(u.view_proj),
            jnp.asarray(u.view_position).astype(F32),
            jnp.asarray(u.light_world_pos).astype(F32),
            jnp.asarray(u.light_color).astype(F32),
            jnp.asarray(u.light_intensity).astype(F32),
            jnp.asarray(u.effect),
        )
        kw = dict(width=W, height=H, effect_kind=0,
                  face_kd=(jnp.asarray(mesh.face_kd)
                           if mesh.face_kd is not None else None),
                  face_tex=jnp.asarray(mesh.face_tex),
                  texels=jnp.asarray(mesh.texels),
                  tex_table=jnp.asarray(mesh.tex_table))
        packed = pack_pool_u8(mesh.texels)
        packed_j = None if packed is None else jnp.asarray(packed)
        results[f"{label}_tris"] = int(mesh.indices.shape[0] // 3)
        results[f"{label}_packed_pool"] = packed is not None
        print(json.dumps({"scene": label,
                          "tris": results[f"{label}_tris"],
                          "packed_pool": packed is not None}), flush=True)

        ref = None
        for filt in filters:
            variants = [
                ("deferred", dict(tex_mode="deferred")),
                ("fused", dict()),
            ]
            if packed_j is not None:
                variants.append(
                    ("fused_packed", dict(texels_packed=packed_j)))
            for vname, vkw in variants:
                name = f"{label}_{filt}_{vname}"

                def f(vkw=vkw, filt=filt):
                    return tpu.render_frame(
                        *argsj, tex_filter=filt, **vkw, **kw)

                try:
                    out = jax.block_until_ready(f())
                except Exception as e:
                    print(json.dumps({"stage": name,
                                      "error": f"{type(e).__name__}: {e}"[:300]}),
                          flush=True)
                    continue
                img = np.asarray(out[0])
                if ref is None or vname == "deferred":
                    ref = img
                    mism = 0
                else:
                    d = np.abs(img.astype(int) - ref.astype(int))
                    mism = int((d > 1).sum())
                t, _ = _timeit(f, iters=args.iters)
                results[name] = round(float(t), 3)
                print(json.dumps({"stage": name, "ms": results[name],
                                  "px_gt1lsb_vs_deferred": mism}),
                      flush=True)

    from compute_renderer_tpu.io.objgen import (
        STRUCTURED_NAME, STRUCTURED_TEX_NAME,
    )

    run_scene("tex36k", STRUCTURED_TEX_NAME, 36322,
              ["nearest", "bilinear"])
    run_scene("tex1m", STRUCTURED_NAME, 1023442, ["nearest"])

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
