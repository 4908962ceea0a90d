"""Hardware A/B for the fused Pallas front end (backends/pallas_front).

Compiles the fused kernel on TPU, checks bit-identity of the full frame vs
the XLA front-end chain, and times render_frame_micro both ways at the
mega-scene scale. One JSON line per measurement on stdout.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, iters=20):
    """Per-call ms over ``iters`` dispatches closed by ONE real device
    fetch, minus the fetch's measured round trip (block_until_ready is a
    no-op on the tunneled backend — see bench/profiling._fence)."""
    out = fn()
    _fence(out)
    t0 = time.perf_counter()
    _fence(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _fence(out)
    return max(time.perf_counter() - t0 - rtt, 0.0) / iters * 1e3


def _fence(out):
    import jax
    import jax.numpy as jnp
    leaf = next(
        l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")
    )
    x = jnp.ravel(leaf)[:1]
    if jnp.iscomplexobj(x):
        x = jnp.real(x)
    jax.device_get(x)


def jax_block(out):
    _fence(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="San_Miguel/san-miguel-low-poly.obj")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from compute_renderer_tpu.backends import tpu
    from compute_renderer_tpu.core.camera import Camera
    from compute_renderer_tpu.core.effects import EffectUniform
    from compute_renderer_tpu.io import procedural

    mesh = procedural.make_model(args.model)
    W, H = args.width, args.height
    cam = Camera.first_person([13.57, 2.63, 10.24], aspect=W / H)
    u = cam.uniform()
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    common_args = (
        jnp.asarray(mesh.positions),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        tri,
        jnp.asarray(u.view_proj),
        jnp.asarray(u.view_position),
        jnp.asarray(np.array([[0.0, 60.0, 0.0]], np.float32)),
        jnp.asarray(np.array([[1.0, 0.95, 0.9]], np.float32)),
        jnp.asarray(np.array([1.0], np.float32)),
        jnp.asarray(EffectUniform().as_array()),
    )

    def run(front):
        return tpu.render_frame_micro(
            *common_args, width=W, height=H,
            use_pallas_front=front)

    out_f = run(True)
    jax_block(out_f)
    print(json.dumps({"stage": "fused_front_compiled", "ok": True}))
    sys.stdout.flush()
    out_x = run(False)
    jax_block(out_x)

    a = np.asarray(out_f[0])
    b = np.asarray(out_x[0])
    ndiff = int((a != b).any(axis=-1).sum())
    print(json.dumps({"stage": "parity", "pixels_diff": ndiff,
                      "bitwise": ndiff == 0}))
    sys.stdout.flush()

    t_fused = _timeit(lambda: run(True), iters=args.iters)
    t_xla = _timeit(lambda: run(False), iters=args.iters)
    print(json.dumps({
        "stage": "timing", "tris": int(mesh.indices.size // 3),
        "ms_fused_front": round(t_fused, 3),
        "ms_xla_front": round(t_xla, 3),
        "saved_ms": round(t_xla - t_fused, 3),
    }))


if __name__ == "__main__":
    main()
