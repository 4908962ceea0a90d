"""Large-OBJ loader benchmark: native C++ parser vs pure-Python oracle.

Generates a San-Miguel-scale OBJ on disk (~1M triangles, ~100 MB of text —
matching the triangle class of the reference's heaviest asset, see
/root/reference/src/model.rs:17-40 and SURVEY.md §2.1 H6), verifies the
native parser's output is bit-identical to the Python oracle, and reports
parse times for BASELINE.md.

Usage: python scripts/bench_obj_parse.py [--tris 1000000] [--keep PATH]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from compute_renderer_tpu.io import procedural
from compute_renderer_tpu.io.obj import load_obj
from compute_renderer_tpu.io import native


def write_obj(mesh, path: Path) -> float:
    """Serialize a Mesh to OBJ text (v/vt/vn + f i/i/i). Returns MB written."""
    tri = mesh.indices.reshape(-1, 3)
    with open(path, "w") as f:
        np.savetxt(f, mesh.positions, fmt="v %.9g %.9g %.9g")
        np.savetxt(f, mesh.uvs, fmt="vt %.9g %.9g")
        np.savetxt(f, mesh.normals, fmt="vn %.9g %.9g %.9g")
        ones = tri + 1
        # (T, 3) -> (T, 9) = [a a a b b b c c c]: each corner's index used
        # for v/vt/vn. (An earlier version added a fancy-index on top of the
        # repeat, collapsing every face to its first vertex — degenerate
        # faces that made the parse benchmark unrepresentative.)
        np.savetxt(
            f, np.repeat(ones, 3, axis=1),
            fmt="f %d/%d/%d %d/%d/%d %d/%d/%d",
        )
    return path.stat().st_size / 1e6


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--keep", type=str, default="")
    args = ap.parse_args()

    # uv_sphere triangle count = 2 * nu * (nv - 1); pick nu/nv to hit target.
    nv = 512
    nu = max(4, args.tris // (2 * (nv - 1)))
    mesh = procedural.uv_sphere(nu=nu, nv=nv, radius=8.0)
    print(f"generated mesh: {mesh.num_triangles} tris, "
          f"{mesh.positions.shape[0]} verts")

    if args.keep:
        path = Path(args.keep)
        tmp = None
    else:
        tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False)
        path = Path(tmp.name)
    t0 = time.time()
    mb = write_obj(mesh, path)
    print(f"wrote {mb:.1f} MB OBJ in {time.time()-t0:.1f} s -> {path}")

    if native.available():
        t0 = time.time()
        nat = native.load_obj(path)
        t_nat = time.time() - t0
        print(f"native parse:  {t_nat:.2f} s "
              f"({mb / t_nat:.0f} MB/s, {nat.num_triangles/t_nat/1e6:.2f} Mtri/s)")
    else:
        print("native parser unavailable (run make -C compute_renderer_tpu/native)")
        nat, t_nat = None, float("nan")

    t0 = time.time()
    py = load_obj(path)
    t_py = time.time() - t0
    print(f"python parse:  {t_py:.2f} s ({mb / t_py:.1f} MB/s)")

    ok = True
    if nat is not None:
        for field in ("indices", "positions", "normals", "uvs"):
            a, b = getattr(py, field), getattr(nat, field)
            if not np.array_equal(a, b):
                print(f"MISMATCH in {field}")
                ok = False
        if ok:
            print(f"parity: native == python oracle (bit-identical), "
                  f"speedup {t_py / t_nat:.1f}x")

    print(json.dumps({
        "tris": int(py.num_triangles), "obj_mb": round(mb, 1),
        "native_parse_s": round(t_nat, 2), "python_parse_s": round(t_py, 2),
        "speedup": round(t_py / t_nat, 1) if nat is not None else None,
        "parity": ok,
    }))
    if tmp is not None:
        path.unlink(missing_ok=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
