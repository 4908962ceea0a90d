"""Model: the loaded-geometry wrapper (reference src/model.rs:10-14).

Resolution order for a model path:

1. a real file on disk (via asset search paths) -> OBJ loader (native C++
   parser when available, pure-Python fallback);
2. a registered procedural stand-in (the reference's LFS benchmark assets are
   not shipped; see io/procedural.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from compute_renderer_tpu.core.types import Mesh
from compute_renderer_tpu.io import procedural
from compute_renderer_tpu.io.assets import get_asset_path


@dataclass
class Model:
    mesh: Mesh
    source: str

    @staticmethod
    def load(path: str, materials: bool = False,
             textures: bool = False) -> "Model":
        """``materials=True`` (extension) resolves MTL diffuse colors into
        ``Mesh.face_kd``; ``textures=True`` (implies materials)
        additionally decodes map_Kd images into the flat atlas
        (``Mesh.face_tex``/``texels``/``tex_table``). Both ride the native
        parser when its material ABI is available (usemtl slots recorded
        in C++, MTL resolution vectorized in Python), falling back to the
        pure-Python loader — the two are parity-pinned by
        tests/test_native.py."""
        materials = materials or textures
        from compute_renderer_tpu.io import objgen

        ensure = {
            objgen.STRUCTURED_NAME: objgen.ensure_structured_scene,
            objgen.STRUCTURED_TEX_NAME: objgen.ensure_textured_scene,
        }.get(path)
        try:
            resolved = get_asset_path(path)
            if ensure is not None:
                # Synthesized benchmark asset found on disk: run ensure_*
                # against ITS directory anyway — it refreshes the companion
                # MTL / map_Kd images an older synthesis may lack (cheap
                # no-op when everything is present), so the materials/
                # textures suite rows can't silently degrade to plain
                # renders behind a stale cache.
                resolved = ensure(resolved.parent)
        except FileNotFoundError:
            if ensure is not None:
                # Synthesized-on-first-use (cached on disk): resolving it
                # here means EVERY loader path — CLI --model-path, viewer,
                # suite — gets the scene, and merely enumerating configs
                # never writes 80 MB.
                resolved = ensure()
            elif path in procedural.PROCEDURAL_MODELS:
                return Model(mesh=procedural.make_model(path),
                             source=f"procedural:{path}")
            else:
                raise
        # Prefer the native parser; fall back to pure Python. Materials/
        # textures ride the native path too (a stale pre-material-ABI .so
        # falls back) — the ~1M-tri structured suite rows would otherwise
        # pay the pure-Python parse just to resolve usemtl runs.
        try:
            from compute_renderer_tpu.io import native

            if native.available() and (
                not materials or native.supports_materials()
            ):
                return Model(
                    mesh=native.load_obj(resolved, materials=materials,
                                         textures=textures),
                    source=str(resolved),
                )
        except ImportError:
            pass
        from compute_renderer_tpu.io.obj import load_obj

        return Model(mesh=load_obj(resolved, materials=materials,
                                   textures=textures),
                     source=str(resolved))

    @property
    def num_triangles(self) -> int:
        return self.mesh.num_triangles
