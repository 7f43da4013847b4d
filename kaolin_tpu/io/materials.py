"""Material model: PBR materials with USD-Preview-Surface-style parameters.

Reference: ``kaolin/io/materials.py:36-763``. The pxr-backed USD shader
readers are replaced by a self-contained USDA text round-trip (see
:mod:`kaolin_tpu.io.usd`); texture I/O uses PIL.
"""

import os

import numpy as np
import jax.numpy as jnp

__all__ = [
    'MaterialError',
    'MaterialLoadError',
    'MaterialFileError',
    'MaterialNotFoundError',
    'MaterialNotSupportedError',
    'MaterialWriteError',
    'MaterialManager',
    'Material',
    'PBRMaterial',
]


class MaterialError(Exception):
    pass


class MaterialLoadError(MaterialError):
    pass


class MaterialFileError(MaterialError):
    pass


class MaterialNotFoundError(MaterialError):
    pass


class Material:
    """Abstract material base (reference ``materials.py:226``)."""

    def __init__(self, name=None):
        self.material_name = name or ''


_VALUE_FIELDS = {
    'diffuse_color': (0.5, 0.5, 0.5),
    'roughness_value': 0.5,
    'metallic_value': 0.,
    'clearcoat_value': 0.,
    'clearcoat_roughness_value': 0.01,
    'opacity_value': 1.0,
    'opacity_threshold': 0.,
    'ior_value': 1.5,
    'specular_color': (0., 0., 0.),
    'displacement_value': 0.,
}

_TEXTURE_FIELDS = [
    'diffuse_texture', 'roughness_texture', 'metallic_texture',
    'clearcoat_texture', 'clearcoat_roughness_texture', 'opacity_texture',
    'ior_texture', 'specular_texture', 'normals_texture',
    'displacement_texture',
]


class PBRMaterial(Material):
    """Physically-based material (USD Preview Surface parameter set).

    Reference: ``kaolin/io/materials.py:248``. Value fields default as in
    the reference; texture fields are (C, H, W) arrays or None.
    """

    def __init__(self, name='', is_specular_workflow=False, **kwargs):
        super().__init__(name)
        self.is_specular_workflow = is_specular_workflow
        for field, default in _VALUE_FIELDS.items():
            val = kwargs.pop(field, default)
            if isinstance(val, (tuple, list)):
                val = tuple(float(v) for v in val)
            elif val is not None:
                val = float(val)
            setattr(self, field, val)
        for field in _TEXTURE_FIELDS:
            setattr(self, field, kwargs.pop(field, None))
        if kwargs:
            raise TypeError(f"PBRMaterial got unexpected arguments "
                            f"{sorted(kwargs)}")

    # --- serialization ---------------------------------------------------
    def to_dict(self):
        out = {'material_name': self.material_name,
               'is_specular_workflow': self.is_specular_workflow}
        for field in _VALUE_FIELDS:
            out[field] = getattr(self, field)
        for field in _TEXTURE_FIELDS:
            tex = getattr(self, field)
            out[field] = None if tex is None else np.asarray(tex)
        return out

    @classmethod
    def from_dict(cls, d):
        d = dict(d)
        name = d.pop('material_name', '')
        spec = d.pop('is_specular_workflow', False)
        kwargs = {}
        for field in _VALUE_FIELDS:
            if field in d:
                kwargs[field] = d.pop(field)
        for field in _TEXTURE_FIELDS:
            tex = d.pop(field, None)
            if tex is not None:
                tex = jnp.asarray(tex)
            kwargs[field] = tex
        return cls(name=name, is_specular_workflow=spec, **kwargs)

    def write_to_usd(self, file_path, scene_path, texture_dir='.'):
        """Appends this material to a USDA file (see
        :func:`kaolin_tpu.io.usd.add_material`)."""
        from . import usd
        return usd.add_material(file_path, scene_path, self,
                                texture_dir=texture_dir)

    @classmethod
    def read_from_usd(cls, file_path, scene_path):
        from . import usd
        return usd.import_material(file_path, scene_path)

    def __repr__(self):
        set_tex = [f for f in _TEXTURE_FIELDS
                   if getattr(self, f) is not None]
        return (f"PBRMaterial(name={self.material_name!r}, "
                f"diffuse_color={self.diffuse_color}, textures={set_tex})")


class MaterialNotSupportedError(MaterialError):
    pass


class MaterialWriteError(MaterialError):
    pass


class MaterialManager:
    """Registry mapping USD shader ids to reader functions
    (reference ``kaolin/io/materials.py:90``). Import paths consult it
    to decide how to decode a bound shader; new shaders register a
    ``reader_fn(params: dict, texture_path: str, time) -> Material``.
    """
    _usd_readers = {}
    _obj_reader = None

    @classmethod
    def register_usd_reader(cls, shader_name, reader_fn):
        if shader_name in cls._usd_readers:
            import warnings
            warnings.warn(f'Shader {shader_name} is already registered; '
                          'overwriting the existing reader.')
        cls._usd_readers[shader_name] = reader_fn

    @classmethod
    def get_usd_reader(cls, shader_name):
        return cls._usd_readers.get(shader_name)
