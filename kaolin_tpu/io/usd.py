"""USD scene I/O: meshes, pointclouds, voxelgrids, with time samples.

Reference: ``kaolin/io/usd.py:306-1336``. The reference requires pxr
(usd-core); this module implements a self-contained **USD** subset
writer/parser instead — stages written here are valid ``.usda``
readable by standard USD tools, and this module round-trips its own
files (plus any usda whose prims use the attribute forms emitted here).
Binary ``.usdc`` (crate) files are read transparently and written when
the target path ends in ``.usdc`` (see :mod:`kaolin_tpu.io.usdc`).
"""

import os
import re
from collections import namedtuple

import numpy as np
import jax.numpy as jnp

__all__ = [
    'Stage',
    'create_stage',
    'get_scene_paths',
    'add_mesh',
    'export_mesh',
    'export_meshes',
    'import_mesh',
    'import_meshes',
    'add_pointcloud',
    'export_pointcloud',
    'export_pointclouds',
    'import_pointcloud',
    'import_pointclouds',
    'add_voxelgrid',
    'export_voxelgrid',
    'export_voxelgrids',
    'import_voxelgrid',
    'import_voxelgrids',
    'add_material',
    'import_material',
    'get_root',
    'get_authored_time_samples',
    'get_pointcloud_scene_paths',
    'get_pointcloud_bracketing_time_samples',
]

mesh_return_type = namedtuple(
    'mesh_return_type',
    ['vertices', 'faces', 'uvs', 'face_uvs_idx', 'face_normals',
     'materials'],
    defaults=(None, None, None, None))
pointcloud_return_type = namedtuple('pointcloud_return_type',
                                    ['points', 'colors', 'normals'])


# --------------------------------------------------------------------------
# Stage: in-memory prim tree <-> usda text
# --------------------------------------------------------------------------

class _Prim:
    def __init__(self, name, type_name='Xform'):
        self.name = name
        self.type_name = type_name
        self.attrs = {}        # name -> (usd_type, value)
        self.time_attrs = {}   # name -> (usd_type, {time: value})
        self.children = {}

    def child(self, name, type_name='Xform'):
        if name not in self.children:
            self.children[name] = _Prim(name, type_name)
        return self.children[name]


class Stage:
    """A minimal USD stage over a prim tree, serialized as usda text."""

    def __init__(self, file_path, up_axis='Y'):
        self.file_path = file_path
        self.up_axis = up_axis
        self.root = _Prim('', 'Root')
        self.default_prim = None

    # --- prim access -----------------------------------------------------
    def define_prim(self, scene_path, type_name='Xform'):
        parts = [p for p in scene_path.split('/') if p]
        prim = self.root
        for i, p in enumerate(parts):
            prim = prim.child(p, type_name if i == len(parts) - 1
                              else 'Xform')
        if self.default_prim is None and parts:
            self.default_prim = parts[0]
        if type_name is not None:
            prim.type_name = type_name
        return prim

    def get_prim(self, scene_path):
        parts = [p for p in scene_path.split('/') if p]
        prim = self.root
        for p in parts:
            if p not in prim.children:
                return None
            prim = prim.children[p]
        return prim

    def walk(self):
        def rec(prim, path):
            for name, child in prim.children.items():
                cpath = path + '/' + name
                yield cpath, child
                yield from rec(child, cpath)
        yield from rec(self.root, '')

    # --- save / load -----------------------------------------------------
    def save(self):
        if os.path.splitext(str(self.file_path))[1].lower() == '.usdc':
            from . import usdc
            return usdc.write_usdc(self)
        lines = ['#usda 1.0', '(']
        if self.default_prim:
            lines.append(f'    defaultPrim = "{self.default_prim}"')
        lines.append(f'    upAxis = "{self.up_axis}"')
        lines.append(')')
        lines.append('')

        def fmt_value(usd_type, value):
            if usd_type == 'rel':
                return f'<{value}>'
            if usd_type == 'asset':
                return f'@{value}@'
            if usd_type in ('string', 'token'):
                return f'"{value}"'
            if usd_type == 'bool':
                return 'true' if value else 'false'
            if usd_type in ('int', 'float', 'double'):
                return repr(value)
            arr = np.asarray(value)
            if arr.ndim == 1:
                return '[' + ', '.join(repr(v.item()) for v in arr) + ']'
            return '[' + ', '.join(
                '(' + ', '.join(repr(c.item()) for c in row) + ')'
                for row in arr) + ']'

        def rec(prim, path, indent):
            pad = ' ' * indent
            lines.append(f'{pad}def {prim.type_name} "{prim.name}"')
            lines.append(pad + '{')
            inner = ' ' * (indent + 4)
            for name, (usd_type, value) in prim.attrs.items():
                lines.append(f'{inner}{usd_type} {name} = '
                             f'{fmt_value(usd_type, value)}')
            for name, (usd_type, samples) in prim.time_attrs.items():
                lines.append(f'{inner}{usd_type} {name}.timeSamples = {{')
                for t in sorted(samples):
                    lines.append(f'{inner}    {t}: '
                                 f'{fmt_value(usd_type, samples[t])},')
                lines.append(inner + '}')
            for child in prim.children.values():
                rec(child, path + '/' + child.name, indent + 4)
            lines.append(pad + '}')

        for child in self.root.children.values():
            rec(child, '/' + child.name, 0)
        with open(self.file_path, 'w', encoding='utf-8') as f:
            f.write('\n'.join(lines) + '\n')
        return self

    @classmethod
    def load(cls, file_path):
        with open(file_path, 'rb') as f:
            head = f.read(8)
        if head.startswith(b'PXR-USDC'):
            from . import usdc
            return usdc.read_usdc(file_path, cls)
        stage = cls(file_path)
        with open(file_path, 'r', encoding='utf-8') as f:
            text = f.read()
        m = re.search(r'defaultPrim\s*=\s*"([^"]*)"', text)
        if m:
            stage.default_prim = m.group(1)
        m = re.search(r'upAxis\s*=\s*"([^"]*)"', text)
        if m:
            stage.up_axis = m.group(1)

        tokens = text.splitlines()
        stack = [stage.root]
        i = 0
        # `def "Name"` (untyped, pxr 'over'-style scopes) and
        # `uniform token ...` qualifiers appear in pxr-written files
        prim_re = re.compile(r'\s*def(?:\s+(\w+))?\s+"([^"]+)"')
        attr_re = re.compile(
            r'\s*(?:uniform\s+|custom\s+)?([\w\[\]]+)\s+([\w:.]+)'
            r'\s*=\s*(.*)$')
        time_re = re.compile(
            r'\s*(?:uniform\s+)?([\w\[\]]+)\s+([\w:]+)\.timeSamples'
            r'\s*=\s*\{')
        sample_re = re.compile(r'\s*([\d.eE+-]+)\s*:\s*(.*?),?\s*$')

        def parse_value(usd_type, raw):
            raw = raw.strip().rstrip(',')
            if usd_type == 'rel' or raw.startswith('<'):
                # prim-path target, possibly with trailing metadata
                # parens: `rel material:binding = </path> (`
                return raw.split('>')[0].strip().lstrip('<')
            if usd_type == 'asset':
                return raw.strip('@')
            if usd_type in ('string', 'token'):
                return raw.strip('"')
            if usd_type == 'bool':
                return raw == 'true'
            if usd_type in ('int', 'float', 'double'):
                return float(raw) if usd_type != 'int' else int(raw)
            nums = re.findall(
                r'[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?', raw)
            vals = [float(n) for n in nums]
            if '(' in raw:
                # tuple array: infer the tuple arity
                first = raw[raw.index('(') + 1:raw.index(')')]
                arity = len(first.split(','))
                arr = np.asarray(vals).reshape(-1, arity)
            else:
                arr = np.asarray(vals)
            if usd_type.startswith('int'):
                arr = arr.astype(np.int64)
            return arr

        while i < len(tokens):
            line = tokens[i]
            pm = prim_re.match(line)
            if pm:
                type_name, name = pm.groups()
                type_name = type_name or 'Scope'
                prim = stack[-1].child(name, type_name)
                prim.type_name = type_name
                # skip to opening brace
                while '{' not in tokens[i]:
                    i += 1
                stack.append(prim)
                i += 1
                continue
            tm = time_re.match(line)
            if tm:
                usd_type, name = tm.groups()
                samples = {}
                i += 1
                while '}' not in tokens[i]:
                    sm = sample_re.match(tokens[i])
                    if sm:
                        t, raw = sm.groups()
                        samples[float(t)] = parse_value(usd_type, raw)
                    i += 1
                stack[-1].time_attrs[name] = (usd_type, samples)
                i += 1
                continue
            am = attr_re.match(line)
            if am and len(stack) > 1 and 'def ' not in line:
                usd_type, name, raw = am.groups()
                # attribute metadata block `= value (\n customData...\n)`
                # — strip the open paren and skip to its matching close
                # (nested dict braces inside must not pop the prim
                # stack). Only skip when the parens are UNBALANCED on
                # the attr line itself: single-line metadata like
                # `rel x = </p> (bindMaterialAs = "weaker")` is already
                # closed and must not swallow the rest of the file.
                meta = raw.rstrip().endswith('(') and '<' not in raw
                if meta:
                    raw = raw.rstrip()[:-1].rstrip()
                open_parens = (1 if meta
                               else raw.count('(') - raw.count(')')
                               if raw.startswith('<') else 0)
                if usd_type not in ('def',):
                    try:
                        stack[-1].attrs[name] = (usd_type,
                                                 parse_value(usd_type, raw))
                    except (ValueError, IndexError):
                        pass
                depth = open_parens
                while depth > 0 and i + 1 < len(tokens):
                    i += 1
                    depth += tokens[i].count('(') - tokens[i].count(')')
                i += 1
                continue
            if line.strip() == '}' and len(stack) > 1:
                stack.pop()
            i += 1
        return stage


def create_stage(file_path, up_axis='Y'):
    """Creates a new USD stage file (reference ``io/usd.py:367``)."""
    assert os.path.exists(os.path.dirname(file_path) or '.')
    stage = Stage(file_path, up_axis)
    stage.save()
    return stage


def _open(file_or_stage):
    if isinstance(file_or_stage, Stage):
        return file_or_stage
    if os.path.exists(file_or_stage) \
            and os.path.getsize(file_or_stage) > 0:
        return Stage.load(file_or_stage)
    return Stage(file_or_stage)


def get_scene_paths(file_path_or_stage, scene_path_regex=None,
                    prim_types=None):
    """Lists scene paths, optionally filtered by regex and prim types.

    Reference: ``kaolin/io/usd.py:306``.
    """
    stage = _open(file_path_or_stage)
    if scene_path_regex is None:
        scene_path_regex = '.*'
    if prim_types is not None and not isinstance(prim_types, (list, tuple)):
        prim_types = [prim_types]
    out = []
    for path, prim in stage.walk():
        if prim_types is not None and prim.type_name not in prim_types:
            continue
        if re.match(scene_path_regex, path):
            out.append(path)
    return out


# --------------------------------------------------------------------------
# meshes
# --------------------------------------------------------------------------

def add_mesh(stage, scene_path, vertices=None, faces=None, uvs=None,
             face_uvs_idx=None, face_normals=None, time=None):
    """Adds (or time-extends) a mesh prim (reference ``io/usd.py:636``)."""
    prim = stage.define_prim(scene_path, 'Mesh')
    if faces is not None:
        faces_np = np.asarray(faces)
        counts = np.full(faces_np.shape[0], faces_np.shape[1], np.int64)
        if time is None:
            prim.attrs['faceVertexCounts'] = ('int[]', counts)
            prim.attrs['faceVertexIndices'] = ('int[]', faces_np.reshape(-1))
        else:
            prim.time_attrs.setdefault(
                'faceVertexCounts', ('int[]', {}))[1][float(time)] = counts
            prim.time_attrs.setdefault(
                'faceVertexIndices',
                ('int[]', {}))[1][float(time)] = faces_np.reshape(-1)
    if vertices is not None:
        pts = np.asarray(vertices)
        if time is None:
            prim.attrs['points'] = ('point3f[]', pts)
        else:
            prim.time_attrs.setdefault(
                'points', ('point3f[]', {}))[1][float(time)] = pts
    if uvs is not None:
        uvs_np = np.asarray(uvs)
        if time is None:
            prim.attrs['primvars:st'] = ('texCoord2f[]', uvs_np)
        else:
            prim.time_attrs.setdefault(
                'primvars:st', ('texCoord2f[]', {}))[1][float(time)] = uvs_np
    if face_uvs_idx is not None:
        arr = np.asarray(face_uvs_idx).reshape(-1)
        if time is None:
            prim.attrs['primvars:st:indices'] = ('int[]', arr)
        else:
            prim.time_attrs.setdefault(
                'primvars:st:indices', ('int[]', {}))[1][float(time)] = arr
    if face_normals is not None:
        # faceVarying: one normal per face-vertex, flattened in face order
        arr = np.asarray(face_normals).reshape(-1, 3)
        if time is None:
            prim.attrs['normals'] = ('normal3f[]', arr)
        else:
            prim.time_attrs.setdefault(
                'normals', ('normal3f[]', {}))[1][float(time)] = arr
    return stage


def export_mesh(file_path, scene_path='/World/Meshes/mesh_0', vertices=None,
                faces=None, uvs=None, face_uvs_idx=None, face_normals=None,
                up_axis='Y', time=None):
    """Exports a single mesh to USD (reference ``io/usd.py:729``)."""
    stage = _open(file_path)
    stage.up_axis = up_axis
    add_mesh(stage, scene_path, vertices, faces, uvs, face_uvs_idx,
             face_normals, time=time)
    stage.save()
    return stage


def export_meshes(file_path, scene_paths=None, vertices=None, faces=None,
                  up_axis='Y', times=None):
    """Exports multiple meshes (reference ``io/usd.py``)."""
    stage = _open(file_path)
    stage.up_axis = up_axis
    n = len(vertices)
    if scene_paths is None:
        scene_paths = [f'/World/Meshes/mesh_{i}' for i in range(n)]
    if times is None:
        times = [None] * n
    for sp, v, f, t in zip(scene_paths, vertices, faces, times):
        add_mesh(stage, sp, v, f, time=t)
    stage.save()
    return stage


def _value_at(prim, name, time):
    if name in prim.attrs:
        return prim.attrs[name][1]
    if name in prim.time_attrs:
        samples = prim.time_attrs[name][1]
        if not samples:
            return None
        if time is None:
            time = sorted(samples)[0]
        # closest available sample at or before `time`
        keys = sorted(samples)
        chosen = keys[0]
        for k in keys:
            if k <= float(time):
                chosen = k
        return samples[chosen]
    return None


def import_mesh(file_path_or_stage, scene_path=None, with_materials=False,
                with_normals=False, heterogeneous_mesh_handler=None,
                time=None):
    """Imports a single mesh (reference ``io/usd.py:463``).

    Returns:
        namedtuple (vertices, faces, uvs, face_uvs_idx, face_normals,
        materials).
    """
    from . import utils as io_utils
    stage = _open(file_path_or_stage)
    if scene_path is None:
        paths = get_scene_paths(stage, prim_types='Mesh')
        if not paths:
            raise ValueError(f'no Mesh prim found in {stage.file_path}')
        scene_path = paths[0]
    prim = stage.get_prim(scene_path)
    if prim is None:
        raise ValueError(f'prim {scene_path} not found')
    pts = _value_at(prim, 'points', time)
    counts = _value_at(prim, 'faceVertexCounts', time)
    indices = _value_at(prim, 'faceVertexIndices', time)
    uvs = _value_at(prim, 'primvars:st', time)
    st_idx = _value_at(prim, 'primvars:st:indices', time)
    normals = _value_at(prim, 'normals', time) if with_normals else None
    vertices = jnp.asarray(np.asarray(pts, np.float32)) \
        if pts is not None else None
    faces = face_uvs_idx = face_normals = None
    if indices is not None and counts is not None and len(counts):
        counts_np = np.asarray(counts, np.int64)
        flat = np.asarray(indices, np.int64)
        num_verts = 0 if pts is None else len(np.asarray(pts))

        def _primvar_indices(explicit, num_values):
            """Flat per-face-vertex indices for a primvar, dispatching
            on interpolation by size (the metadata that would name it
            is not retained): explicit :indices win; faceVarying
            (one value per face-vertex) is an implicit arange; vertex
            interpolation (one value per mesh vertex) reuses the face
            vertex indices."""
            if explicit is not None:
                return np.asarray(explicit, np.int64)
            if num_values == len(flat):
                return np.arange(len(flat), dtype=np.int64)
            if num_values == num_verts and num_verts:
                return flat.copy()
            return None

        flat_uv = _primvar_indices(
            st_idx, 0 if uvs is None else len(np.asarray(uvs))) \
            if uvs is not None else None
        flat_nrm = _primvar_indices(
            None, 0 if normals is None else len(np.asarray(normals))) \
            if normals is not None else None
        if np.any(counts_np != counts_np[0]):
            if heterogeneous_mesh_handler is None:
                raise io_utils.NonHomogeneousMeshError(
                    f'Mesh at {scene_path} is non-homogeneous; pass a '
                    f'heterogeneous_mesh_handler (see kaolin_tpu.io.utils)')
            res = heterogeneous_mesh_handler(
                vertices, counts_np, flat, flat_uv, flat_nrm)
            if res is None:
                return None
            vertices, counts_np, faces_h, flat_uv, flat_nrm = res
            faces_np = np.asarray(faces_h, np.int64)
        else:
            fs = int(counts_np[0])
            faces_np = flat.reshape(-1, fs)
            if flat_uv is not None:
                flat_uv = flat_uv.reshape(-1, fs)
            if flat_nrm is not None:
                flat_nrm = flat_nrm.reshape(-1, fs)
        faces = jnp.asarray(faces_np)
        if flat_uv is not None:
            face_uvs_idx = jnp.asarray(np.asarray(flat_uv, np.int64))
        if flat_nrm is not None and normals is not None:
            nrm = np.asarray(normals, np.float32)
            face_normals = jnp.asarray(
                nrm[np.asarray(flat_nrm, np.int64).reshape(-1)].reshape(
                    faces.shape[0], faces.shape[1], 3))
    uvs_out = None if uvs is None \
        else jnp.asarray(np.asarray(uvs, np.float32))
    materials = None
    if with_materials:
        materials = []
        bindings = [prim.attrs.get('material:binding', (None, None))[1]]
        # per-face material subsets (pxr GeomSubset children)
        bindings += [child.attrs.get('material:binding', (None, None))[1]
                     for child in prim.children.values()
                     if child.type_name == 'GeomSubset']
        for binding in bindings:
            if isinstance(binding, str) and binding:
                materials.append(import_material(stage, binding))
    return mesh_return_type(vertices, faces, uvs_out, face_uvs_idx,
                            face_normals, materials)


def import_meshes(file_path_or_stage, scene_paths=None,
                  with_materials=False, with_normals=False,
                  heterogeneous_mesh_handler=None, times=None):
    """Imports multiple meshes as a list of namedtuples (reference
    ``io/usd.py:517``; meshes skipped by the handler are dropped)."""
    stage = _open(file_path_or_stage)
    if scene_paths is None:
        scene_paths = get_scene_paths(stage, prim_types='Mesh')
    if times is None:
        times = [None] * len(scene_paths)
    out = [import_mesh(stage, sp, with_materials=with_materials,
                       with_normals=with_normals,
                       heterogeneous_mesh_handler=heterogeneous_mesh_handler,
                       time=t)
           for sp, t in zip(scene_paths, times)]
    return [m for m in out if m is not None]


# --------------------------------------------------------------------------
# pointclouds
# --------------------------------------------------------------------------

def add_pointcloud(stage, scene_path, points, colors=None, normals=None,
                   time=None):
    """Adds a pointcloud prim (reference ``io/usd.py:958``)."""
    prim = stage.define_prim(scene_path, 'Points')
    pts = np.asarray(points)
    if time is None:
        prim.attrs['points'] = ('point3f[]', pts)
    else:
        prim.time_attrs.setdefault(
            'points', ('point3f[]', {}))[1][float(time)] = pts
    if colors is not None:
        arr = np.asarray(colors)
        if time is None:
            prim.attrs['primvars:displayColor'] = ('color3f[]', arr)
        else:
            prim.time_attrs.setdefault(
                'primvars:displayColor',
                ('color3f[]', {}))[1][float(time)] = arr
    if normals is not None:
        arr = np.asarray(normals)
        if time is None:
            prim.attrs['normals'] = ('normal3f[]', arr)
        else:
            prim.time_attrs.setdefault(
                'normals', ('normal3f[]', {}))[1][float(time)] = arr
    return stage


def export_pointcloud(file_path, pointcloud,
                      scene_path='/World/PointClouds/pointcloud_0',
                      colors=None, time=None):
    """Reference: ``io/usd.py:1037``."""
    stage = _open(file_path)
    add_pointcloud(stage, scene_path, pointcloud, colors=colors, time=time)
    stage.save()
    return stage


def import_pointcloud(file_path_or_stage, scene_path=None, time=None):
    """Reference: ``io/usd.py:834``. Returns (points, colors, normals).

    Reads ``Points`` prims and pointcloud ``PointInstancer`` prims (the
    reference's default pointcloud export form stores ``positions``).
    """
    stage = _open(file_path_or_stage)
    if scene_path is None:
        paths = get_pointcloud_scene_paths(stage)
        if not paths:
            raise ValueError('no pointcloud prim found')
        scene_path = paths[0]
    prim = stage.get_prim(scene_path)
    pts = _value_at(prim, 'points', time)
    if pts is None:
        pts = _value_at(prim, 'positions', time)    # PointInstancer form
    colors = _value_at(prim, 'primvars:displayColor', time)
    normals = _value_at(prim, 'normals', time)
    return pointcloud_return_type(
        jnp.asarray(np.asarray(pts, np.float32)),
        None if colors is None else jnp.asarray(np.asarray(colors,
                                                           np.float32)),
        None if normals is None else jnp.asarray(np.asarray(normals,
                                                            np.float32)))


def import_pointclouds(file_path_or_stage, scene_paths=None, times=None):
    """Imports one or more pointclouds (reference ``io/usd.py:866``).

    Returns:
        list of namedtuple (points, colors, normals).
    """
    stage = _open(file_path_or_stage)
    if scene_paths is None:
        scene_paths = get_pointcloud_scene_paths(stage)
    if times is None:
        times = [None] * len(scene_paths)
    return [import_pointcloud(stage, sp, t)
            for sp, t in zip(scene_paths, times)]


def export_pointclouds(file_path, pointclouds, scene_paths=None,
                       colors=None, times=None):
    """Exports multiple pointclouds to one stage
    (reference ``io/usd.py:1069``)."""
    if scene_paths is None:
        scene_paths = [f'/World/PointClouds/pointcloud_{i}'
                       for i in range(len(pointclouds))]
    if times is None:
        times = [None] * len(scene_paths)
    if colors is None:
        colors = [None] * len(scene_paths)
    stage = _open(file_path)
    for pc, sp, c, t in zip(pointclouds, scene_paths, colors, times):
        add_pointcloud(stage, sp, pc, colors=c, time=t)
    stage.save()
    return stage


# --------------------------------------------------------------------------
# voxelgrids
# --------------------------------------------------------------------------

def add_voxelgrid(stage, scene_path, voxelgrid, time=None):
    """Adds a voxelgrid prim as occupied indices + resolution
    (reference ``io/usd.py:1206``, PointInstancer there)."""
    prim = stage.define_prim(scene_path, 'PointInstancer')
    vg = np.asarray(voxelgrid)
    idx = np.argwhere(vg > 0.5).astype(np.int64)
    # reference-compatible metadata (io/usd.py:1253-1255)
    prim.attrs['primvars:grid_size'] = ('int', vg.shape[0])
    prim.attrs['primvars:kaolin_type'] = ('string', 'VoxelGrid')
    if time is None:
        prim.attrs['positions'] = ('point3f[]', idx.astype(np.float64))
    else:
        prim.time_attrs.setdefault(
            'positions',
            ('point3f[]', {}))[1][float(time)] = idx.astype(np.float64)
    return stage


def export_voxelgrid(file_path, voxelgrid,
                     scene_path='/World/VoxelGrids/voxelgrid_0', time=None):
    """Reference: ``io/usd.py:1278``."""
    stage = _open(file_path)
    add_voxelgrid(stage, scene_path, voxelgrid, time=time)
    stage.save()
    return stage


def import_voxelgrid(file_path_or_stage, scene_path=None, time=None):
    """Reference: ``io/usd.py:1113``. Returns a bool (D, D, D) grid."""
    stage = _open(file_path_or_stage)
    if scene_path is None:
        paths = get_scene_paths(stage, prim_types='PointInstancer')
        if not paths:
            raise ValueError('no PointInstancer prim found')
        scene_path = paths[0]
    prim = stage.get_prim(scene_path)
    pos = _value_at(prim, 'positions', time)
    idx = np.round(np.asarray(pos)).astype(np.int64) \
        if pos is not None and len(pos) else np.zeros((0, 3), np.int64)
    if 'primvars:grid_size' in prim.attrs:
        res = int(prim.attrs['primvars:grid_size'][1])
    elif 'resolution' in prim.attrs:          # files written before the
        res = int(prim.attrs['resolution'][1])  # grid_size convention
    else:
        # reference fallback: largest occupied axis (io/usd.py:1148)
        res = int(idx.max()) + 1 if len(idx) else 0
    grid = np.zeros((res, res, res), bool)
    if len(idx):
        grid[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    return jnp.asarray(grid)


def import_voxelgrids(file_path_or_stage, scene_paths=None, times=None):
    """Imports one or more voxelgrids (reference ``io/usd.py:1143``)."""
    stage = _open(file_path_or_stage)
    if scene_paths is None:
        scene_paths = [p for p in get_scene_paths(
            stage, prim_types='PointInstancer') if _is_voxelgrid(stage, p)]
    if times is None:
        times = [None] * len(scene_paths)
    return [import_voxelgrid(stage, sp, t)
            for sp, t in zip(scene_paths, times)]


def export_voxelgrids(file_path, voxelgrids, scene_paths=None, times=None):
    """Exports multiple voxelgrids to one stage
    (reference ``io/usd.py:1305``)."""
    if scene_paths is None:
        scene_paths = [f'/World/VoxelGrids/voxelgrid_{i}'
                       for i in range(len(voxelgrids))]
    if times is None:
        times = [None] * len(scene_paths)
    stage = _open(file_path)
    for vg, sp, t in zip(voxelgrids, scene_paths, times):
        add_voxelgrid(stage, sp, vg, time=t)
    stage.save()
    return stage


# --------------------------------------------------------------------------
# stage-level helpers
# --------------------------------------------------------------------------

def _is_voxelgrid(stage, scene_path):
    prim = stage.get_prim(scene_path)
    return (prim is not None and
            prim.attrs.get('primvars:kaolin_type', (None, None))[1]
            == 'VoxelGrid')


def get_root(file_path_or_stage):
    """Root prim scene path (reference ``io/usd.py:264``)."""
    _open(file_path_or_stage)           # validate the file parses
    return '/'


def get_pointcloud_scene_paths(file_path_or_stage):
    """All pointcloud scene paths: ``Points`` prims plus
    ``PointInstancer`` prims that are not kaolin voxelgrids
    (reference ``io/usd.py:290``)."""
    stage = _open(file_path_or_stage)
    points = get_scene_paths(stage, prim_types='Points')
    instancers = [p for p in get_scene_paths(
        stage, prim_types='PointInstancer') if not _is_voxelgrid(stage, p)]
    return points + instancers


def get_authored_time_samples(file_path_or_stage):
    """All authored time samples across every prim, sorted
    (reference ``io/usd.py:347``)."""
    stage = _open(file_path_or_stage)
    times = set()
    for _, prim in stage.walk():
        for _, (_, samples) in prim.time_attrs.items():
            times.update(samples)
    return sorted(times)


def get_pointcloud_bracketing_time_samples(stage, scene_path, target_time):
    """Two authored times bracketing ``target_time`` for the prim's
    points attribute (reference ``io/usd.py:932``)."""
    prim = _open(stage).get_prim(scene_path)
    samples = sorted(prim.time_attrs.get('points', (None, {}))[1])
    if not samples:
        return (target_time, target_time)
    lo = max((t for t in samples if t <= target_time), default=samples[0])
    hi = min((t for t in samples if t >= target_time), default=samples[-1])
    return (lo, hi)


# --------------------------------------------------------------------------
# materials
# --------------------------------------------------------------------------

def add_material(file_path, scene_path, material, texture_dir='.',
                 bind_to=None):
    """Writes a PBRMaterial as a Shader prim; textures as side PNGs.

    Reference: the pxr UsdShade export in ``io/materials.py``. Pass
    ``bind_to`` (a mesh scene path, or a list of them — the reference's
    ``bound_prims``) to author a ``material:binding`` rel on those prims
    so ``import_mesh(with_materials=True)`` finds it.
    """
    from PIL import Image
    from .materials import (_VALUE_FIELDS, _TEXTURE_FIELDS,
                            _COLORSPACE_FIELDS)
    stage = _open(file_path)
    file_path = str(stage.file_path)
    prim = stage.define_prim(scene_path, 'Shader')
    if bind_to is not None:
        targets = bind_to if isinstance(bind_to, (list, tuple)) \
            else [bind_to]
        for target in targets:
            mesh_prim = stage.get_prim(target) or stage.define_prim(target)
            mesh_prim.attrs['material:binding'] = ('rel', scene_path)
    prim.attrs['info:id'] = ('string', 'UsdPreviewSurface')
    for field in _VALUE_FIELDS:
        val = getattr(material, field)
        if isinstance(val, tuple):
            prim.attrs[field] = ('float[]', np.asarray(val))
        else:
            prim.attrs[field] = ('float', float(val))
    prim.attrs['is_specular_workflow'] = ('bool',
                                          material.is_specular_workflow)
    out_dir = os.path.join(os.path.dirname(file_path), texture_dir)
    os.makedirs(out_dir, exist_ok=True)
    for field, cs_field in zip(_TEXTURE_FIELDS, _COLORSPACE_FIELDS):
        tex = getattr(material, field)
        if tex is None:
            continue
        arr = np.asarray(tex)
        if field == 'normals_texture':      # stored in [-1, 1]
            arr = arr * 0.5 + 0.5
        if arr.ndim == 3 and arr.shape[0] in (1, 3):
            arr = np.transpose(arr, (1, 2, 0))
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        img = Image.fromarray(
            np.clip(arr * 255., 0, 255).astype(np.uint8))
        name = f"{scene_path.strip('/').replace('/', '_')}_{field}.png"
        img.save(os.path.join(out_dir, name))
        prim.attrs[f'{field}_file'] = (
            'string', os.path.join(texture_dir, name))
        colorspace = getattr(material, cs_field, 'auto')
        if colorspace != 'auto':
            prim.attrs[f'{field}_colorspace'] = ('string', colorspace)
    stage.save()
    return stage


# UsdPreviewSurface input name -> (PBRMaterial value field, texture field)
_PREVIEW_SURFACE_INPUTS = {
    'diffuseColor': ('diffuse_color', 'diffuse_texture'),
    'roughness': ('roughness_value', 'roughness_texture'),
    'metallic': ('metallic_value', 'metallic_texture'),
    'clearcoat': ('clearcoat_value', 'clearcoat_texture'),
    'clearcoatRoughness': ('clearcoat_roughness_value',
                           'clearcoat_roughness_texture'),
    'opacity': ('opacity_value', 'opacity_texture'),
    'opacityThreshold': ('opacity_threshold', None),
    'ior': ('ior_value', 'ior_texture'),
    'specularColor': ('specular_color', 'specular_texture'),
    'normal': (None, 'normals_texture'),
    'displacement': ('displacement_value', 'displacement_texture'),
}


def _load_texture(base_dir, rel):
    from PIL import Image
    arr = np.asarray(Image.open(os.path.join(base_dir, rel)))
    arr = arr.astype(np.float32) / 255.
    return jnp.asarray(arr[None] if arr.ndim == 2
                       else np.transpose(arr, (2, 0, 1)))


def _read_preview_surface(stage, mat_path, shader, params, base_dir, time):
    """Reads a pxr-layout UsdPreviewSurface Shader prim (the default
    MaterialManager reader; reference ``io/materials.py:98-240``)."""
    from .materials import PBRMaterial, _TEXTURE_FIELDS, _COLORSPACE_FIELDS
    cs_of = dict(zip(_TEXTURE_FIELDS, _COLORSPACE_FIELDS))
    kwargs = {}
    for usd_name, (val_field, tex_field) in _PREVIEW_SURFACE_INPUTS.items():
        conn = params.get(f'inputs:{usd_name}.connect')
        if conn is not None and tex_field is not None:
            # resolve the connected UsdUVTexture's file asset; the
            # connect target's output ('outputs:r'/'g'/'b') selects a
            # single channel, 'outputs:rgb' keeps all three
            parts = str(conn).split('.')
            tex_prim = stage.get_prim(parts[0])
            if tex_prim is not None:
                fattr = tex_prim.attrs.get('inputs:file')
                if fattr is not None:
                    tex = _load_texture(base_dir, str(fattr[1]))
                    out = parts[-1].split(':')[-1] if len(parts) > 1 else ''
                    if out in ('r', 'g', 'b') and tex.shape[0] >= 3:
                        c = 'rgb'.index(out)
                        tex = tex[c:c + 1]
                    if tex_field == 'normals_texture':
                        tex = tex * 2. - 1.
                    kwargs[tex_field] = tex
                    # colorspace token authored on the texture shader
                    # (reference _add_texture_shader, materials.py:592)
                    cs = tex_prim.attrs.get('inputs:colorspace') \
                        or tex_prim.attrs.get('inputs:sourceColorSpace')
                    if cs is not None:
                        kwargs[cs_of[tex_field]] = str(cs[1])
            continue
        if val_field is None:
            continue
        attr = params.get(f'inputs:{usd_name}')
        if attr is not None:
            v = np.asarray(attr).reshape(-1)
            if v.size == 0:
                continue
            kwargs[val_field] = tuple(v.tolist()) if v.size > 1 \
                else float(v[0])
    spec = bool(params.get('inputs:useSpecularWorkflow', 0))
    name = mat_path.strip('/').split('/')[-1]
    return PBRMaterial(name=name, is_specular_workflow=spec, **kwargs)


def _import_pxr_material(stage, scene_path, prim, time=None, base_dir=None):
    """Imports a ``Material`` prim with a nested Shader (pxr layout),
    dispatching on the shader's ``info:id`` via the MaterialManager
    registry (UsdPreviewSurface built in)."""
    from .materials import MaterialManager, MaterialNotSupportedError
    if base_dir is None:
        base_dir = os.path.dirname(str(stage.file_path))
    for child_name, shader in prim.children.items():
        if shader.type_name != 'Shader':
            continue
        info_id = str(shader.attrs.get('info:id', (None, ''))[1])
        if not info_id or info_id == 'UsdUVTexture':
            continue
        params = {k: v for k, (_, v) in shader.attrs.items()}
        if info_id == 'UsdPreviewSurface':
            return _read_preview_surface(stage, scene_path, shader,
                                         params, base_dir, time)
        reader = MaterialManager.get_usd_reader(info_id)
        if reader is not None:
            return reader(params, base_dir, time)
        raise MaterialNotSupportedError(
            f'no reader registered for shader {info_id!r} at '
            f'{scene_path}')
    raise ValueError(f'no surface Shader child under {scene_path}')


def import_material(file_path, scene_path, texture_path=None, time=None):
    """Reads a material: either this module's flat Shader layout
    (:func:`add_material`) or a pxr ``Material``/``Shader`` tree with
    UsdPreviewSurface + UsdUVTexture prims (shader readers pluggable
    via ``kaolin_tpu.io.materials.MaterialManager``).

    Args:
        texture_path (str, optional): directory for relative texture
            references (default: the USD file's directory).
    """
    stage = _open(file_path)
    return _import_material_from_stage(stage, scene_path,
                                       texture_path=texture_path,
                                       time=time)


def _import_material_from_stage(stage, scene_path, texture_path=None,
                                time=None):
    """Stage-level material import (``MaterialManager.read_usd_material``
    entry — reference ``io/materials.py:176``)."""
    from .materials import (PBRMaterial, _VALUE_FIELDS, _TEXTURE_FIELDS,
                            _COLORSPACE_FIELDS)
    file_path = str(stage.file_path)
    base_dir = os.path.dirname(file_path)
    if texture_path is not None:
        base_dir = texture_path if os.path.isabs(texture_path) \
            else os.path.join(base_dir, texture_path)
    prim = stage.get_prim(scene_path)
    if prim is None:
        raise ValueError(f'prim {scene_path} not found')
    if prim.type_name == 'Material' or (
            prim.children and 'info:id' not in prim.attrs):
        return _import_pxr_material(stage, scene_path, prim, time,
                                    base_dir=base_dir)
    kwargs = {}
    for field in _VALUE_FIELDS:
        if field in prim.attrs:
            v = prim.attrs[field][1]
            kwargs[field] = tuple(np.asarray(v).tolist()) \
                if prim.attrs[field][0] == 'float[]' else float(v)
    spec = bool(prim.attrs.get('is_specular_workflow', ('bool', False))[1])
    for field, cs_field in zip(_TEXTURE_FIELDS, _COLORSPACE_FIELDS):
        key = f'{field}_file'
        if key in prim.attrs:
            tex = _load_texture(base_dir, prim.attrs[key][1])
            if field == 'normals_texture':
                tex = tex * 2. - 1.
            kwargs[field] = tex
            cs = prim.attrs.get(f'{field}_colorspace')
            if cs is not None:
                kwargs[cs_field] = str(cs[1])
    name = scene_path.strip('/').split('/')[-1]
    return PBRMaterial(name=name, is_specular_workflow=spec, **kwargs)
