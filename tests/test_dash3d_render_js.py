"""Executes the dash3d WebGL client's RENDER path (the real shipped JS
source): ``meshToFlatArrays`` / ``geometryBBox`` (geometry.js), the
``M4`` matrix helpers, and the ``Viewport.setGeometry`` / ``draw``
scene-assembly methods (render.js) — against a mocked WebGL context,
asserting GPU-buffer contents and uniform matrices against numpy twins.

The reference covers this surface with mocha unit tests plus Cypress
visual regression (tests/integration/experimental/dash3d/cypress/
integration/visual_regression.js); this image has no JS runtime, so the
functions are mechanically transliterated from SOURCE at test time by a
wider-dialect translator than test_dash3d_js.py's (assignments, method
calls, ternaries, braceless ifs, typed-array allocation, object
literals, ``this``). Any edit inside the dialect — a flipped cross
product, a changed stride, a swapped matrix index — flows into the
executed logic and breaks these assertions; syntax outside the dialect
fails loudly.
"""

import math
import pathlib
import re

import numpy as np
import pytest

STATIC = (pathlib.Path(__file__).parent.parent / 'kaolin_tpu' /
          'experimental' / 'dash3d' / 'static')


# --------------------------------------------------------------------------
# JS runtime shims
# --------------------------------------------------------------------------

class JSArr:
    """Float32Array twin: index/assign, .set, .slice, .length."""

    def __init__(self, data, dtype=np.float32):
        self.data = np.asarray(data, dtype)

    def __getitem__(self, i):
        return self.data[int(i)]

    def __setitem__(self, i, v):
        self.data[int(i)] = v

    def set(self, vals, off=0):
        vals = np.asarray([float(v) for v in vals], self.data.dtype)
        self.data[int(off):int(off) + len(vals)] = vals

    def slice(self, a, b=None):
        return JSArr(self.data[int(a):None if b is None else int(b)].copy(),
                     self.data.dtype)

    @property
    def length(self):
        return len(self.data)


class JSObj:
    """JS object: attribute bag; missing attributes read as undefined."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getattr__(self, k):
        return None


def _js_truthy(x):
    if x is None:
        return False
    if isinstance(x, (bool, int, float, np.bool_, np.integer, np.floating)):
        return bool(x)
    if isinstance(x, str):
        return len(x) > 0
    if isinstance(x, (list, JSArr)):
        return True          # JS: objects are always truthy (even empty)
    return True


def _js_length(x):
    if isinstance(x, JSArr):
        return x.length
    return len(x)


# --------------------------------------------------------------------------
# translator: the render-path JS dialect -> Python
# --------------------------------------------------------------------------

def _ternary(e):
    """``A ? B : C`` -> ``(B if A else C)`` (paren-depth aware)."""
    while '?' in e:
        q = e.index('?')
        d, i, start = 0, q - 1, 0
        while i >= 0:
            ch = e[i]
            if ch in ')]':
                d += 1
            elif ch in '([':
                if d == 0:
                    start = i + 1
                    break
                d -= 1
            elif ch == ',' and d == 0:
                start = i + 1
                break
            elif (ch == '=' and d == 0 and e[i - 1] not in '!<>='
                  and e[i:i + 2] != '=='):
                start = i + 1
                break
            i -= 1
        d, j, colon = 0, q + 1, -1
        while j < len(e):
            ch = e[j]
            if ch in '([':
                d += 1
            elif ch in ')]':
                assert d > 0, f'ternary without colon: {e!r}'
                d -= 1
            elif ch == ':' and d == 0:
                colon = j
                break
            j += 1
        assert colon > 0, f'ternary without colon: {e!r}'
        d, k, end = 0, colon + 1, len(e)
        while k < len(e):
            ch = e[k]
            if ch in '([':
                d += 1
            elif ch in ')]':
                if d == 0:
                    end = k
                    break
                d -= 1
            elif ch == ',' and d == 0:
                end = k
                break
            k += 1
        cond = e[start:q].strip()
        tv = e[q + 1:colon].strip()
        fv = e[colon + 1:end].strip()
        e = e[:start] + f'({tv} if {cond} else {fv})' + e[end:]
    return e


def _expr(e):
    e = e.strip()
    assert '`' not in e and '=>' not in e, \
        f'render-path dialect does not cover: {e!r}'
    e = re.sub(r'new Float32Array\(\s*\[', '__f32([', e)
    e = re.sub(r'new Float32Array\(', '__f32zeros(', e)
    e = e.replace('===', '==').replace('!==', '!=')
    e = e.replace('&&', ' and ').replace('||', ' or ')
    e = re.sub(r'!(?![=])', ' not ', e)
    e = re.sub(r'\bMath\.', '__math.', e)
    e = re.sub(r'\btrue\b', 'True', e)
    e = re.sub(r'\bfalse\b', 'False', e)
    e = re.sub(r'\bnull\b', 'None', e)
    e = re.sub(r'\bInfinity\b', "float('inf')", e)
    e = re.sub(r'\blen\b(?!\w)', 'len_', e)     # JS locals named len
    e = re.sub(r'((?:[\w$.]|\[[^\]]*\])+)\.length\b', r'__length(\1)', e)
    return _ternary(e)


def _obj_literal(src):
    keys = re.sub(r'([A-Za-z_]\w*)\s*:', r'"\1":', src)
    return f'__obj(**{_expr(keys)})'


def _find_assign(st):
    """Index of a top-level assignment '=' (not ==, <=, etc.)."""
    d = 0
    for i, ch in enumerate(st):
        if ch in '([':
            d += 1
        elif ch in ')]':
            d -= 1
        elif (ch == '=' and d == 0 and i > 0
              and st[i - 1] not in '=!<>+-*/'
              and (i + 1 == len(st) or st[i + 1] != '=')):
            return i
    return -1


def _simple_stmt(st, pad, out):
    """One non-compound statement -> Python line(s)."""
    st = st.strip().rstrip(';').strip()
    if not st:
        return
    m = re.match(r'(?:const|let|var)\s+(.+)$', st, re.S)
    if m:
        for part in re.split(r',\s*(?=[A-Za-z_]\w*\s*=)', m.group(1)):
            lhs, rhs = part.split('=', 1)
            rhs = rhs.strip()
            if rhs.startswith('{'):
                out.append(f'{pad}{_expr(lhs)} = {_obj_literal(rhs)}')
            else:
                out.append(f'{pad}{_expr(lhs)} = {_expr(rhs)}')
        return
    m = re.match(r'return\s*(\{.*\})$', st, re.S)
    if m:
        out.append(f'{pad}return {_obj_literal(m.group(1))}')
        return
    m = re.match(r'return\s*(.*)$', st, re.S)
    if m:
        out.append(f'{pad}return {_expr(m.group(1)) if m.group(1) else ""}'
                   .rstrip())
        return
    m = re.match(r'([\w$.\[\]]+)\.push\((\{.*\})\)$', st, re.S)
    if m:
        out.append(f'{pad}{_expr(m.group(1))}.append('
                   f'{_obj_literal(m.group(2))})')
        return
    m = re.match(r'^(.+?)\s*(\+=|-=|\*=|/=)\s*(.+)$', st, re.S)
    if m and _find_assign(m.group(1) + ' ') == -1:
        out.append(f'{pad}{_expr(m.group(1))} {m.group(2)} '
                   f'{_expr(m.group(3))}')
        return
    eq = _find_assign(st)
    if eq > 0:
        out.append(f'{pad}{_expr(st[:eq])} = {_expr(st[eq + 1:])}')
        return
    # bare expression statement (method call)
    out.append(f'{pad}{_expr(st)}')


def transliterate(name, params, body):
    """render-path JS statement dialect -> exec-able Python ``def``."""
    out = [f'def {name}({params}):' if params
           else f'def {name}():']
    indent = 1
    # statement assembly: join lines until ';', '{' or a lone '}'
    stmts, buf = [], ''
    for line in body.splitlines():
        line = line.split('//')[0].strip() if '//' in line \
            and "'" not in line else line.strip()
        if not line or line.startswith('//') or line.startswith('/*'):
            continue
        buf = (buf + ' ' + line).strip()
        if buf.endswith((';', '{', '}')):
            stmts.append(buf)
            buf = ''
    assert not buf, f'unterminated statement: {buf!r}'
    for st in stmts:
        pad = '    ' * indent
        m = re.match(
            r'for \(let (\w+) = ([\w.]+); \1 < (.+?); \1(\+\+|\s*\+=\s*\d+)\)'
            r' \{$', st)
        if m:
            step = ('' if m.group(4) == '++'
                    else f', {m.group(4).lstrip("+= ")}')
            # JS '/' is float division (nf = faces.length / 3): loop
            # bounds coerce to int exactly like a JS index would
            out.append(f'{pad}for {m.group(1)} in '
                       f'range(int({_expr(m.group(2))}),'
                       f' int({_expr(m.group(3))}){step}):')
            indent += 1
            continue
        m = re.match(r'if \((.*)\) \{$', st)
        if m:
            out.append(f'{pad}if __truthy({_expr(m.group(1))}):')
            indent += 1
            continue
        if st == '} else {':
            indent -= 1
            out.append('    ' * indent + 'else:')
            indent += 1
            continue
        if st == '}':
            indent -= 1
            assert indent >= 1, 'brace underflow'
            continue
        m = re.match(r'if \((.*?)\) ([^{].*;)$', st)
        if m:
            # braceless single-statement if
            inner = []
            _simple_stmt(m.group(2), pad + '    ', inner)
            out.append(f'{pad}if __truthy({_expr(m.group(1))}):')
            out.extend(inner)
            continue
        # split multi-';' lines at top level
        parts, d, cur = [], 0, ''
        for ch in st:
            if ch in '([{':
                d += 1
            elif ch in ')]}':
                d -= 1
            if ch == ';' and d == 0:
                parts.append(cur)
                cur = ''
            else:
                cur += ch
        assert not cur.strip(), f'statement missing terminator: {st!r}'
        for part in parts:
            _simple_stmt(part, pad, out)
    return '\n'.join(out)


def _extract_function(src, name):
    m = re.search(r'function %s\(([^)]*)\) \{' % re.escape(name), src)
    assert m, f'function {name} not found'
    return m.group(1), _balance(src, m.end())


def _extract_method(src, name):
    m = re.search(r'\n    %s\(([^)]*)\) \{' % re.escape(name), src)
    assert m, f'method {name} not found'
    return m.group(1), _balance(src, m.end())


def _extract_m4(src, name):
    m = re.search(r'%s: function \(([^)]*)\) \{' % re.escape(name), src)
    assert m, f'M4.{name} not found'
    return m.group(1), _balance(src, m.end())


def _balance(src, i0):
    depth, i = 1, i0
    while depth:
        if src[i] == '{':
            depth += 1
        elif src[i] == '}':
            depth -= 1
        i += 1
    return src[i0:i - 1]


# --------------------------------------------------------------------------
# mocked WebGL
# --------------------------------------------------------------------------

class GLMock:
    ARRAY_BUFFER = 'ARRAY_BUFFER'
    STATIC_DRAW = 'STATIC_DRAW'
    TRIANGLES = 'TRIANGLES'
    POINTS = 'POINTS'
    FLOAT = 'FLOAT'
    DEPTH_TEST = 'DEPTH_TEST'
    COLOR_BUFFER_BIT = 16
    DEPTH_BUFFER_BIT = 32

    def __init__(self):
        self._nbuf = 0
        self._bound = None
        self.buffers = {}
        self.uniforms = {}
        self.draws = []
        self.cleared = False
        self.program = None

    def createBuffer(self):
        self._nbuf += 1
        return f'buf{self._nbuf}'

    def bindBuffer(self, target, buf):
        assert target == self.ARRAY_BUFFER
        self._bound = buf

    def bufferData(self, target, data, usage):
        assert target == self.ARRAY_BUFFER and usage == self.STATIC_DRAW
        arr = data.data if isinstance(data, JSArr) else np.asarray(data)
        self.buffers[self._bound] = np.array(arr, np.float32)

    def viewport(self, x, y, w, h):
        self.vp = (x, y, w, h)

    def clearColor(self, *c):
        self.clear_color = c

    def enable(self, cap):
        pass

    def clear(self, bits):
        self.cleared = True

    def useProgram(self, p):
        self.program = p

    def getUniformLocation(self, prog, name):
        return f'{prog}:{name}'

    def getAttribLocation(self, prog, name):
        return f'{prog}:{name}'

    def uniformMatrix4fv(self, loc, transpose, mat):
        assert transpose is False
        self.uniforms[loc] = np.array(
            mat.data if isinstance(mat, JSArr) else mat, np.float32)

    def uniform3fv(self, loc, v):
        self.uniforms[loc] = np.array([float(x) for x in v], np.float32)

    def uniform1f(self, loc, v):
        self.uniforms[loc] = float(v)

    def enableVertexAttribArray(self, a):
        pass

    def vertexAttribPointer(self, *a):
        pass

    def drawArrays(self, mode, first, count):
        self.draws.append((mode, int(first), int(count)))


# --------------------------------------------------------------------------
# build the executed namespace from SOURCE
# --------------------------------------------------------------------------

@pytest.fixture(scope='module')
def client():
    geo_src = (STATIC / 'geometry.js').read_text()
    ren_src = (STATIC / 'render.js').read_text()
    ns = {
        '__np': np, '__math': math, '__truthy': _js_truthy,
        '__length': _js_length, '__obj': JSObj,
        '__f32': lambda v: JSArr([float(x) for x in v]),
        '__f32zeros': lambda n: JSArr(np.zeros(int(n), np.float32)),
        'len_': None,
    }
    for fname in ('meshToFlatArrays', 'geometryBBox'):
        params, body = _extract_function(geo_src, fname)
        exec(transliterate(fname, params, body), ns)
    for fname in ('sub3', 'dot3', 'cross3', 'norm3'):
        params, body = _extract_function(ren_src, fname)
        exec(transliterate(fname, params, body), ns)
    m4 = JSObj()
    for fname in ('identity', 'mul', 'perspective', 'lookAt'):
        params, body = _extract_m4(ren_src, fname)
        exec(transliterate(f'_m4_{fname}', params, body), ns)
        setattr(m4, fname, ns[f'_m4_{fname}'])
    ns['M4'] = m4
    for mname in ('setGeometry', 'draw'):
        params, body = _extract_method(ren_src, mname)
        params = 'this' + (', ' + params if params else '')
        exec(transliterate(f'_vp_{mname}', params, body), ns)
    ns['window'] = JSObj(Dash3DGeometry=JSObj(
        TYPE_MESH=0, TYPE_POINTCLOUD=1,
        parseBinaryMessage=None,
        meshToFlatArrays=ns['meshToFlatArrays'],
        geometryBBox=ns['geometryBBox']))
    return ns


def _viewport(ns):
    """A Viewport 'this' with the constructor's state + mocked GL."""
    gl = GLMock()
    this = JSObj(gl=gl, canvas=JSObj(width=420, height=320),
                 theta=0.9, phi=0.7, radius=3.0, center=[0, 0, 0],
                 nVerts=0, kind=None, currentTime=None,
                 meshProg='meshProg', ptsProg='ptsProg',
                 posBuf=gl.createBuffer(), nrmBuf=gl.createBuffer())
    this.draw = lambda: ns['_vp_draw'](this)
    return this, gl


# --------------------------------------------------------------------------
# numpy twins
# --------------------------------------------------------------------------

def _twin_flat(verts, faces):
    tri = verts[faces]                                    # (F, 3, 3)
    pos = tri.reshape(-1).astype(np.float32)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = (n / np.where(ln == 0., 1., ln)).astype(np.float32)
    return pos, np.repeat(n, 3, axis=0).reshape(-1)


def _twin_lookat(eye, at, up):
    def norm(v):
        return v / (np.linalg.norm(v) or 1.)
    z = norm(np.asarray(eye, np.float64) - at)
    x = norm(np.cross(up, z))
    y = np.cross(z, x)
    # column-major storage of [[x | -x.e], [y | -y.e], [z | -z.e], [0 1]]
    m = np.zeros(16)
    m[0:3] = x[0], y[0], z[0]
    m[4:7] = x[1], y[1], z[1]
    m[8:11] = x[2], y[2], z[2]
    m[12], m[13], m[14] = -x @ eye, -y @ eye, -z @ eye
    m[15] = 1.
    return m.astype(np.float32)


def _twin_perspective(fovy, aspect, near, far):
    f = 1.0 / math.tan(fovy / 2)
    m = np.zeros(16)
    m[0], m[5] = f / aspect, f
    m[10] = (far + near) / (near - far)
    m[11] = -1.
    m[14] = 2 * far * near / (near - far)
    return m.astype(np.float32)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def test_js_mesh_to_flat_arrays(client):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(9, 3)).astype(np.float32)
    faces = rng.integers(0, 9, size=(7, 3)).astype(np.int32)
    out = client['meshToFlatArrays'](JSArr(verts.reshape(-1)),
                                     JSArr(faces.reshape(-1), np.int32))
    pos, nrm = _twin_flat(verts, faces)
    np.testing.assert_array_equal(out.positions.data, pos)
    np.testing.assert_allclose(out.normals.data, nrm, atol=1e-6)


def test_js_normal_orientation(client):
    """A CCW triangle in the xy plane must emit +z normals — a sign
    flip in the JS cross product breaks this (and the shading)."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    out = client['meshToFlatArrays'](JSArr(verts.reshape(-1)),
                                     JSArr(faces.reshape(-1), np.int32))
    np.testing.assert_allclose(out.normals.data.reshape(3, 3),
                               [[0, 0, 1]] * 3, atol=0)


def test_js_degenerate_face_normal(client):
    """Zero-area faces produce zero normals (|| 1 guard), not NaNs."""
    verts = np.zeros((3, 3), np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    out = client['meshToFlatArrays'](JSArr(verts.reshape(-1)),
                                     JSArr(faces.reshape(-1), np.int32))
    assert np.all(np.isfinite(out.positions.data))
    np.testing.assert_array_equal(out.normals.data, np.zeros(9, np.float32))


def test_js_geometry_bbox(client):
    rng = np.random.default_rng(1)
    verts = rng.normal(size=(11, 3)).astype(np.float32)
    bb = client['geometryBBox'](JSObj(vertices=JSArr(verts.reshape(-1))))
    np.testing.assert_allclose(bb.min, verts.min(0))
    np.testing.assert_allclose(bb.max, verts.max(0))
    # pointcloud items short-circuit to their precomputed bbox
    bb2 = client['geometryBBox'](
        JSObj(points=JSArr(np.zeros(9, np.float32)),
              bboxMin=np.asarray([1., 2., 3.]),
              bboxMax=np.asarray([4., 5., 6.])))
    np.testing.assert_array_equal(bb2.min, [1., 2., 3.])
    np.testing.assert_array_equal(bb2.max, [4., 5., 6.])


def test_js_m4(client):
    M4 = client['M4']
    np.testing.assert_array_equal(M4.identity().data,
                                  np.eye(4, dtype=np.float32).reshape(-1))
    rng = np.random.default_rng(2)
    a = rng.normal(size=16).astype(np.float32)
    b = rng.normal(size=16).astype(np.float32)
    # column-major: O_F = A_F @ B_F
    twin = (a.reshape(4, 4, order='F').astype(np.float64)
            @ b.reshape(4, 4, order='F')).reshape(-1, order='F')
    np.testing.assert_allclose(M4.mul(JSArr(a), JSArr(b)).data, twin,
                               rtol=1e-6)
    p = M4.perspective(0.8, 420 / 320, 0.03, 300.).data
    np.testing.assert_allclose(p, _twin_perspective(0.8, 420 / 320, 0.03,
                                                    300.), rtol=1e-6)
    eye, at, up = [2., 1., 3.], [0.1, -0.2, 0.], [0., 1., 0.]
    np.testing.assert_allclose(M4.lookAt(eye, at, up).data,
                               _twin_lookat(eye, at, up), atol=1e-6)


def test_js_scene_assembly_mesh(client):
    """setGeometry + draw on a mesh frame: GPU buffers hold the
    de-indexed positions/normals, camera fits the bbox, and the uniform
    matrices match the M4 twins for the viewport's orbit state."""
    rng = np.random.default_rng(3)
    verts = (rng.normal(size=(8, 3)) * [1., 2., 0.5]).astype(np.float32)
    faces = rng.integers(0, 8, size=(6, 3)).astype(np.int32)
    msg = JSObj(typeId=0, viewId=0, snapTime=42, items=[
        JSObj(vertices=JSArr(verts.reshape(-1)),
              faces=JSArr(faces.reshape(-1), np.int32))])
    this, gl = _viewport(client)
    client['_vp_setGeometry'](this, msg)

    pos, nrm = _twin_flat(verts, faces)
    np.testing.assert_array_equal(gl.buffers[this.posBuf], pos)
    np.testing.assert_allclose(gl.buffers[this.nrmBuf], nrm, atol=1e-6)
    assert this.kind == 'mesh' and this.nVerts == len(faces) * 3
    assert this.currentTime == 42

    mn, mx = verts.min(0), verts.max(0)
    np.testing.assert_allclose(this.center, (mn + mx) / 2, atol=1e-6)
    diag = float(np.linalg.norm(mx - mn))
    assert this.radius == pytest.approx(diag * 1.6, rel=1e-6)

    # draw ran (setGeometry calls this.draw()): check the GL stream
    assert gl.cleared and gl.program == 'meshProg'
    assert gl.draws == [('TRIANGLES', 0, len(faces) * 3)]
    eye = np.array([
        this.center[0] + this.radius * math.cos(this.phi)
        * math.sin(this.theta),
        this.center[1] + this.radius * math.sin(this.phi),
        this.center[2] + this.radius * math.cos(this.phi)
        * math.cos(this.theta)])
    np.testing.assert_allclose(gl.uniforms['meshProg:uView'],
                               _twin_lookat(eye, np.asarray(this.center),
                                            np.array([0., 1., 0.])),
                               atol=1e-5)
    np.testing.assert_allclose(
        gl.uniforms['meshProg:uProj'],
        _twin_perspective(0.8, 420 / 320, 0.01 * this.radius,
                          100 * this.radius), rtol=1e-5)
    np.testing.assert_allclose(gl.uniforms['meshProg:uEye'], eye,
                               rtol=1e-6)
    np.testing.assert_allclose(gl.uniforms['meshProg:uColor'],
                               [0.45, 0.62, 0.85])


def test_js_scene_assembly_pointcloud(client):
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    msg = JSObj(typeId=1, viewId=0, snapTime=7, items=[
        JSObj(points=JSArr(pts.reshape(-1)),
              bboxMin=pts.min(0), bboxMax=pts.max(0))])
    this, gl = _viewport(client)
    client['_vp_setGeometry'](this, msg)
    np.testing.assert_array_equal(gl.buffers[this.posBuf],
                                  pts.reshape(-1))
    assert this.kind == 'pointcloud' and this.nVerts == 20
    assert gl.program == 'ptsProg'
    assert gl.draws == [('POINTS', 0, 20)]
    assert gl.uniforms['ptsProg:uSize'] == 3.0
    np.testing.assert_allclose(gl.uniforms['ptsProg:uColor'],
                               [0.95, 0.7, 0.3])
    mn, mx = pts.min(0), pts.max(0)
    np.testing.assert_allclose(this.center, (mn + mx) / 2, atol=1e-6)


def test_js_empty_message_noop(client):
    this, gl = _viewport(client)
    client['_vp_setGeometry'](this, JSObj(typeId=0, snapTime=1, items=[]))
    assert this.kind is None and not gl.draws and not gl.buffers


def test_js_draw_without_geometry_noop(client):
    this, gl = _viewport(client)
    client['_vp_draw'](this)
    assert not gl.draws and not gl.cleared
