"""Executes the dash3d WebGL client's binary-protocol parser (the REAL
shipped JS source) against bytes produced by util.py's encoders.

The reference runs this as a mocha test under node
(tests/integration/experimental/dash3d/test_binary_parse.js); this image
has no JS runtime (no node/bun/quickjs, checked), so the protocol-
critical function ``parseBinaryMessage`` is mechanically transliterated
from the geometry.js SOURCE into Python at test time and executed on
real encoder output. The transliterator covers exactly the dialect the
function uses (typed-array views, buffer.slice, for/push); edits inside
that dialect (offset, stride, dtype, field-order changes) flow straight
into the executed logic, so a byte-order change on EITHER side breaks
this test. Syntax outside the dialect fails loudly (update the
translator). When a JS runtime is available, test_parse_under_node runs
the untranslated source instead.
"""

import json
import pathlib
import re
import shutil
import subprocess

import numpy as np
import pytest

STATIC = (pathlib.Path(__file__).parent.parent / 'kaolin_tpu' /
          'experimental' / 'dash3d' / 'static')


def _extract_function(src, name):
    m = re.search(r'function %s\(([^)]*)\) \{' % name, src)
    assert m, f'{name} not found in geometry.js'
    depth = 1
    i = m.end()
    while depth:
        if src[i] == '{':
            depth += 1
        elif src[i] == '}':
            depth -= 1
        i += 1
    return m.group(1), src[m.end():i - 1]


def _js_expr(e):
    """Translate a JS expression of the parser dialect to Python."""
    e = e.strip()
    e = re.sub(r'new Int32Array\(buffer,\s*(\d+),\s*(\d+)\)',
               r'__np.frombuffer(buffer, __np.int32, \2, \1)', e)
    e = re.sub(r'new Int32Array\(buffer\.slice\(([^)]*)\)\)',
               r'__np.frombuffer(buffer[slice(\1)], __np.int32)', e)
    e = re.sub(r'new Float32Array\(\s*buffer\.slice\(([^)]*)\)\)',
               r'__np.frombuffer(buffer[slice(\1)], __np.float32)', e)
    e = re.sub(r'([A-Za-z_][\w.]*)\.slice\(([^)]*)\)',
               r'\1[slice(\2)]', e)
    e = re.sub(r'([A-Za-z_][\w.]*)\.length', r'len(\1)', e)
    e = e.replace('===', '==').replace('!==', '!=')
    return e


def _transliterate(params, body):
    """parseBinaryMessage's statement dialect -> exec-able Python."""
    out = ['def parseBinaryMessage(%s):' % params]
    indent = 1
    stmts = []
    # line-based statement assembly: a statement ends with ';', '{' or
    # a lone '}' (object literals spanning lines stay joined)
    buf = ''
    for line in body.splitlines():
        line = line.strip()
        if not line or line.startswith('//'):
            continue
        buf = (buf + ' ' + line).strip()
        if buf.endswith((';', '{', '}')):
            stmts.append(buf)
            buf = ''
    assert not buf, f'unterminated statement: {buf!r}'
    for st in stmts:
        pad = '    ' * indent
        if st.startswith('//') or st.startswith('/*'):
            continue
        m = re.match(r'for \(let (\w+) = 0; \1 < ([\w.]+); \1\+\+\) \{', st)
        if m:
            out.append(f'{pad}for {m.group(1)} in '
                       f'range({_js_expr(m.group(2))}):')
            indent += 1
            continue
        m = re.match(r'if \(([^)]*)\) \{', st)
        if m:
            out.append(f'{pad}if {_js_expr(m.group(1))}:')
            indent += 1
            continue
        if st.startswith('} else {'):
            indent -= 1
            out.append('    ' * indent + 'else:')
            indent += 1
            continue
        if st == '}':
            indent -= 1
            assert indent >= 1, 'brace underflow'
            continue
        st = st.rstrip(';')
        m = re.match(r'(?:const|let)\s+(.+)$', st, re.S)
        if m:
            # const a = x, b = y, ... -> one assignment per declarator
            for part in re.split(r',\s*(?=\w+\s*=)', m.group(1)):
                l2, r2 = part.split('=', 1)
                out.append(f'{pad}{l2.strip()} = {_js_expr(r2)}')
            continue
        m = re.match(r'(\w+)\.push\((\{.*\})\)$', st, re.S)
        if m:
            obj = re.sub(r'(\w+):', r'"\1":', m.group(2))
            out.append(f'{pad}{m.group(1)}.append({_js_expr(obj)})')
            continue
        m = re.match(r'return (\{.*\})$', st, re.S)
        if m:
            obj = re.sub(r'(\w+):', r'"\1":', m.group(1))
            out.append(f'{pad}return {_js_expr(obj)}')
            continue
        m = re.match(r'(\w+) \+= (.+)$', st)
        if m:
            out.append(f'{pad}{m.group(1)} += {_js_expr(m.group(2))}')
            continue
        raise AssertionError(
            f'geometry.js uses syntax outside the tested dialect: {st!r}'
            f' — extend tests/test_dash3d_js.py')
    return '\n'.join(out)


@pytest.fixture(scope='module')
def js_parse():
    src = (STATIC / 'geometry.js').read_text()
    params, body = _extract_function(src, 'parseBinaryMessage')
    code = _transliterate(params, body)
    ns = {'__np': np, 'slice': lambda a, b: slice(int(a), int(b)),
          'TYPE_MESH': 0, 'TYPE_POINTCLOUD': 1}
    exec(code, ns)
    return ns['parseBinaryMessage']


def _messages():
    from kaolin_tpu.experimental.dash3d import util
    verts = np.arange(12, dtype=np.float32).reshape(4, 3) * 0.125
    faces = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    v2 = -np.ones((3, 3), np.float32)
    f2 = np.array([[2, 1, 0]], np.int32)
    mesh_msg = (np.array([util.TYPE_MESH, 7, 42, 0], np.int32).tobytes()
                + util.meshes_to_binary([verts, v2], [faces, f2]))
    pts = np.linspace(-1, 1, 30, dtype=np.float32).reshape(10, 3)
    pc_msg = (np.array([util.TYPE_POINTCLOUD, 3, 9, 0], np.int32).tobytes()
              + util.point_clouds_to_binary([pts]))
    return mesh_msg, pc_msg, verts, faces, pts


def test_js_parse_mesh_message(js_parse):
    mesh_msg, _, verts, faces, _ = _messages()
    out = js_parse(mesh_msg)
    assert out['typeId'] == 0 and out['viewId'] == 7
    assert out['snapTime'] == 42
    assert len(out['items']) == 2
    np.testing.assert_array_equal(
        out['items'][0]['vertices'], verts.reshape(-1))
    np.testing.assert_array_equal(
        out['items'][0]['faces'], faces.reshape(-1))
    assert len(out['items'][1]['vertices']) == 9
    assert (out['items'][1]['vertices'] == -1).all()


def test_js_parse_pointcloud_message(js_parse):
    _, pc_msg, _, _, pts = _messages()
    out = js_parse(pc_msg)
    assert out['typeId'] == 1 and out['viewId'] == 3
    assert len(out['items']) == 1
    it = out['items'][0]
    np.testing.assert_array_equal(it['points'], pts.reshape(-1))
    np.testing.assert_allclose(it['bboxMin'], pts.min(0))
    np.testing.assert_allclose(it['bboxMax'], pts.max(0))


def test_js_parse_matches_python_decoder(js_parse):
    """The JS parser and util.decode_binary_message agree field by
    field on random geometry — the cross-implementation pattern."""
    from kaolin_tpu.experimental.dash3d import util
    rng = np.random.default_rng(0)
    vs = [rng.normal(size=(n, 3)).astype(np.float32) for n in (5, 1, 17)]
    fs = [rng.integers(0, n, size=(max(n - 1, 1), 3)).astype(np.int32)
          for n in (5, 1, 17)]
    msg = (np.array([util.TYPE_MESH, 1, 2, 0], np.int32).tobytes()
           + util.meshes_to_binary(vs, fs))
    js = js_parse(msg)
    py = util.decode_binary_message(msg)
    assert len(js['items']) == len(py['items']) == 3
    for a, b in zip(js['items'], py['items']):
        np.testing.assert_array_equal(a['vertices'],
                                      b['vertices'].reshape(-1))
        np.testing.assert_array_equal(a['faces'], b['faces'].reshape(-1))


def _find_js_runtime():
    for rt in ('node', 'bun', 'qjs'):
        path = shutil.which(rt)
        if path:
            return rt, path
    return None, None


def test_parse_under_node(tmp_path):
    """Runs the UNTRANSLATED geometry.js under a real JS runtime when
    one exists (the reference's test_binary_parse.js analogue); skipped
    in this image (verified: no node/bun/quickjs or any browser)."""
    rt, path = _find_js_runtime()
    if rt is None:
        pytest.skip('no JS runtime in this environment')
    mesh_msg, pc_msg, verts, faces, pts = _messages()
    (tmp_path / 'mesh.bin').write_bytes(mesh_msg)
    (tmp_path / 'pc.bin').write_bytes(pc_msg)
    driver = tmp_path / 'driver.js'
    driver.write_text(f"""
const fs = require('fs');
{(STATIC / 'geometry.js').read_text()}
function load(p) {{
  const b = fs.readFileSync(p);
  return b.buffer.slice(b.byteOffset, b.byteOffset + b.byteLength);
}}
const m = parseBinaryMessage(load('{tmp_path}/mesh.bin'));
const p = parseBinaryMessage(load('{tmp_path}/pc.bin'));
console.log(JSON.stringify({{
  typeId: m.typeId, count: m.items.length,
  nv0: m.items[0].vertices.length / 3,
  v0: Array.from(m.items[0].vertices.slice(0, 3)),
  pcN: p.items[0].points.length / 3,
  bboxMin: Array.from(p.items[0].bboxMin),
}}));
""")
    out = subprocess.run([path, str(driver)], capture_output=True,
                         text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res['typeId'] == 0 and res['count'] == 2 and res['nv0'] == 4
    np.testing.assert_allclose(res['v0'], verts.reshape(-1)[:3])
    assert res['pcN'] == 10
    np.testing.assert_allclose(res['bboxMin'], pts.min(0))
