"""Dash3d-style viewer: serves the page and streams geometry over ws."""

import json
import threading

import numpy as np
import jax.numpy as jnp
import pytest

tornado = pytest.importorskip('tornado')

from kaolin_tpu.visualize import Timelapse
from kaolin_tpu.experimental.dash3d import create_server


def _free_port():
    import socket
    s = socket.socket()
    s.bind(('127.0.0.1', 0))        # ephemeral port: parallel-run safe
    port = s.getsockname()[1]
    s.close()
    return port


def test_dash3d_server_binary_protocol(tmp_path):
    """End-to-end over the reference wire format
    (``kaolin/experimental/dash3d/util.py:27-92,292-303``): dirinfo JSON
    pushed on connect, JSON geometry requests answered with int32-headed
    binary frames; current_time dedupe (snap within 0.5 -> no reply)."""
    import asyncio
    from tornado.httpclient import AsyncHTTPClient
    from tornado.websocket import websocket_connect

    from kaolin_tpu.experimental.dash3d.util import decode_binary_message

    logdir = str(tmp_path / 'logs')
    tl = Timelapse(logdir)
    tl.add_mesh_batch(iteration=0, category='fit',
                      vertices_list=[jnp.zeros((3, 3))],
                      faces_list=[jnp.asarray([[0, 1, 2]])])
    tl.add_mesh_batch(iteration=5, category='fit',
                      vertices_list=[jnp.ones((3, 3))],
                      faces_list=[jnp.asarray([[0, 1, 2]])])
    tl.add_pointcloud_batch(iteration=5, category='pts',
                            pointcloud_list=[jnp.ones((17, 3)) * 0.25])

    result = {}
    port = _free_port()

    async def drive():
        create_server(logdir, port)
        http = AsyncHTTPClient()
        resp = await http.fetch(f'http://localhost:{port}/')
        result['page'] = resp.body.decode()
        resp = await http.fetch(f'http://localhost:{port}/static/'
                                f'render.js')
        result['render_js'] = resp.body.decode()
        ws = await websocket_connect(f'ws://localhost:{port}/ws')
        result['dirinfo'] = json.loads(await ws.read_message())
        ws.write_message(json.dumps({'type': 'geometry', 'data': [
            {'type': 'mesh', 'category': 'fit', 'id': 0, 'time': 5,
             'view_id': 0},
            {'type': 'pointcloud', 'category': 'pts', 'id': 0,
             'time': 0, 'view_id': 1},
        ]}))
        result['mesh'] = decode_binary_message(await ws.read_message())
        result['cloud'] = decode_binary_message(await ws.read_message())
        # dedupe: current_time equal to snap -> server stays silent,
        # a fresh request afterwards still arrives (no stall)
        ws.write_message(json.dumps({'type': 'geometry', 'data': [
            {'type': 'mesh', 'category': 'fit', 'id': 0, 'time': 5,
             'view_id': 0, 'current_time': 5},
            {'type': 'mesh', 'category': 'fit', 'id': 0, 'time': 0,
             'view_id': 2},
        ]}))
        result['after_dedupe'] = decode_binary_message(
            await ws.read_message())

    asyncio.run(drive())
    assert 'dash3d' in result['page']
    assert 'parseBinaryMessage' not in result['page']   # js is external
    assert 'Viewport' in result['render_js']

    info = result['dirinfo']
    assert info['type'] == 'dirinfo'
    assert info['data']['mesh'][0]['category'] == 'fit'
    assert info['data']['mesh'][0]['times'] == [0.0, 5.0]

    mesh = result['mesh']
    assert mesh['type_id'] == 0 and mesh['view_id'] == 0
    assert mesh['snap_time'] == 5
    assert mesh['items'][0]['vertices'].shape == (3, 3)
    np.testing.assert_allclose(mesh['items'][0]['vertices'], 1.0)
    np.testing.assert_array_equal(mesh['items'][0]['faces'], [[0, 1, 2]])

    cloud = result['cloud']
    assert cloud['type_id'] == 1 and cloud['view_id'] == 1
    assert cloud['items'][0]['points'].shape == (17, 3)
    np.testing.assert_allclose(cloud['items'][0]['bbox_min'], 0.25)
    np.testing.assert_allclose(cloud['items'][0]['bbox_max'], 0.25)

    # the dedupe request produced exactly one reply: view 2 at iter 0
    after = result['after_dedupe']
    assert after['view_id'] == 2 and after['snap_time'] == 0
    np.testing.assert_allclose(after['items'][0]['vertices'], 0.0)


def test_binary_roundtrip_parity():
    """Encoder/decoder byte-level parity (the python twin of the
    reference's JS ``test_binary_parse.js``)."""
    from kaolin_tpu.experimental.dash3d.util import (
        meshes_to_binary, point_clouds_to_binary, decode_binary_message)
    rng = np.random.default_rng(3)
    v = rng.normal(size=(10, 3)).astype(np.float32)
    f = rng.integers(0, 10, (7, 3)).astype(np.int32)
    head = np.array([0, 4, 12, 0], np.int32).tobytes()
    out = decode_binary_message(head + meshes_to_binary([v], [f]))
    assert (out['type_id'], out['view_id'], out['snap_time']) == (0, 4, 12)
    np.testing.assert_array_equal(out['items'][0]['vertices'], v)
    np.testing.assert_array_equal(out['items'][0]['faces'], f)

    pts = rng.normal(size=(23, 3)).astype(np.float32)
    head = np.array([1, 0, 3, 0], np.int32).tobytes()
    out = decode_binary_message(head + point_clouds_to_binary([pts]))
    assert out['items'][0]['points'].shape == (23, 3)
    np.testing.assert_array_equal(out['items'][0]['points'], pts)
    np.testing.assert_allclose(out['items'][0]['bbox_min'],
                               pts.min(axis=0))


def test_visualize_main_emulated_training(tmp_path):
    """examples/visualize_main writes parseable Timelapse USDs
    (reference visualize_main.py end-to-end flow)."""
    import numpy as np
    from examples.visualize_main import emulate_training_timelapse
    from kaolin_tpu.visualize import TimelapseParser

    obj = tmp_path / 'tri.obj'
    obj.write_text(
        'v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n'
        'f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n')
    out = tmp_path / 'logs'
    out.mkdir()
    emulate_training_timelapse([str(obj)], str(out), iterations=21,
                               checkpoint_interval=10, voxel_res=8)
    parser = TimelapseParser(str(out))
    cats = {c['category'] for c in parser.dir_info['mesh']}
    assert {'ground_truth', 'output'} <= cats
    assert parser.num_items('mesh') >= 2
    assert parser.num_items('pointcloud') >= 2
    assert parser.num_items('voxelgrid') >= 1
