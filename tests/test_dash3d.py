"""Dash3d-style viewer: serves the page and streams geometry over ws."""

import json
import threading

import numpy as np
import jax.numpy as jnp
import pytest

tornado = pytest.importorskip('tornado')

from kaolin_tpu.visualize import Timelapse
from kaolin_tpu.experimental.dash3d import create_server


def test_dash3d_server(tmp_path):
    import asyncio
    from tornado.httpclient import AsyncHTTPClient
    from tornado.websocket import websocket_connect
    import tornado.ioloop

    logdir = str(tmp_path / 'logs')
    tl = Timelapse(logdir)
    tl.add_mesh_batch(iteration=0, category='fit',
                      vertices_list=[jnp.zeros((3, 3))],
                      faces_list=[jnp.asarray([[0, 1, 2]])])
    tl.add_mesh_batch(iteration=5, category='fit',
                      vertices_list=[jnp.ones((3, 3))],
                      faces_list=[jnp.asarray([[0, 1, 2]])])

    result = {}

    import socket
    s = socket.socket()
    s.bind(('127.0.0.1', 0))        # ephemeral port: parallel-run safe
    port = s.getsockname()[1]
    s.close()

    async def drive():
        create_server(logdir, port)
        http = AsyncHTTPClient()
        resp = await http.fetch(f'http://localhost:{port}/')
        result['page'] = resp.body.decode()
        ws = await websocket_connect(f'ws://localhost:{port}/ws')
        ws.write_message(json.dumps({'cmd': 'list'}))
        listing = json.loads(await ws.read_message())
        result['listing'] = listing
        ws.write_message(json.dumps(
            {'cmd': 'geometry', 'prim_type': 'mesh', 'category': 'fit',
             'id': 0, 'time': 5}))
        result['geometry'] = json.loads(await ws.read_message())

    asyncio.run(drive())
    assert 'dash3d' in result['page']
    assert result['listing']['items']['mesh'][0]['category'] == 'fit'
    assert result['listing']['items']['mesh'][0]['times'] == [0.0, 5.0]
    geo = result['geometry']
    assert geo['type'] == 'mesh'
    np.testing.assert_allclose(np.asarray(geo['vertices']), 1.0)
    assert geo['faces'] == [[0, 1, 2]]


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
