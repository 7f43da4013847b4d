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

    async def drive():
        create_server(logdir, 8799)
        http = AsyncHTTPClient()
        resp = await http.fetch('http://localhost:8799/')
        result['page'] = resp.body.decode()
        ws = await websocket_connect('ws://localhost:8799/ws')
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
