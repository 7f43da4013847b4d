"""kaolin-tpu-dash3d: web viewer for Timelapse checkpoint logs.

Re-design of ``kaolin/experimental/dash3d/run.py:42-110`` (Flask+Tornado
+ THREE.js there): a single Tornado app serves a self-contained HTML page
(vanilla-JS canvas renderer, no external assets — the environment has no
flask and no CDN access) and streams geometry over a websocket as JSON.

Run: ``python -m kaolin_tpu.experimental.dash3d --logdir LOGDIR [--port P]``.
"""

import argparse
import json
import logging
import os

import numpy as np

from ...visualize import TimelapseParser
from ...io import usd

logger = logging.getLogger(__name__)

_HTML_PATH = os.path.join(os.path.dirname(__file__), 'index.html')


def _geometry_payload(parser, prim_type, category, idx, time):
    """Loads one checkpointed geometry as a JSON-serializable dict."""
    paths = parser.get_filepaths(category, prim_type)
    if idx >= len(paths):
        return {'error': f'no {prim_type} #{idx} in {category}'}
    path = paths[idx]
    if prim_type == 'mesh':
        out = usd.import_mesh(path, time=time)
        verts = np.asarray(out.vertices, np.float32)
        faces = np.asarray(out.faces, np.int64)
        return {'type': 'mesh', 'vertices': verts.tolist(),
                'faces': faces.tolist()}
    if prim_type == 'pointcloud':
        out = usd.import_pointcloud(path, time=time)
        return {'type': 'pointcloud',
                'points': np.asarray(out.points, np.float32).tolist()}
    if prim_type == 'voxelgrid':
        grid = np.asarray(usd.import_voxelgrid(path, time=time))
        idxs = np.argwhere(grid)
        res = grid.shape[0]
        pts = (idxs + 0.5) / res * 2. - 1.
        return {'type': 'pointcloud', 'points': pts.tolist()}
    return {'error': f'unknown prim type {prim_type}'}


def _times_for(path):
    stage = usd.Stage.load(path)
    times = set()
    for _, prim in stage.walk():
        for _, (_, samples) in prim.time_attrs.items():
            times.update(samples.keys())
    return sorted(times)


def create_server(logdir, port):
    import tornado.web
    import tornado.websocket

    parser = TimelapseParser(logdir)

    class IndexHandler(tornado.web.RequestHandler):
        def get(self):
            with open(_HTML_PATH, 'r', encoding='utf-8') as f:
                self.write(f.read())

    class GeometryWS(tornado.websocket.WebSocketHandler):
        def on_message(self, message):
            req = json.loads(message)
            cmd = req.get('cmd')
            if cmd == 'list':
                parser.check_for_updates()
                items = {}
                for typ, infos in parser.dir_info.items():
                    items[typ] = [
                        {'category': i['category'], 'id': i['id'],
                         'times': _times_for(i['path'])} for i in infos]
                self.write_message(json.dumps({'cmd': 'list',
                                               'items': items}))
            elif cmd == 'geometry':
                payload = _geometry_payload(
                    parser, req['prim_type'], req['category'],
                    int(req.get('id', 0)), req.get('time'))
                payload['cmd'] = 'geometry'
                self.write_message(json.dumps(payload))

    app = tornado.web.Application([
        (r'/', IndexHandler),
        (r'/ws', GeometryWS),
    ])
    app.listen(port)
    return app


def run_main():
    import tornado.ioloop

    p = argparse.ArgumentParser(description='kaolin-tpu dash3d viewer')
    p.add_argument('--logdir', type=str, required=True)
    p.add_argument('--port', type=int, default=8080)
    args = p.parse_args()
    create_server(args.logdir, args.port)
    logging.basicConfig(level=logging.INFO)
    logger.info('kaolin-tpu-dash3d serving %s at http://localhost:%d',
                args.logdir, args.port)
    tornado.ioloop.IOLoop.current().start()


if __name__ == '__main__':
    run_main()


def get_max_viewports(urlargs):
    """Clamped ``maxviews`` URL argument (reference
    ``dash3d/run.py:32``): default 3, bounded to [1, 8]. API-parity
    helper — this port's simplified single-viewport viewer does not
    consume it."""
    try:
        return max(1, min(8, int(urlargs.get('maxviews', 3))))
    except (TypeError, ValueError):
        return 3
