"""Persistence: named-array bundles and checkpoints.

Reference: writepickle/readpickle/writejson (ricker_util.py:345-365,
loc_cmt_util.py:657-665) — dict-of-named-arrays snapshots used as result
caches by the notebooks. Note the reference's ``readjson`` actually calls
``pickle.load`` (copy-paste bug at ricker_util.py:364-365); the JSON reader
here really reads JSON.

For optimizer/inversion state the rebuild adds orbax checkpointing
(:func:`save_checkpoint` / :func:`restore_checkpoint`) — the reference has
no resume capability (SURVEY.md section 5, 'Checkpoint / resume').
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np


def write_pickle(filename, names, arrays) -> None:
    """dict(zip(names, arrays)) -> pickle (reference writepickle)."""
    with open(filename, "wb") as fh:
        pickle.dump(dict(zip(names, arrays)), fh)


def read_pickle(filename):
    with open(filename, "rb") as fh:
        return pickle.load(fh)


def write_json(filename, names, arrays) -> None:
    """JSON variant; ndarray values are converted to nested lists."""
    data = {k: (np.asarray(v).tolist() if hasattr(v, "__array__")
                or isinstance(v, (list, tuple)) else v)
            for k, v in zip(names, arrays)}
    with open(filename, "w", encoding="utf8") as fh:
        json.dump(data, fh)


def read_json(filename):
    """Actually reads JSON (fixes the reference's readjson bug,
    ricker_util.py:364-365)."""
    with open(filename, encoding="utf8") as fh:
        return json.load(fh)


def save_checkpoint(path, pytree, step: int | None = None) -> None:
    """Orbax checkpoint of an arbitrary pytree (optimizer state, traces...)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        target = path if step is None else path / f"step_{step}"
        ckptr.save(target, pytree, force=True)


def restore_checkpoint(path, template=None, step: int | None = None):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        target = path if step is None else path / f"step_{step}"
        return ckptr.restore(target, template)
