"""Checkpoint/resume for the VO back-end (Orbax).

The reference's only checkpoints are Vivado ``.dcp`` snapshots and the
committed ``verification_baseline.json`` (SURVEY.md §5). A streaming VO
engine additionally needs *runtime* state persistence: the track table,
keyframe observation records, and the last frame, so a long sequence can
be interrupted and resumed at any frame boundary with bit-identical
results. Layout on disk:

    <path>/meta.json   static config (intrinsics, strides, backend)
    <path>/state/      Orbax checkpoint of the array pytree

``save``/``load`` round-trip :class:`tpuflow.vo.pipeline.OdometrySession`.
"""

from __future__ import annotations

import json
import os
import shutil

from tpuflow.vo.pipeline import OdometrySession


def save(session: OdometrySession, path: str) -> None:
    """Write a resumable checkpoint of ``session`` to directory ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    state_dir = os.path.join(path, "state")
    if os.path.exists(state_dir):
        shutil.rmtree(state_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(state_dir, session.state_dict())
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(session.meta_dict(), f, indent=2)


def load(path: str, mesh=None) -> OdometrySession:
    """Restore a session previously written by :func:`save`.

    ``mesh``: optional device mesh for tiled-flow sessions — runtime
    context, not part of the serialized state (the same checkpoint can
    resume on a different device topology).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, "state"))
    return OdometrySession.from_state(meta, state, mesh=mesh)
