"""Checkpoint / resume for long sweeps.

The reference has no checkpointing (SURVEY.md section 5); its closest analog
is the MPC warm-start carry. Here all cross-solve state is already an
explicit pytree (``CILQRCarry``, batched stats, sweep cursors), so
checkpointing is a straight orbax round trip.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: Any) -> None:
    """Save a pytree (device arrays fine) to ``path`` (a directory)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.tree.map(lambda x: x, state), force=True)


def restore_state(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree saved by :func:`save_state`.

    ``template`` (same structure, abstract or concrete arrays) restores
    with matching shardings/dtypes; without it the raw tree is returned.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if template is not None:
        restore_args = jax.tree.map(
            lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype), template
        )
        return _checkpointer().restore(path, item=template,
                                       restore_args=restore_args)
    return _checkpointer().restore(path)
