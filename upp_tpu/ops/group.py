"""FPS + kNN patchifier ("Group").

Replaces the reference's ``Group`` module (``models/Point_MAE_unify.py:51-92``):
FPS ``num_group`` centers, kNN ``group_size`` neighbours of each center,
center-relative normalisation. This function is pure (no parameters), so
unlike the reference it is a plain op rather than an nn.Module.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .fps import fps
from .knn import knn, knn_points
from .geometry import index_points


class Grouped(NamedTuple):
    neighborhood: jnp.ndarray  # [B, G, S, 3] center-relative
    center: jnp.ndarray        # [B, G, 3]
    idx: jnp.ndarray           # [B, G, S] int32 indices into the input cloud
    center_idx: jnp.ndarray    # [B, G] int32


@partial(jax.jit, static_argnames=("num_group", "group_size"))
def group_points(xyz: jnp.ndarray, num_group: int, group_size: int,
                 valid: Optional[jnp.ndarray] = None) -> Grouped:
    """Patchify a cloud into ``num_group`` neighbourhoods of ``group_size``.

    The reference's ``gather_idx``/``require_index`` flags only changed the
    *index flattening convention* (flat B*N vs per-batch); here indices are
    always per-batch [B, G, S], the natural layout for jnp.take_along_axis.
    """
    center, center_idx = fps(xyz, num_group, valid)
    if valid is not None:
        # honor the mask in the kNN stage too: displace invalid slots to a
        # far shell so they are only ever selected when fewer than
        # ``group_size`` valid points exist; gather real coordinates below.
        far = jnp.where(jnp.broadcast_to(valid, xyz.shape[:2])[..., None],
                        xyz, 1e6)
        _, idx = knn(center, far, group_size)       # [B, G, S]
        neighborhood = index_points(xyz, idx)       # [B, G, S, 3]
    else:
        # knn_points owns the fused-Pallas-vs-portable dispatch
        _, idx, neighborhood = knn_points(center, xyz, group_size)
    neighborhood = neighborhood - center[:, :, None, :]
    return Grouped(neighborhood, center, idx, center_idx)
