"""Process-global device mesh for the proving pipeline.

When more than one accelerator is visible, the prover's commit MSMs
batch-shard across a 1-D 'data' mesh automatically (ops/msm.py): each
device runs the full O(1)-graph Pippenger pipeline on its share of the
batch rows — zero communication, like the reference's per-commitment
rayon split (poly-commitment/src/ipa.rs:527-554) but across chips.
Point-axis sharding (for one very large MSM) lives in parallel/mesh.py;
row-sharded NTTs in parallel/ntt.py.

PST_MESH=0 disables mesh use without changing device visibility.
"""

from __future__ import annotations

import os

_mesh = None
_checked = False


def data_mesh():
    """The global ('data',) mesh over all local devices, or None when
    single-device (or PST_MESH=0)."""
    global _mesh, _checked
    if not _checked:
        _checked = True
        if os.environ.get("PST_MESH", "1") != "0":
            import jax
            import numpy as np
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) > 1:
                _mesh = Mesh(np.array(devs), ("data",))
    return _mesh


def reset_mesh() -> None:
    """Forget the cached mesh (tests that change device visibility)."""
    global _mesh, _checked
    _mesh = None
    _checked = False
