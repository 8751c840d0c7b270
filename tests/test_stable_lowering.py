"""stable_lowering must actually strip file:line locations on this jax.

The patch (utils/stable_lowering.py) monkeypatches
`jax._src.interpreters.mlir.source_info_to_location`; jax upgrades can
move that hook silently. This test fails if the patch stopped biting:
lowered StableHLO (with debug info) must carry no source-file locations,
so pallas payload bytes — and hence persistent compile-cache keys — are
a pure function of the traced program, not of line numbers.
"""

import jax
import jax.numpy as jnp


def test_patch_applied():
    from jax._src.interpreters import mlir

    from proof_systems_tpu.utils import stable_lowering

    stable_lowering.stabilize()
    assert stable_lowering._patched, (
        "stable_lowering.stabilize() did not apply — jax internals moved; "
        "update utils/stable_lowering.py for this jax version"
    )
    assert mlir.source_info_to_location.__name__ == "_loc_no_lines"


def test_lowered_text_has_no_file_locations():
    from proof_systems_tpu.utils import stable_lowering

    stable_lowering.stabilize()

    def f(x):
        return jnp.sin(x) * 2.0 + jnp.cos(x)

    text = jax.jit(f).lower(jnp.ones((4,), jnp.float32)).as_text(
        debug_info=True
    )
    assert 'loc("' in text or "loc(" in text  # debug info is present...
    assert ".py" not in text, (
        "lowered module still contains source-file locations; the "
        "stable_lowering patch is not effective on this jax version"
    )
