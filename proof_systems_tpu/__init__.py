"""proof_systems_tpu — a TPU-native Kimchi proving stack.

A from-scratch reimplementation of the capabilities of
o1-labs/proof-systems (Kimchi PLONK-ish SNARK over the Pasta curves with
an IPA polynomial commitment), designed TPU-first:

  - hot polynomial/group math (NTT, MSM, Poseidon, constraint evaluation)
    runs as batched JAX/XLA/Pallas kernels over 16x16-bit limb vectors;
  - the sequential Fiat-Shamir transcript and per-proof scalar logic run
    on the host with exact Python bigints;
  - multi-chip scaling uses jax.sharding meshes (see `parallel/`).

Package layout:
  fields.py / curves.py    host golden-model arithmetic + protocol constants
  poseidon/                transcript sponges + poseidon parameters
  ops/                     device kernels (field, curve, ntt, msm, pallas)
  poly_commitment/         SRS, commitments, IPA open/verify
  circuits/                gates, constraint system, expressions, lookup
  prover.py / verifier.py  the kimchi protocol
  o1vm/                    zkVM column prover + RISC-V interpreter
  mina/                    ROInput hashing, Schnorr signer, base58
  serialization.py         rmp/MessagePack proof wire format
  parallel/                device-mesh sharded kernels
"""

__version__ = "0.1.0"

# Cache-stable lowering: strip file/line from MLIR locations so pallas
# kernel payloads hash identically across unrelated source edits (see
# utils/stable_lowering.py; PST_KEEP_LOCATIONS=1 restores locations).
from .utils.stable_lowering import stabilize as _stabilize_lowering

_stabilize_lowering()


def prove(index, witness, rng, prev_challenges=(), runtime_tables=None):
    """Create a kimchi proof (see prover.create_proof)."""
    from .prover import create_proof

    return create_proof(
        index, witness, rng, prev_challenges, runtime_tables=runtime_tables
    )


def verify(vk, proof, public_input, rng):
    """Verify a kimchi proof (see verifier.verify)."""
    from .verifier import verify as _verify

    return _verify(vk, proof, public_input, rng)
