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
  ops/                     device kernels (field, curve, ntt, msm, poseidon)
  poly_commitment/         SRS, commitments, IPA open/verify
  circuits/                gates, constraint system, expression framework
  prover.py / verifier.py  the kimchi protocol
  parallel/                device-mesh sharded kernels
  models/                  example/benchmark circuit families
"""

__version__ = "0.1.0"
