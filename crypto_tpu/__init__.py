"""crypto_tpu — a TPU-native (JAX/XLA/Pallas) privacy-cryptography framework.

Re-implements the capabilities of docknetwork/crypto (BBS+/BBS signatures,
dynamic accumulators, composite ZK proof system, LegoGroth16, SAVER,
range proofs, KVACs, secret sharing/DKG, OT-based MPC, ...) with the compute
core (big-integer field arithmetic, MSM, NTT, pairings) built TPU-first:
batched limb-tensor arithmetic in JAX, Pallas kernels for hot paths, SPMD
sharding over device meshes for scale.

Layer map (mirrors SURVEY.md §1):
  fields/   — L0 arithmetic core: host bigint + batched JAX limb arithmetic
  curves/   — L0: short-Weierstrass groups, pairings
  ops/      — L0 kernels: MSM, NTT, batched verification
  transcript/ — L0.5: merlin/STROBE Fiat-Shamir transcripts (bit-exact)
  utils/    — L1 shared utilities (commitments, ElGamal, checkers, ...)
  schnorr/  — L2 sigma-protocol toolkit
  bbs_plus/, accumulator/, ... — L3 primitive protocols
  proof_system/ — L4 composite proof system
"""

__version__ = "0.1.0"
