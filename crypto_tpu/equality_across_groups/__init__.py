"""Proofs of discrete-log equality across elliptic-curve groups, committed
EC point arithmetic (ZKAttest/CDLS), and PoK of ECDSA signatures under
committed public keys (reference crate `equality_across_groups`)."""

from .commitments import (CommitmentWithOpening, EqAcrossGroupsError,
                          PointCommitment, PointCommitmentWithOpening,
                          point_coords_as_scalar_field_elements)
from .eq_across_groups import (EqParams, Proof, ProofLargeWitness,
                               ProofSingleRep, decompose)
from .point_addition import PointAdditionProof, PointAdditionProtocol
from .pok_ecdsa_pubkey import (PoKEcdsaSigCommittedPublicKey,
                               PoKEcdsaSigCommittedPublicKeyProtocol,
                               TransformedEcdsaSig)
from .scalar_mult import (ScalarMultiplicationProof,
                          ScalarMultiplicationProtocol)
