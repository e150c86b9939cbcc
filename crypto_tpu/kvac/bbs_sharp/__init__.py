"""BBS# — KVAC over a pairing-free curve (secp256r1) with hardware-bound
presentation (Schnorr or ECDSA secure-element signatures) and half-offline
issuance tokens (reference `kvac/src/bbs_sharp/`)."""

from .hol import (HOLSignerProtocol, HOLUserProtocol, PreChallengeData,
                  ProofOfValidity, TokenPrivateData)
from .mac import MAC, ProofOfValidityOfMAC
from .proof import (ECDSA, SCHNORR, KeyedProofBBSSharp, PoKOfMAC,
                    PoKOfMACProtocol)
from .setup import (DesignatedVerifierPoKOfPublicKey, MACParams, SecretKey,
                    SignerPublicKey, UserPublicKey)
