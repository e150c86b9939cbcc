"""Coconut blind-issuance request proof (MessagesPoK) end-to-end."""
import random
from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.coconut import core as ps
from crypto_tpu.coconut.messages_pok import MessagesPoKProtocol
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge

F = b.Fr
RNG = random.Random(1919)

def test_blind_request_flow():
    n = 4
    params = ps.PSSignatureParams.new(b"ps-blind", n)
    sk = ps.PSSecretKey.generate(RNG, n)
    pk = ps.PSPublicKey.generate(sk, params)
    messages = [F.rand(RNG) for _ in range(n)]
    hidden = {0, 2}

    # requester builds the PoK
    prot = MessagesPoKProtocol.init(
        RNG, {j: messages[j] for j in hidden}, params)
    w = ByteWriter()
    prot.challenge_contribution(params, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    pok = prot.gen_proof(c)

    # signer verifies before signing
    w2 = ByteWriter()
    pok.challenge_contribution(params, w2)
    assert compute_random_oracle_challenge(F, w2.bytes()) == c
    assert pok.verify(c, params)

    # signer blind-signs over the verified commitments
    com_j, h, o_j = prot.commitments_for_signing()
    items = [com_j[i] if i in hidden else messages[i] for i in range(n)]
    blind_sig = ps.blind_sign(items, sk, h)
    sig = ps.unblind(blind_sig, sorted(o_j.items()), pk, h)
    assert sig.verify(messages, pk, params)

    # tampered commitment is rejected by the signer
    from crypto_tpu.coconut.core import MessageCommitment
    bad = pok
    bad.com_j[0] = MessageCommitment((bad.com_j[0].com + params.g).normalize())
    assert not bad.verify(c, params)
