"""KB universal accumulator: batch updates + full witness-update machinery
(reference `vb_accumulator/src/kb_universal_accumulator/{accumulator,witness}.rs`,
mirrored test shape of the reference's in-crate tests)."""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
from crypto_tpu.accumulator.kb_universal import KBUniversalAccumulator
from crypto_tpu.accumulator import kb_universal_witness as kbw
from crypto_tpu.accumulator.persistence import InMemoryState

F = b.Fr
RNG = random.Random(555)


def setup(domain_size=12):
    params = AccumSetupParams.new(b"kbu-wit")
    kp = AccumKeypair.generate(RNG, params)
    domain = [F.rand(RNG) for _ in range(domain_size)]
    ms, ns = InMemoryState(), InMemoryState()
    acc = KBUniversalAccumulator.initialize(params, kp.secret_key, domain,
                                            ms, ns)
    return params, kp, domain, ms, ns, acc


def test_single_update_laws():
    params, kp, domain, ms, ns, acc = setup()
    sk = kp.secret_key
    # add domain[0]; get witnesses
    acc1 = acc.add(domain[0], sk, ms, ns)
    mem_wit = acc1.get_membership_witness(domain[0], sk, ms)
    nm_wit = acc1.get_non_membership_witness(domain[1], sk, ns)
    assert acc1.verify_membership(domain[0], mem_wit, kp.public_key, params)
    assert acc1.verify_non_membership(domain[1], nm_wit, kp.public_key, params)

    # add domain[2]: update both witnesses without the key
    old_mem = acc1.mem_value()
    acc2 = acc1.add(domain[2], sk, ms, ns)
    mem_wit2 = kbw.update_mem_wit_on_addition(mem_wit, domain[0], domain[2],
                                              old_mem)
    nm_wit2 = kbw.update_non_mem_wit_on_addition(nm_wit, domain[1], domain[2],
                                                 acc2.non_mem_value())
    assert acc2.verify_membership(domain[0], mem_wit2, kp.public_key, params)
    assert acc2.verify_non_membership(domain[1], nm_wit2, kp.public_key, params)

    # remove domain[2]
    old_nm2 = acc2.non_mem_value()
    acc3 = acc2.remove(domain[2], sk, ms, ns)
    mem_wit3 = kbw.update_mem_wit_on_removal(mem_wit2, domain[0], domain[2],
                                             acc3.mem_value())
    nm_wit3 = kbw.update_non_mem_wit_on_removal(nm_wit2, domain[1], domain[2],
                                                old_nm2)
    assert acc3.verify_membership(domain[0], mem_wit3, kp.public_key, params)
    assert acc3.verify_non_membership(domain[1], nm_wit3, kp.public_key, params)

    # extend domain
    new_elem = F.rand(RNG)
    old_nm3 = acc3.non_mem_value()
    acc4 = acc3.extend_domain([new_elem], sk, ns)
    nm_wit4 = kbw.update_non_mem_wit_on_domain_extension(
        nm_wit3, domain[1], new_elem, old_nm3)
    assert acc4.verify_non_membership(domain[1], nm_wit4, kp.public_key, params)


def test_batch_updates_with_sk_and_public_info():
    params, kp, domain, ms, ns, acc = setup(16)
    sk = kp.secret_key
    acc1 = acc.add_batch(domain[:4], sk, ms, ns)
    members = domain[:2]
    non_members = domain[8:10]
    mem_wits = acc1.get_membership_witnesses_for_batch(members, sk, ms)
    nm_wits = acc1.get_non_membership_witnesses_for_batch(non_members, sk, ns)

    additions = domain[4:6]
    removals = [domain[2]]
    old_mem = acc1.mem_value()
    old_nm = acc1.non_mem_value()
    omega = kbw.KBUniversalOmega.new(additions, removals, old_mem, old_nm, sk)
    acc2 = acc1.batch_updates(additions, removals, sk, ms, ns)

    # manager-side batch update with sk
    new_mem_wits = kbw.update_mem_wits_on_batch_updates(
        additions, removals, members, mem_wits, old_mem, sk)
    new_nm_wits = kbw.update_non_mem_wits_on_batch_updates(
        additions, removals, non_members, nm_wits, old_nm, sk)
    for m, w in zip(members, new_mem_wits):
        assert acc2.verify_membership(m, w, kp.public_key, params)
    for m, w in zip(non_members, new_nm_wits):
        assert acc2.verify_non_membership(m, w, kp.public_key, params)

    # holder-side with public Omega only
    pub_mem_wits = [kbw.update_mem_wit_using_public_info(
        w, m, additions, removals, omega.mem)
        for m, w in zip(members, mem_wits)]
    pub_nm_wits = [kbw.update_non_mem_wit_using_public_info(
        w, m, additions, removals, omega.non_mem)
        for m, w in zip(non_members, nm_wits)]
    for m, w in zip(members, pub_mem_wits):
        assert acc2.verify_membership(m, w, kp.public_key, params)
    for m, w in zip(non_members, pub_nm_wits):
        assert acc2.verify_non_membership(m, w, kp.public_key, params)

    # multiple batches in sequence
    additions2 = domain[6:8]
    old_mem2 = acc2.mem_value()
    old_nm2 = acc2.non_mem_value()
    omega2 = kbw.KBUniversalOmega.new(additions2, [], old_mem2, old_nm2, sk)
    acc3 = acc2.add_batch(additions2, sk, ms, ns)
    w = kbw.update_mem_wit_after_multiple_batches(
        mem_wits[0], members[0],
        [(additions, removals, omega.mem), (additions2, [], omega2.mem)])
    assert acc3.verify_membership(members[0], w, kp.public_key, params)
    wn = kbw.update_non_mem_wit_after_multiple_batches(
        nm_wits[0], non_members[0],
        [(additions, removals, omega.non_mem),
         (additions2, [], omega2.non_mem)])
    assert acc3.verify_non_membership(non_members[0], wn, kp.public_key, params)

    # domain extension with public info
    new_elems = [F.rand(RNG) for _ in range(2)]
    omega_ext = kbw.generate_omega_for_domain_extension(
        new_elems, acc3.non_mem_value(), sk)
    acc4 = acc3.extend_domain(new_elems, sk, ns)
    wext = kbw.update_non_mem_wit_on_domain_extension_public(
        wn, non_members[0], new_elems, omega_ext)
    assert acc4.verify_non_membership(non_members[0], wext, kp.public_key,
                                      params)
